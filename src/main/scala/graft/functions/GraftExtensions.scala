package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Official extension wiring: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`)
  * registers the engine's native expressions in every session built
  * from that config — no per-session register() call needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_dot"),
      GraftFunctions.vectorDotBuilder))
    ext.injectFunction((
      FunctionIdentifier("vector_dot_long"),
      new ExpressionInfo(classOf[VectorDotLong].getName, "vector_dot_long"),
      GraftFunctions.vectorDotLongBuilder))
    ext.injectFunction((
      FunctionIdentifier("hll_registers"),
      new ExpressionInfo(classOf[HllRegistersAgg].getName, "hll_registers"),
      GraftFunctions.hllRegistersBuilder))
    ext.injectFunction((
      FunctionIdentifier("cms_counters"),
      new ExpressionInfo(classOf[CmsCountersAgg].getName, "cms_counters"),
      GraftFunctions.cmsCountersBuilder))
    ext.injectFunction((
      FunctionIdentifier("kmv_bottomk"),
      new ExpressionInfo(classOf[KmvBottomKAgg].getName, "kmv_bottomk"),
      GraftFunctions.kmvBottomKBuilder))
    ext.injectFunction((
      FunctionIdentifier("mg_summary"),
      new ExpressionInfo(classOf[MgSummaryAgg].getName, "mg_summary"),
      GraftFunctions.mgSummaryBuilder))
    ext.injectFunction((
      FunctionIdentifier("es_topk"),
      new ExpressionInfo(classOf[EsTopKAgg].getName, "es_topk"),
      GraftFunctions.esTopKBuilder))
    ext.injectFunction((
      FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
      GraftFunctions.hilbertKeyBuilder))
  }
}
