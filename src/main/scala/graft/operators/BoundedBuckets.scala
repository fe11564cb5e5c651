package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-bucket cardinality cap for LSH-style banded self-joins.
  *
  * Every near-dup candidate generator in this engine (MinHash bands,
  * SimHash signature buckets, edit-distance chunk bands, perceptual-
  * hash bands) bounds its pair fan-out by joining only within a
  * bucket. That bound is real only while buckets stay small: on a
  * web-scale corpus one viral boilerplate page with 10M near-copies
  * puts 10M rows into a single band key, and the self-join on that one
  * key alone emits ~5·10¹³ candidate pairs — the classic LSH-dedup
  * production failure. The reference applies the same discipline to
  * its decompression path (a hard 10 MiB inflate cap,
  * `payloads_decoder.ex:22`): refuse pathological inputs explicitly
  * instead of letting them take the job down.
  *
  * `cap` counts rows per bucket key, drops every bucket whose
  * cardinality exceeds the cap, and logs the drop (no silent caps —
  * a capped run must say so). Members of a dropped bucket can still
  * pair through their OTHER bands (MinHash emits ≥2 bands per doc),
  * and a bucket that hot is overwhelmingly exact/near-exact dupes of
  * one document — the exact-hash dedup path already collapses those.
  *
  * Shape at scale: the hot-key set is tiny by construction (≤ total
  * rows / cap keys, and real corpora are heavy-tailed — a handful),
  * so it broadcasts and the drop is a map-side broadcast anti-join;
  * no extra shuffle on the big side. When no bucket exceeds the cap
  * (every test-scale dataset here) the input plan is returned
  * untouched, so the capped and uncapped plans are byte-identical on
  * healthy data and every PlanSpec pin still holds.
  *
  * The one eager pass (`hot.count()`) is the price of the guarantee —
  * a single partial-agg scan over the (cached at every call site)
  * band table, paid once at query build.
  */
object BoundedBuckets {

  /** Default per-bucket row cap for banded self-joins. Overridable
    * via `-Dgraft.lsh.bucketCap=` for soak runs that measure the
    * uncapped "before" behavior (DedupScaleCheck); production callers
    * use the default.
    */
  def DefaultCap: Int =
    sys.props.get("graft.lsh.bucketCap").map(_.toInt).getOrElse(1000)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Test hook: hot-bucket counts observed by the last `cap` call per
    * tag, so specs can assert the cap actually bound (or didn't).
    * Updated under a lock — queries can be built concurrently, and a
    * read-modify-write on a plain var would drop entries.
    */
  private val dropped = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private[graft] def lastDropped: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    dropped.asScala.toMap
  }

  /** Drop rows belonging to bucket keys with more than `cap` rows,
    * logging when the cap binds. Returns the input unchanged (same
    * plan object) when no bucket exceeds the cap.
    */
  def cap(df: DataFrame, keys: Seq[String], cap: Int = DefaultCap,
          tag: String = "buckets"): DataFrame =
    capWithRows(df, keys, cap, tag)._1

  /** Driver-side twin of [[cap]] for a band table ALREADY COLLECTED
    * (an increment small enough to broadcast anyway): identical
    * semantics — count per key, drop every bucket over the cap, log
    * and record the drop — with zero Spark jobs. Callers that serve
    * the capped rows as a local relation fold the census, the
    * broadcast build, and the checkpoint into the one collect that
    * fetched the rows. */
  def capRowsLocal(rows: Seq[org.apache.spark.sql.Row],
      keys: Seq[String], cap: Int = DefaultCap,
      tag: String = "buckets"): Seq[org.apache.spark.sql.Row] = {
    def keyOf(r: org.apache.spark.sql.Row) = keys.map(k => r.getAs[Any](k))
    val hot = rows.groupBy(keyOf).collect {
      case (k, g) if g.size > cap => k
    }.toSet
    dropped.put(tag, hot.size.toLong)
    if (hot.isEmpty) rows
    else {
      log.warn(s"$tag: dropping ${hot.size} bucket(s) over cap=$cap rows " +
        "before the banded self-join (bounded candidate generation)")
      rows.filterNot(r => hot(keyOf(r)))
    }
  }

  /** [[cap]] plus the input's TOTAL row count, read from the same
    * per-bucket aggregation — callers that also need the cardinality
    * (e.g. to decide a broadcast) get it without a second pass over
    * the frame. The common no-hot-bucket path costs exactly one job
    * either way. */
  def capWithRows(df: DataFrame, keys: Seq[String], cap: Int = DefaultCap,
          tag: String = "buckets"): (DataFrame, Long) = {
    val kc = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
    val t = kc.agg(
        coalesce(sum(col("__bucket_n")), lit(0L)),
        coalesce(sum(when(col("__bucket_n") > cap, 1L)), lit(0L)))
      .head()
    val (total, nHot) = (t.getLong(0), t.getLong(1))
    dropped.put(tag, nHot)
    if (nHot == 0) (df, total)
    else {
      log.warn(s"$tag: dropping $nHot bucket(s) over cap=$cap rows " +
        "before the banded self-join (bounded candidate generation)")
      val hot = kc.filter(col("__bucket_n") > cap)
        .select(keys.map(col): _*)
      (df.join(broadcast(hot), keys, "left_anti"), total)
    }
  }
}
