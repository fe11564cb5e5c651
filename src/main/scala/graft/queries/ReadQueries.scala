package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's point-read surface (SURVEY §2.6 R1–R8) and the
  * IVF-style ANN search path, over the testdata tables.
  */
object ReadQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1: triggers by (object_id, object_type) — point read on the
    // trigger table.
    "r1_triggers_by_object" -> ((s, d) => {
      import s.implicits._
      val triggers = Seq(
        ("t1", "purchase", "iface", "GREATER_THAN", "amqp://high-purchase"),
        ("t2", "error", "iface", "ANY", "amqp://errors"),
        ("t3", "purchase", "device", "ANY", "amqp://dev"),
        ("t4", "signup", "iface", "CONTAINS", "amqp://signup"))
        .toDF("trigger_id", "object_id", "object_type", "op", "target")
      triggers.filter(col("object_id") === "purchase" && col("object_type") === "iface")
        .select(col("trigger_id"), col("op"), col("target"))
    }),

    // R2: all paths under a PK prefix (device, interface) — the
    // prune-read; here: all paths a user has touched for one type.
    "r2_paths_for_endpoint" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          concat(lit("/purchase/"), pmod(col("event_id"), lit(50))).as("path"))
        .distinct()
    }),

    // R3: device stats + introspection point row.
    "r3_device_stats" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("user_id") === 7)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("total_received_msgs"),
          sum(length(col("props"))).as("total_received_bytes"),
          countDistinct(col("event_type")).as("n_interfaces"))
    }),

    // R4: introspection minors map for one device.
    "r4_introspection_minors" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("user_id") === 7)
        .groupBy(col("event_type"))
        .agg(max(col("event_id")).as("minor"))
        .select(col("event_type"), col("minor"))
    }),

    // R5: typed-column projection of current values (registry chooses
    // the column by value type; here the double column).
    "r5_typed_projection" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), round(col("value"), 4).as("double_value"))
    }),

    // R8: endpoint attribute via LIMIT-1-per-group (the reference
    // reads explicit_timestamp from any one endpoint row).
    "r8_first_per_endpoint" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
          min(expr("ts div 1000")).as("first_ts_us"))
    }),

    // IVF-style ANN: centroids = per-label mean vectors (the "train"
    // step), probe = top-2 centroids per query, exact search only
    // inside probed partitions. At 100 TB this is the layout: cluster
    // once, route queries to nprobe partitions, never scan the rest.
    "sim_ivf" -> ((s, d) => {
      // quantized centroids ("train") + exact-integer probe/search —
      // shared lineage with sim_centroid_outlier/dd_semantic_dedup
      // (AnalyticsQueries.quantEmb/labelCentroids), so the whole ANN
      // family scores with the same deterministic arithmetic
      val cent = AnalyticsQueries.labelCentroids(s, d)
        .withColumnRenamed("clabel", "label")
      val e = AnalyticsQueries.quantEmb(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qe"),
          col("qnorm"))
      // probe: rank centroids per query
      val probe = q.crossJoin(broadcast(cent))
        .withColumn("pcos",
          round(expr("vector_dot_long(qe, carr)").cast("double") /
            (col("qnorm") * col("cnorm")), 4))
      val wp = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("label").asc)
      val probed = probe.withColumn("prank", row_number().over(wp))
        .filter(col("prank") <= 2)
        .select(col("qid"), col("qe"), col("qnorm"), col("label"))
      // exact search within probed labels only
      val n = e.select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("q").as("ne"), col("qnorm").as("nnorm"))
      val scored = probed.join(n, col("label") === col("nlabel"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("cosine",
          round(expr("vector_dot_long(qe, ne)").cast("double") /
            (col("qnorm") * col("nnorm")), 4))
      val ws = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
      scored.withColumn("rank", row_number().over(ws))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("nid"), col("cosine"), col("rank"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "r1_triggers_by_object" ->
      """WITH triggers(trigger_id, object_id, object_type, op, target) AS (VALUES
        |  ('t1','purchase','iface','GREATER_THAN','amqp://high-purchase'),
        |  ('t2','error','iface','ANY','amqp://errors'),
        |  ('t3','purchase','device','ANY','amqp://dev'),
        |  ('t4','signup','iface','CONTAINS','amqp://signup'))
        |SELECT trigger_id, op, target FROM triggers
        |WHERE object_id = 'purchase' AND object_type = 'iface'""".stripMargin,
    "r2_paths_for_endpoint" ->
      """SELECT DISTINCT user_id,
        |  '/purchase/' || (event_id % 50) AS path
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "r3_device_stats" ->
      """SELECT user_id, count(*) AS total_received_msgs,
        |  sum(length(props))::BIGINT AS total_received_bytes,
        |  count(DISTINCT event_type) AS n_interfaces
        |FROM events WHERE user_id = 7 GROUP BY user_id""".stripMargin,
    "r4_introspection_minors" ->
      """SELECT event_type, max(event_id) AS minor
        |FROM events WHERE user_id = 7 GROUP BY event_type""".stripMargin,
    "r5_typed_projection" ->
      """SELECT user_id, round(value, 4) AS double_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE event_type = 'purchase')
        |WHERE rn = 1""".stripMargin,
    "r8_first_per_endpoint" ->
      """SELECT event_type, event_id AS first_event_id, first_ts_us FROM (
        |  SELECT event_type, event_id,
        |    min(epoch_us(ts)) OVER (PARTITION BY event_type) AS first_ts_us,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "sim_ivf" ->
      """WITH f AS (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, idx, sum(qv) AS sq, count(*) AS nq
        |  FROM f GROUP BY 1, 2),
        |centq AS (
        |  SELECT label, idx, (sq - sq % nq) // nq AS cq FROM cent),
        |cnorms AS (
        |  SELECT label, sqrt(sum(cq*cq)::DOUBLE) AS cnorm
        |  FROM centq GROUP BY 1),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv*qv)::DOUBLE) AS norm FROM f GROUP BY 1),
        |probe AS (
        |  SELECT q.vec_id AS qid, c.label,
        |    round(sum(q.qv * c.cq)::DOUBLE / (n.norm * cn.cnorm), 4) AS pcos
        |  FROM f q JOIN centq c ON q.idx = c.idx
        |  JOIN norms n ON n.vec_id = q.vec_id
        |  JOIN cnorms cn ON cn.label = c.label
        |  WHERE q.vec_id < 10
        |  GROUP BY q.vec_id, c.label, n.norm, cn.cnorm),
        |probed AS (
        |  SELECT qid, label FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY qid ORDER BY pcos DESC, label ASC) AS prank
        |    FROM probe) WHERE prank <= 2),
        |dots AS (
        |  SELECT p.qid, n.vec_id AS nid, sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM probed p
        |  JOIN f n ON n.label = p.label
        |  JOIN f q ON q.vec_id = p.qid AND q.idx = n.idx
        |  WHERE n.vec_id <> p.qid
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, nid,
        |    round(dot / (nq.norm * nn.norm), 4) AS cosine
        |  FROM dots JOIN norms nq ON nq.vec_id = qid
        |  JOIN norms nn ON nn.vec_id = nid)
        |SELECT qid, nid, cosine, rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin
  )
}
