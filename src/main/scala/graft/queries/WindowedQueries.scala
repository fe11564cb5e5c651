package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the extension surface the
  * reference lacks (SURVEY §2.8 note: no windows on the ingest path;
  * they belong to the analytics layer). Batch forms here; the same
  * `window()` expressions run under `readStream` + watermark for the
  * streaming case (see StreamingStateSpec for the stateful path).
  */
object WindowedQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-day windows per event type. ts arrives as epoch-ns
    // long; window() gets a real timestamp (µs precision, matching
    // the oracle's date_trunc).
    "w_tumbling_daily" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tstamp"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(
          unix_millis(col("window.start")).as("day_start_ms"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // Hopping 6h-every-3h windows: each event lands in 2 windows —
    // the overlap accounting a naive date_trunc can't express.
    "w_hopping_6h" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tstamp"), "6 hours", "3 hours"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")).as("win_start_ms"), col("n"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "w_tumbling_daily" ->
      """SELECT epoch_ms(date_trunc('day', ts)) AS day_start_ms,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // each event contributes to the two hops covering it:
    // hop k has start floor((t - k*3h)/6h)*6h + k*3h for k in 0,1
    "w_hopping_6h" ->
      """WITH hops AS (
        |  SELECT epoch_ms(ts) AS ems, unnest([0, 1]) AS k
        |  FROM events)
        |SELECT ((ems - k * 10800000) // 21600000) * 21600000
        |         + k * 10800000 AS win_start_ms,
        |  count(*) AS n
        |FROM hops GROUP BY 1""".stripMargin
  )
}
