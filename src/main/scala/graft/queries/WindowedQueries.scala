package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    }),

    // Session windows: per-user activity bursts separated by > 6h of
    // silence (session_window merges events whose gap windows overlap
    // OR touch — two events exactly 6h apart share one session;
    // end = last event + gap). The value sum uses the exact-cents
    // trick — event values carry 2 decimals, and a summed double would
    // land on rounding boundaries where the engines disagree.
    // Weekly cohort retention: users bucketed by their first active
    // week; for each (cohort, week offset), how many came back. Two
    // keyed aggregations ((user, week) distinct, then per-user min)
    // and one broadcast-size join back — the user dimension after
    // distinct is tiny relative to events. All-week arithmetic is
    // integer (epoch-ms div week), truncation identical on both
    // engines for the positive timestamps parquet can hold here.
    "w_retention" -> ((s, d) => {
      val weekMs = 604800000L
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          expr(s"ts div 1000000 div $weekMs").as("wk"))
        .distinct()
      val cohort = wk.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_week"))
      wk.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("wk") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Cohort lifetime-value curve — w_retention's revenue twin: per
    // signup cohort (a user's first-activity week), the purchase
    // revenue its users generate at each week offset AND the running
    // cumulative ("how much has the March cohort earned by week k") —
    // the curve LTV projections read off. Two keyed partial-agg
    // shuffles + one window cumsum partitioned BY COHORT (parallelism
    // = number of cohorts, each partition a handful of offset rows —
    // never a data-sized window). Exact integer cents.
    "w_cohort_ltv" -> ((s, d) => {
      val weekMs = 604800000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr(s"ts div 1000000 div $weekMs").as("wk"),
          round(col("value") * 100).cast("long").as("cents"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_week"))
      val perOffset = ev.filter(col("event_type") === "purchase")
        .join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("wk") - col("cohort_week")).as("week_offset"))
        .agg(sum(col("cents")).as("revenue_cents"),
          countDistinct(col("user_id")).as("n_buyers"))
      val run = Window.partitionBy(col("cohort_week"))
        .orderBy(col("week_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perOffset.withColumn("cum_revenue_cents",
        sum(col("revenue_cents")).over(run))
    }),

    // Calendar gap-fill / resample with LOCF — the operator
    // time-series stores call time_bucket_gapfill: a sparse daily
    // series (deliberately sparsified to ~1% so gaps exist at every
    // SF) is resampled onto the full shared day grid; missing days
    // are marked and carry the last observation forward. Scale
    // shape: the only data-sized work is the first aggregate (one
    // partial-agg shuffle); the grid is CALENDAR-sized (types × days,
    // from a broadcast 1-row bounds frame), and the LOCF window
    // partitions by type over ≤ days rows — bounded by the time
    // range, never by the data.
    "w_gapfill" -> ((s, d) => {
      val src = Tables.events(s, d)
        .filter(col("event_id") % 97 === 0)
        .select(col("event_type"),
          expr("ts div 1000000 div 86400000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("cents"))
      val bounds = src.agg(min(col("day")).as("dmin"),
        max(col("day")).as("dmax"))
      val grid = src.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("dmin"), col("dmax"))).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(src, Seq("event_type", "day"), "left")
        .withColumn("filled", when(col("cents").isNull, 1).otherwise(0))
        .withColumn("cents_locf",
          last(col("cents"), ignoreNulls = true).over(w))
        .select(col("event_type"), col("day"), col("filled"),
          col("cents_locf"))
    }),

    "w_session" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"), session_window(col("tstamp"), "6 hours"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100)).cast("long").as("sum_cents"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          unix_millis(col("session_window.end")).as("session_end_ms"),
          col("n"), col("sum_cents"))
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
        |FROM hops GROUP BY 1""".stripMargin,
    "w_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_ms(ts) // 604800000 AS wk,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1),
        |per_offset AS (
        |  SELECT cohort_week, wk - cohort_week AS week_offset,
        |    sum(cents)::BIGINT AS revenue_cents,
        |    count(DISTINCT e.user_id) AS n_buyers
        |  FROM ev e JOIN cohort USING (user_id)
        |  WHERE event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, revenue_cents, n_buyers,
        |  sum(revenue_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS cum_revenue_cents
        |FROM per_offset""".stripMargin,
    "w_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 604800000 AS wk
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY 1)
        |SELECT cohort_week, wk - cohort_week AS week_offset,
        |  count(*) AS n_users
        |FROM wk JOIN cohort USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "w_gapfill" ->
      """WITH src AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
        |bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM src),
        |grid AS (
        |  SELECT t.event_type, unnest(generate_series(dmin, dmax)) AS day
        |  FROM (SELECT DISTINCT event_type FROM src) t CROSS JOIN bounds),
        |j AS (
        |  SELECT g.event_type, g.day, s.cents,
        |    CASE WHEN s.cents IS NULL THEN 1 ELSE 0 END AS filled
        |  FROM grid g LEFT JOIN src s
        |    ON s.event_type = g.event_type AND s.day = g.day)
        |SELECT event_type, day, filled,
        |  last_value(cents IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS cents_locf
        |FROM j""".stripMargin,
    // gaps-and-islands replica of session_window: a NEW session starts
    // only when the gap since the previous event EXCEEDS the 6h window
    // (Spark merges touching gap windows, so an exactly-6h gap still
    // merges — verified on 4.1.2); session end = last event + 6h
    "w_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev_ts IS NULL
        |              OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM b)
        |SELECT user_id,
        |  epoch_ms(min(ts)) AS session_start_ms,
        |  epoch_ms(max(ts)) + 21600000 AS session_end_ms,
        |  count(*) AS n,
        |  sum(round(value * 100))::BIGINT AS sum_cents
        |FROM sess GROUP BY user_id, sid""".stripMargin
  )
}
