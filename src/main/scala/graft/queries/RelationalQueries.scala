package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational surface: scan → filter → project → join → agg →
  * sort/limit, the substrate every reference operator rides on
  * (SURVEY.md §2.2–§2.6, §2.9).
  *
  * Scale notes (100 TB): every query here keeps filters/projections
  * at the parquet scan (pushdown), broadcasts only dimension tables
  * (region/nation/customer/part are small relative to the fact
  * tables), and aggregates with map-side partial aggregation. No
  * driver-side collects.
  */
object RelationalQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2-style running totals: the reference's device/interface
    // counters (impl.ex:623-674) generalize to hash aggregation with
    // partial (map-side) combine — TPC-H Q1 shape.
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Sort + limit surface (SURVEY §2.9): top-k with deterministic
    // tie-break; revenue join customer⨝orders⨝lineitem (Q3 shape).
    "q3_topk" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Multi-way join with small-dim broadcast (J1 generalized):
    // local-supplier revenue per nation (Q5 shape). customer/supplier
    // join on nationkey enforces locality; region/nation broadcast.
    "q5_join5" -> ((s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
                 sup("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
    }),

    // Runtime bloom-filtered join (sideways information passing): a
    // selective predicate survives ~7% of orders, so the fact side is
    // pre-filtered through a bloom of the surviving keys BEFORE its
    // shuffle — at 100 TB the ~93% never-matching lineitem rows die
    // in the scan's codegen pipeline instead of crossing the wire.
    // The exact join still runs, so the result (and the oracle hash)
    // is identical with or without the filter; false positives cost
    // bytes, never rows. BloomJoinFilterSpec pins no-false-negatives,
    // the FP envelope, and the filter-below-join plan shape.
    "q_bloom_join" -> ((s, d) => {
      val sel = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val bits = graft.operators.BloomJoinFilter.build(
        sel, col("o_orderkey"), m = 65536, hashes = 2)
      Tables.lineitem(s, d)
        .filter(graft.operators.BloomJoinFilter.mightContain(
          "l_orderkey", bits, 65536, 2))
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
    }),

    // Pure scan+filter+scalar-agg (Q6 shape): the fully-pushed-down
    // path — predicate reaches the parquet reader, no shuffle at all
    // beyond the final single-partition reduce.
    "q6_filter_sum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.02, 0.04) &&
                col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"))
    }),

    // J5 property prune = anti-join (impl.ex:1334-1411): stored rows
    // not present in the announced set are deleted. Here: customers
    // with no orders. left_anti avoids materializing the non-matching
    // side; at scale Spark picks broadcast/SMJ by stats.
    "j5_prune_antijoin" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Grouping sets beyond the reference's surface (SURVEY §2.4 notes
    // it has none): rollup over (status, priority) with the grand
    // total — one pass, Expand handles the grouping-set fan-out.
    "q_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
    }),

    // Set operations: buyers who also clicked, minus heavy-error
    // users (>14 errors) — INTERSECT/EXCEPT shapes.
    "q_setops" -> ((s, d) => {
      val e = Tables.events(s, d)
      def users(t: String) =
        e.filter(col("event_type") === t).select(col("user_id")).distinct()
      val heavyError = e.filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 14).select(col("user_id"))
      users("purchase").intersect(users("click")).except(heavyError)
    }),

    // Skew profile: per-key row share and heaviest sub-key — the
    // diagnostic run BEFORE picking salt factors / AQE skew
    // thresholds on a new corpus (is one event_type dominant? does
    // one user own a partition?). All-integer basis points, two
    // map-side-combined aggs + a rank window; output bounded by key
    // cardinality, never row count.
    "q_skew_profile" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_user"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n_user").desc, col("user_id").asc)
      val wAll = Window.partitionBy()
      perUser
        .withColumn("rn", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(sum(col("n_user")).as("n_rows"),
          max(when(col("rn") === 1, col("user_id"))).as("top_user"),
          max(when(col("rn") === 1, col("n_user"))).as("top_user_rows"))
        .withColumn("total", sum(col("n_rows")).over(wAll))
        .select(col("event_type"), col("n_rows"),
          expr("n_rows * 10000 div total").as("share_bp"),
          col("top_user"),
          expr("top_user_rows * 10000 div n_rows").as("top_user_bp"))
    }),

    // Pivot: per-user event-type counts as columns (conditional
    // aggregation — the portable pivot form).
    "q_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"))
    }),

    // Exact nearest-rank percentiles per event type (p50/p90/p99 of
    // the value distribution in cents). Nearest-rank — index
    // ceil(p*n) of the sorted multiset — instead of interpolation:
    // the picked value is an exact integer regardless of how either
    // engine associates the interpolation arithmetic, and the value
    // at a sorted rank is tie-order-independent. One shuffle (sort
    // within event_type); at 100 TB the same shape runs per-partition
    // or swaps in a sketch when approximation is acceptable.
    // Rolling 24h aggregate per event type: a RANGE-frame window (time
    // units, not row counts) — value sums in exact integer cents.
    // Time-CHUNKED two-stage evaluation, not one partition per type:
    // each row is routed to its own 24h chunk (as an emitting row) AND
    // to the next chunk (as a frame contributor only), the window
    // partitions on (type, chunk), and a row's [-24h, 0] frame is then
    // fully contained in its partition — own-chunk rows cover [chunk
    // start, t], the previous chunk's contributor copies cover [t-24h,
    // chunk start). Exactly-once by construction: contributor copies
    // sit strictly before the chunk boundary, own rows at-or-after it.
    // Cost: 2× shuffle volume, but parallelism = types × chunks
    // instead of being capped by type cardinality — a single dominant
    // type no longer serializes the whole pass on one task (the skew
    // shape a per-type window cannot escape at 100 TB).
    "q_rolling_24h" -> ((s, d) => {
      val W = 86400000L
      val base = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ts_ms"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("chunk", expr(s"ts_ms div $W"))
      val parts = base.withColumn("own", lit(true))
        .unionByName(base
          .withColumn("chunk", col("chunk") + 1)
          .withColumn("own", lit(false)))
      val w = Window.partitionBy(col("event_type"), col("chunk"))
        .orderBy(col("ts_ms"))
        .rangeBetween(-W, 0L)
      parts
        .withColumn("n_24h", count(lit(1)).over(w))
        .withColumn("sum_cents_24h", sum(col("cents")).over(w))
        .filter(col("own"))
        .select(col("event_id"), col("event_type"),
          col("n_24h"), col("sum_cents_24h"))
    }),

    // Cumulative distinct users per (event_type, day): COUNT(DISTINCT)
    // over a running window is unsupported/expensive everywhere — the
    // scalable form marks each user's FIRST occurrence (one row_number
    // per (type, user)), daily-aggregates the first-seen rows, then a
    // running sum gives exact cumulative uniques. Two keyed shuffles,
    // no distinct-state explosion — works unchanged at any user count.
    "q_cumulative_users" -> ((s, d) => {
      val running = Window.partitionBy(col("event_type")).orderBy(col("day"))
      // first-seen pick as a plain min aggregate instead of a rank-1
      // window (r17 opt round, guide §2.3): only the first row's
      // ts_ms survives downstream, and min(ts_ms) IS that row's ts_ms
      // under the (ts_ms, event_id) order — no per-(type, user) sort,
      // map-side partials shuffle one row per key
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          expr("ts div 1000000").as("ts_ms"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts_ms")).as("fs_ms"))
        .withColumn("day", expr("fs_ms div 86400000"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(running))
    }),

    // Relational DIVISION — "users who purchased in EVERY week the
    // corpus covers" — the classic ∀-quantified join textbooks
    // express as double NOT EXISTS, which planners turn into nested
    // anti-join cascades. The scale-safe form is counting: distinct
    // (user, week) purchase pairs, one partial-agg count per user,
    // compare against the broadcast divisor cardinality. Two
    // shuffles total, no correlated subquery.
    "q_rel_division" -> ((s, d) => {
      val weekMs = 604800000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr(s"ts div 1000000 div $weekMs").as("wk"))
      val nWeeks = ev.select(col("wk")).distinct()
        .agg(count(lit(1)).as("n_weeks"))
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("wk")).distinct()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_user_weeks"))
        .crossJoin(broadcast(nWeeks))
        .filter(col("n_user_weeks") === col("n_weeks"))
        .select(col("user_id"), col("n_user_weeks"))
    }),

    // Robust outlier detection: median absolute deviation per event
    // type — the robust alternative to z-scores (a handful of extreme
    // values cannot drag the threshold the way they drag a mean/σ).
    // Both medians are nearest-rank picks over exact integer cents
    // (same determinism contract as q_percentiles), the outlier test
    // |x − med| > 3·MAD is an exact integer compare, and the output is
    // bounded by event-type cardinality. Two ranked window passes +
    // one broadcast-back join.
    "q_mad_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      def medianOf(df: org.apache.spark.sql.DataFrame, valueCol: String) = {
        val w = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
        val wAll = Window.partitionBy(col("event_type"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wAll))
          .groupBy(col("event_type"))
          .agg(max(when(col("rn") === ceil(col("n") * 0.5), col(valueCol)))
            .as(s"med_$valueCol"))
      }
      val med = medianOf(ev, "cents")
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("cents") - col("med_cents")))
      val mad = medianOf(dev.select(col("event_type"), col("dev")), "dev")
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"), col("med_cents"))
        .agg(max(col("med_dev")).as("mad_cents"),
          count(lit(1)).as("n"),
          sum(when(col("dev") > col("med_dev") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
        .withColumn("outlier_bp", expr("n_outliers * 10000 div n"))
    }),

    "q_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      val wAll = Window.partitionBy(col("event_type"))
      Tables.events(s, d)
        // drop NULL values on BOTH sides: Spark window-sorts NULLS
        // FIRST, DuckDB NULLS LAST — one null would shift every rank
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          max(when(col("rn") === ceil(col("n") * 0.5), col("cents"))).as("p50_cents"),
          max(when(col("rn") === ceil(col("n") * 0.9), col("cents"))).as("p90_cents"),
          max(when(col("rn") === ceil(col("n") * 0.99), col("cents"))).as("p99_cents"))
    }),

    // Fixed-width value histogram per event type ($10 buckets). Pure
    // 64-bit integer arithmetic end to end: value → exact cents →
    // integer div — no float boundary can differ between engines
    // (values are non-negative, so trunc-div == floor-div). One
    // map-side bucket expr + one partial-agg groupBy; at 100 TB this
    // is a single shuffle of (type, bucket) partials.
    "q_histogram" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("bucket", expr("cents div 1000"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    }),

    // Equi-depth histogram — the optimizer-statistics structure
    // (q_histogram's fixed-width twin): 8 buckets of ~equal ROW
    // count over the value distribution, each whole distinct value
    // assigned to the bucket its first rank falls in. Scale shape:
    // one data-sized partial agg to per-value counts, then every
    // window runs over the DISTINCT-VALUE table (bounded by the value
    // domain, ≤ ~9.1k cents here — never by row count), and the row
    // total broadcasts from a one-row frame.
    "q_histogram_eqdepth" -> ((s, d) => {
      val perValue = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("cents")).agg(count(lit(1)).as("nv"))
      val cum = perValue
        .withColumn("cum", sum(col("nv")).over(
          Window.orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val total = perValue.agg(sum(col("nv")).as("n_total"))
      cum.crossJoin(broadcast(total))
        .withColumn("bucket", expr("(cum - nv) * 8 div n_total"))
        .groupBy(col("bucket"))
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
          sum(col("nv")).as("n_rows"), count(lit(1)).as("n_values"))
    }),

    // Revenue concentration: exact-integer Gini coefficient and
    // top-decile share over per-user purchase revenue — the
    // whale-dependency read behind every monetization review. Ranks
    // run over the USER dimension but NEVER as one global window
    // partition (billions of users is still a single-task sort):
    // BucketedRank range-buckets by cents and decomposes the exact
    // rank into per-bucket local ranks + a tiny offset table — the
    // rank-sum Σ rank·x decomposes exactly over buckets, so the
    // answer is unchanged. The Gini identity
    // G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) runs in decimal(38,0)
    // (Σ rank·x ≈ n·Σx overflows a signed long well before 100 TB;
    // DuckDB's HUGEINT is the same 128-bit semantics), with only the
    // ≤10000 quotients cast back to BIGINT.
    "q_revenue_gini" -> ((s, d) => {
      val rev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val totals = rev.agg(count(lit(1)).as("n_users"),
        sum(col("cents")).as("total_cents"))
      graft.operators.BucketedRank
        .byRange(rev, col("cents"), Seq(col("user_id")), "rnk")
        .crossJoin(broadcast(totals))
        .agg(max(col("n_users")).as("n_users"),
          max(col("total_cents")).as("total_cents"),
          sum(col("rnk").cast("decimal(38,0)") * col("cents")).as("rc"),
          sum(when(col("rnk") > col("n_users") -
            expr("n_users div 10"), col("cents"))).as("top_cents"))
        .select(col("n_users"), col("total_cents"),
          expr("cast((2 * rc - (cast(n_users as decimal(38,0)) + 1)" +
            " * total_cents) * 10000" +
            " div (cast(n_users as decimal(38,0)) * total_cents)" +
            " as bigint)").as("gini_bp"),
          expr("top_cents * 10000 div total_cents").as("top10_share_bp"))
    }),

    // Week-over-week growth per event type: the reporting delta every
    // dashboard ships. Ratios are cents·10000 div prev (non-negative
    // operands — integer division on a NEGATIVE delta truncates
    // differently across engines, so the signed column is the plain
    // difference); windows run over calendar-weeks rows per type.
    "q_wow_growth" -> ((s, d) => {
      val weekly = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 1000000 div 604800000").as("wk"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
      weekly
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .select(col("event_type"), col("wk"), col("n"), col("cents"),
          (col("cents") - col("prev_cents")).as("delta_cents"),
          expr("cents * 10000 div prev_cents").as("ratio_bp"))
    }),

    // Growth accounting (the MAU/WAU decomposition every product
    // analytics stack ships): per week, how many active users are
    // NEW (first ever week), RETAINED (also active the week before),
    // RESURRECTED (returning after a gap), and CHURNED-FROM (active
    // the prior week, absent this one). One (user, week) distinct,
    // then windows over each user's ≤ calendar-weeks rows — never
    // data-sized — and churn rows synthesize from lead() capped at
    // the corpus's last week (broadcast one-row max). Activity is
    // deliberately sparsified (~4% of events) so every status —
    // including resurrected and churned — is live at every SF; the
    // dense corpus would make everyone retained.
    "q_growth_accounting" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .filter(col("event_id") % 23 === 0)
        .select(col("user_id"),
          expr("ts div 1000000 div 604800000").as("wk"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val lagged = wk
        .withColumn("prev", lag(col("wk"), 1).over(w))
        .withColumn("nxt", lead(col("wk"), 1).over(w))
      val active = lagged.select(col("wk"),
        when(col("prev").isNull, lit("new"))
          .when(col("prev") === col("wk") - 1, lit("retained"))
          .otherwise(lit("resurrected")).as("status"))
      val maxWk = wk.agg(max(col("wk")).as("max_wk"))
      val churned = lagged.crossJoin(broadcast(maxWk))
        .filter(col("wk") < col("max_wk") &&
          (col("nxt").isNull || col("nxt") > col("wk") + 1))
        .select((col("wk") + 1).as("wk"), lit("churned_from").as("status"))
      active.unionByName(churned)
        .groupBy(col("wk"), col("status"))
        .agg(count(lit(1)).as("n"))
    }),

    // First-occurrence funnel signup → click → purchase: users whose
    // first click follows their first signup, and first purchase
    // follows that click. One groupBy(user) with conditional mins,
    // one global fold — two partial-agg shuffles, no join, no window.
    // Timestamps compare at µs resolution on BOTH engines (Spark sees
    // the parquet ns; DuckDB only µs — a sub-µs gap would otherwise
    // order differently).
    "q_funnel" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type").isin("signup", "click", "purchase"))
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("tus"))).as("t_s"),
          min(when(col("event_type") === "click", col("tus"))).as("t_c"),
          min(when(col("event_type") === "purchase", col("tus"))).as("t_p"))
        .agg(
          count(when(col("t_s").isNotNull, 1)).as("n_signup"),
          count(when(col("t_s") < col("t_c"), 1)).as("n_signup_click"),
          count(when(col("t_s") < col("t_c") && col("t_c") < col("t_p"), 1))
            .as("n_full_funnel"))
    }),

    // Data-quality constraint report (the Deequ/dbt-test audit every
    // pipeline runs before training): six declarative checks —
    // referential integrity (orphan lineitems, LEFT ANTI join), key
    // uniqueness, null rate, accepted-values domain, value range, and
    // a cross-table ordering invariant — each one aggregate row of
    // (check, n_violations, n_checked). Every check is a scan +
    // partial agg (the anti join broadcasts the key-pruned orders
    // side is NOT small — it shuffles on the join key, which is the
    // right shape); zero rows never "pass silently" because the
    // report always emits all six rows with their checked counts.
    "q_dq_report" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val lineitem = Tables.lineitem(s, d)
      val events = Tables.events(s, d)
      def row(name: String, violations: org.apache.spark.sql.Column,
          checked: org.apache.spark.sql.Column, df: DataFrame) =
        df.agg(violations.cast("long").as("n_violations"),
          checked.cast("long").as("n_checked"))
          .select(lit(name).as("check_name"), col("n_violations"),
            col("n_checked"))
      val orphans = row("lineitem_orphan_orderkey",
        count(lit(1)), count(lit(1)),
        lineitem.select(col("l_orderkey"))
          .join(orders.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti"))
      val dupKeys = row("orders_dup_orderkey",
        count(lit(1)) - countDistinct(col("o_orderkey")), count(lit(1)),
        orders)
      val nullValue = row("events_null_value",
        count(when(col("value").isNull, 1)), count(lit(1)), events)
      val domain = row("events_type_domain",
        count(when(!col("event_type").isin(
          "signup", "click", "view", "purchase", "error"), 1)),
        count(lit(1)), events)
      val range = row("orders_nonpositive_total",
        count(when(col("o_totalprice") <= 0, 1)), count(lit(1)), orders)
      val ordering = row("lineitem_ship_before_order",
        count(when(col("l_shipdate") < col("o_orderdate"), 1)),
        count(lit(1)),
        lineitem.select(col("l_orderkey"), col("l_shipdate"))
          .join(orders.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey")))
      orphans.unionByName(dupKeys).unionByName(nullValue)
        .unionByName(domain).unionByName(range).unionByName(ordering)
    }),

    // Multi-touch attribution: every purchase's revenue is credited
    // equally (integer basis points, remainder to the EARLIEST touch)
    // across the user's clicks in the 24h before it — the marketing
    // attribution read every event pipeline ships. The lookback join
    // uses the bucketed-range-join discipline (purchase explodes to
    // the exactly-2 daily buckets its window overlaps, clicks probe
    // equi-join on (user, bucket), exact time predicate after the
    // hash join — never a nested loop); the credit-split window
    // partitions per purchase over its ≤ lookback-rate rows. All
    // integer: bp split via div/mod, attributed cents via
    // cents·bp div 10000.
    "q_attribution" -> ((s, d) => {
      val dayUs = 86400000000L
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"),
          round(col("value") * 100).cast("long").as("cents"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          col("tus").as("t_p"), col("cents"))
        .withColumn("bucket", explode(array(
          expr(s"t_p div $dayUs - 1"), expr(s"t_p div $dayUs"))))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"),
          col("tus").as("t_c"), expr(s"tus div $dayUs").as("bucket"))
      val pairs = purchases.join(clicks, Seq("user_id", "bucket"))
        .filter(col("t_c") < col("t_p") &&
          col("t_c") >= col("t_p") - dayUs)
      val wk = Window.partitionBy(col("pid"))
      val wr = Window.partitionBy(col("pid"))
        .orderBy(col("t_c").asc, col("cid").asc)
      pairs
        .withColumn("k", count(lit(1)).over(wk))
        .withColumn("rn", row_number().over(wr))
        .withColumn("credit_bp", expr("10000 div k") +
          when(col("rn") === 1, expr("10000 % k")).otherwise(lit(0L)))
        .groupBy(expr("(t_c div 3600000000) % 24").as("click_hour"))
        .agg(count(lit(1)).as("n_credits"),
          sum(col("credit_bp")).as("credit_bp_sum"),
          sum(expr("cents * credit_bp div 10000")).as("attr_cents"))
    }),

    // Bucketed range join (the scale-safe interval join): count the
    // follow-on activity inside the 2h window after every error event.
    // A naive t BETWEEN start AND end join has no equi-key and planners
    // fall back to a nested-loop — the classic interval-join
    // scale-killer. Instead each interval explodes to the (at most 2)
    // fixed-width time buckets it overlaps, probes equi-join on the
    // bucket, and the exact range predicate filters after the hash
    // join. Cost: one hash shuffle on the bucket; fan-out per interval
    // is ceil(len/bucket)+1 = 2 rows, independent of data size.
    "q_range_join" -> ((s, d) => {
      val bucketUs = 7200000000L // 2h in µs = the interval length
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"))
      val intervals = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("interval_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + bucketUs).as("end_us"))
        .select(col("interval_id"), col("start_us"), col("end_us"),
          explode(sequence(
            expr(s"start_us div ${bucketUs}L"),
            expr(s"end_us div ${bucketUs}L"))).as("bucket"))
      val probes = ev.filter(col("event_type") =!= "error")
        .withColumn("bucket", expr(s"ts_us div ${bucketUs}L"))
      probes.join(intervals, Seq("bucket"))
        .filter(col("ts_us") > col("start_us") && col("ts_us") <= col("end_us"))
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
    }),

    // Correlated scalar subquery, decorrelated (TPC-H Q17 shape):
    // lineitems below 20% of their part's average quantity. The
    // correlated form (SELECT avg(l_quantity) WHERE l_partkey =
    // outer.l_partkey) re-scans the fact table per row — the ONLY
    // scale-safe plan is decorrelation into one per-key aggregate +
    // equi-join, which is what Catalyst's RewriteCorrelatedScalarQuery
    // does and what this spells out explicitly. Threshold compare in
    // exact integers: quantities are integral, so qty < 0.2·(sum/cnt)
    // ⟺ qty·5·cnt < sum — no float boundary to disagree on. Revenue
    // in exact cents (per-row round of the SAME double is
    // IEEE-deterministic; the integer sum then has one value).
    "q17_small_qty" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val stats = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt_qty"))
      val pt = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"))
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .join(stats, li("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("cnt_qty") <
          col("sum_qty"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_small"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("sum_cents"))
        .withColumn("avg_yearly_cents", expr("sum_cents div 7"))
    }),

    // W1 property upsert = last-writer-wins per key
    // (queries.ex:121-155): latest event value per (user_id,
    // event_type). One shuffle on the key, rank inside partition.
    "w1_upsert_lastvalue" -> ((s, d) => {
      // last-writer pick as max_by over the unique (ts, event_id)
      // order instead of a rank-1 window (r17 opt round, guide §2.3):
      // identical winning row, no per-key sort, map-side partials
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(max_by(struct(col("value"), col("event_id")),
          struct(col("ts"), col("event_id"))).as("last"))
        .select(col("user_id"), col("event_type"),
                round(col("last.value"), 4).as("last_value"),
                col("last.event_id").as("last_event_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_join5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    // the plain join — the bloom prefilter must be invisible here
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |GROUP BY 1""".stripMargin,
    "q6_filter_sum" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin,
    "j5_prune_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q17_small_qty" ->
      """WITH stats AS (
        |  SELECT l_partkey AS pk, sum(l_quantity::BIGINT) AS sum_qty,
        |         count(*) AS cnt_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_small,
        |  sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_cents,
        |  sum(round(l_extendedprice * 100)::BIGINT)::BIGINT // 7
        |    AS avg_yearly_cents
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN stats s ON l.l_partkey = s.pk
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l.l_quantity::BIGINT * 5 * s.cnt_qty < s.sum_qty
        |GROUP BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_setops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |GROUP BY user_id HAVING count(*) > 14""".stripMargin,
    "q_skew_profile" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, count(*) AS n_user
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n_user DESC, user_id ASC) AS rn
        |  FROM pu),
        |t AS (
        |  SELECT event_type, sum(n_user)::BIGINT AS n_rows,
        |    max(CASE WHEN rn = 1 THEN user_id END) AS top_user,
        |    max(CASE WHEN rn = 1 THEN n_user END)::BIGINT AS top_user_rows
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_rows,
        |  (n_rows * 10000 // sum(n_rows) OVER ())::BIGINT AS share_bp,
        |  top_user,
        |  (top_user_rows * 10000 // n_rows)::BIGINT AS top_user_bp
        |FROM t""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
        |FROM events GROUP BY user_id""".stripMargin,
    "q_rel_division" ->
      """WITH n AS (
        |  SELECT count(DISTINCT epoch_ms(ts) // 604800000) AS n_weeks
        |  FROM events)
        |SELECT user_id,
        |  count(DISTINCT epoch_ms(ts) // 604800000) AS n_user_weeks
        |FROM events CROSS JOIN n
        |WHERE event_type = 'purchase'
        |GROUP BY user_id, n.n_weeks
        |HAVING count(DISTINCT epoch_ms(ts) // 604800000) = n_weeks""".stripMargin,
    "q_mad_outliers" ->
      """WITH ev AS (
        |  SELECT event_type, round(value * 100)::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL),
        |med AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = ceil(n * 0.5) THEN cents END) AS med_cents
        |  FROM (SELECT event_type, cents,
        |          row_number() OVER (PARTITION BY event_type
        |            ORDER BY cents) AS rn,
        |          count(*) OVER (PARTITION BY event_type) AS n
        |        FROM ev)
        |  GROUP BY 1),
        |dev AS (
        |  SELECT ev.event_type, cents, med_cents,
        |    abs(cents - med_cents) AS dev
        |  FROM ev JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = ceil(n * 0.5) THEN dev END) AS med_dev
        |  FROM (SELECT event_type, dev,
        |          row_number() OVER (PARTITION BY event_type
        |            ORDER BY dev) AS rn,
        |          count(*) OVER (PARTITION BY event_type) AS n
        |        FROM dev)
        |  GROUP BY 1)
        |SELECT d.event_type, d.med_cents,
        |  max(m.med_dev)::BIGINT AS mad_cents,
        |  count(*) AS n,
        |  sum(CASE WHEN d.dev > m.med_dev * 3 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_outliers,
        |  (sum(CASE WHEN d.dev > m.med_dev * 3 THEN 1 ELSE 0 END)::BIGINT
        |    * 10000) // count(*) AS outlier_bp
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1, 2""".stripMargin,
    "q_percentiles" ->
      """WITH c AS (
        |  SELECT event_type, round(value * 100)::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c)
        |SELECT event_type, max(n)::BIGINT AS n,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN cents END) AS p50_cents,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN cents END) AS p90_cents,
        |  max(CASE WHEN rn = ceil(n * 0.99) THEN cents END) AS p99_cents
        |FROM r GROUP BY event_type""".stripMargin,
    "q_histogram" ->
      """SELECT event_type,
        |  round(value * 100)::BIGINT // 1000 AS bucket,
        |  count(*) AS n,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "q_histogram_eqdepth" ->
      """WITH pv AS (
        |  SELECT round(value * 100)::BIGINT AS cents, count(*) AS nv
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT cents, nv,
        |    sum(nv) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM pv),
        |t AS (SELECT sum(nv)::BIGINT AS n_total FROM pv)
        |SELECT ((cum - nv) * 8 // n_total)::BIGINT AS bucket,
        |  min(cents) AS lo, max(cents) AS hi,
        |  sum(nv)::BIGINT AS n_rows, count(*) AS n_values
        |FROM c CROSS JOIN t GROUP BY 1""".stripMargin,
    "q_revenue_gini" ->
      """WITH rev AS (
        |  SELECT user_id, sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS n_users,
        |        sum(cents)::BIGINT AS total_cents FROM rev),
        |r AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents ASC, user_id ASC) AS rnk
        |  FROM rev)
        |SELECT n_users, total_cents,
        |  ((2 * sum(rnk * cents) - (n_users::HUGEINT + 1) * total_cents)
        |    * 10000 // (n_users::HUGEINT * total_cents))::BIGINT
        |    AS gini_bp,
        |  (sum(CASE WHEN rnk > n_users - n_users // 10
        |    THEN cents END)::BIGINT * 10000 // total_cents)::BIGINT
        |    AS top10_share_bp
        |FROM r CROSS JOIN t
        |GROUP BY n_users, total_cents""".stripMargin,
    "q_wow_growth" ->
      """WITH weekly AS (
        |  SELECT event_type, epoch_ms(ts) // 604800000 AS wk,
        |    count(*) AS n,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT *, lag(cents) OVER (PARTITION BY event_type
        |    ORDER BY wk) AS prev_cents
        |  FROM weekly)
        |SELECT event_type, wk, n, cents,
        |  (cents - prev_cents)::BIGINT AS delta_cents,
        |  (cents * 10000 // prev_cents)::BIGINT AS ratio_bp
        |FROM l""".stripMargin,
    "q_growth_accounting" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk
        |  FROM events WHERE event_id % 23 = 0),
        |l AS (
        |  SELECT user_id, wk,
        |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
        |    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
        |  FROM wk),
        |act AS (
        |  SELECT wk, CASE WHEN prev IS NULL THEN 'new'
        |                  WHEN prev = wk - 1 THEN 'retained'
        |                  ELSE 'resurrected' END AS status
        |  FROM l),
        |m AS (SELECT max(wk) AS max_wk FROM wk),
        |ch AS (
        |  SELECT wk + 1 AS wk, 'churned_from' AS status
        |  FROM l CROSS JOIN m
        |  WHERE wk < max_wk AND (nxt IS NULL OR nxt > wk + 1))
        |SELECT wk, status, count(*)::BIGINT AS n
        |FROM (SELECT * FROM act UNION ALL SELECT * FROM ch) u
        |GROUP BY 1, 2""".stripMargin,
    "q_rolling_24h" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, event_type,
        |  count(*) OVER w AS n_24h,
        |  (sum(cents) OVER w)::BIGINT AS sum_cents_24h
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms
        |  RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_cumulative_users" ->
      """WITH e AS (
        |  SELECT event_id, event_type, user_id, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |fs AS (
        |  SELECT event_type, user_id, ts_ms,
        |    row_number() OVER (PARTITION BY event_type, user_id
        |      ORDER BY ts_ms, event_id) AS rn
        |  FROM e),
        |daily AS (
        |  SELECT event_type, ts_ms // 86400000 AS day,
        |    count(*) AS new_users
        |  FROM fs WHERE rn = 1 GROUP BY 1, 2)
        |SELECT event_type, day, new_users,
        |  sum(new_users) OVER (PARTITION BY event_type ORDER BY day)::BIGINT
        |    AS cum_users
        |FROM daily""".stripMargin,
    "q_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |iv AS (
        |  SELECT event_id AS interval_id, ts_us AS start_us,
        |    ts_us + 7200000000 AS end_us
        |  FROM ev WHERE event_type = 'error')
        |SELECT interval_id, count(*) AS n_events,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_purchases
        |FROM iv JOIN ev ON ev.event_type <> 'error'
        |  AND ev.ts_us > iv.start_us AND ev.ts_us <= iv.end_us
        |GROUP BY 1""".stripMargin,
    "q_funnel" ->
      """WITH m AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup'
        |             THEN epoch_us(ts) END) AS t_s,
        |    min(CASE WHEN event_type = 'click'
        |             THEN epoch_us(ts) END) AS t_c,
        |    min(CASE WHEN event_type = 'purchase'
        |             THEN epoch_us(ts) END) AS t_p
        |  FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase')
        |  GROUP BY 1)
        |SELECT
        |  count(CASE WHEN t_s IS NOT NULL THEN 1 END) AS n_signup,
        |  count(CASE WHEN t_s < t_c THEN 1 END) AS n_signup_click,
        |  count(CASE WHEN t_s < t_c AND t_c < t_p THEN 1 END)
        |    AS n_full_funnel
        |FROM m""".stripMargin,
    "q_dq_report" ->
      """SELECT 'lineitem_orphan_orderkey' AS check_name,
        |  count(*)::BIGINT AS n_violations, count(*)::BIGINT AS n_checked
        |FROM (SELECT l_orderkey FROM lineitem
        |      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) t
        |UNION ALL
        |SELECT 'orders_dup_orderkey',
        |  (count(*) - count(DISTINCT o_orderkey))::BIGINT,
        |  count(*)::BIGINT
        |FROM orders
        |UNION ALL
        |SELECT 'events_null_value',
        |  count(CASE WHEN value IS NULL THEN 1 END)::BIGINT,
        |  count(*)::BIGINT
        |FROM events
        |UNION ALL
        |SELECT 'events_type_domain',
        |  count(CASE WHEN event_type NOT IN
        |    ('signup', 'click', 'view', 'purchase', 'error') THEN 1
        |    END)::BIGINT,
        |  count(*)::BIGINT
        |FROM events
        |UNION ALL
        |SELECT 'orders_nonpositive_total',
        |  count(CASE WHEN o_totalprice <= 0 THEN 1 END)::BIGINT,
        |  count(*)::BIGINT
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_ship_before_order',
        |  count(CASE WHEN l_shipdate < o_orderdate THEN 1 END)::BIGINT,
        |  count(*)::BIGINT
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    // plain user join — the oracle needn't be scale-shaped, only equal
    "q_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |p AS (SELECT event_id AS pid, user_id, tus AS t_p, cents
        |      FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS cid, user_id, tus AS t_c
        |      FROM ev WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.pid, p.cents, c.cid, c.t_c
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.t_c < p.t_p AND c.t_c >= p.t_p - 86400000000),
        |w AS (
        |  SELECT pid, cents, t_c, cid,
        |    count(*) OVER (PARTITION BY pid) AS k,
        |    row_number() OVER (PARTITION BY pid
        |      ORDER BY t_c ASC, cid ASC) AS rn
        |  FROM pairs),
        |cr AS (
        |  SELECT t_c, cents,
        |    (10000 // k
        |      + CASE WHEN rn = 1 THEN 10000 % k ELSE 0 END)::BIGINT
        |      AS credit_bp
        |  FROM w)
        |SELECT (t_c // 3600000000) % 24 AS click_hour,
        |  count(*) AS n_credits,
        |  sum(credit_bp)::BIGINT AS credit_bp_sum,
        |  sum(cents * credit_bp // 10000)::BIGINT AS attr_cents
        |FROM cr GROUP BY 1""".stripMargin,
    "w1_upsert_lastvalue" ->
      """SELECT user_id, event_type, round(value, 4) AS last_value,
        |  event_id AS last_event_id
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin
  )
}
