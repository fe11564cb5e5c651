package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join family: for every left row, attach the right row
  * matched by time per key — latest at-or-before (`join`), earliest
  * at-or-after (`joinForward`), or time-closest (`joinNearest`). The
  * general form of the reference's previous-value point lookup
  * (SURVEY §2.3 J3) and a staple operator Spark lacks natively.
  *
  * Implementation is the scalable union trick, NOT a range join:
  * tag both sides, union, then one window pass per key ordered by
  * (time, side) carrying the right value across
  * (`last/first(ignoreNulls)`). Cost = ONE shuffle on the key + a
  * sort — no key-cardinality blowup, no O(left × right-per-key) pair
  * expansion, skew-safe under AQE. A broadcast-range join would
  * explode exactly when it matters (hot keys at 100 TB).
  */
object AsOfJoin {

  /** Epoch-milliseconds view of a time column, so `toleranceMs` and
    * `asof_time` are well-defined for any supported time type: SQL
    * TIMESTAMP columns convert via `unix_millis` (a plain
    * `cast("long")` would silently yield SECONDS), DATE via day
    * arithmetic, and numeric columns are taken as epoch-milliseconds
    * as-is (the convention of every in-repo caller).
    */
  private def millisOf(dt: org.apache.spark.sql.types.DataType, c: Column): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_millis(c)
      case org.apache.spark.sql.types.DateType =>
        unix_date(c).cast("long") * 86400000L
      case _ => c.cast("long")
    }

  /** The shared union-trick scaffolding: right side pruned to
    * key/time/values (anything else would collide with left columns
    * through the union), values packed into ONE struct (a matched
    * right row whose values are all NULL still yields a non-null
    * struct, so ignoreNulls carries the matched row's NULLs instead
    * of skipping to another row — true as-of semantics; DuckDB ASOF
    * agrees), left-only columns null-filled on the right, both sides
    * tagged with (__t, __side, __rv). Right rows get __side = 0 so
    * they sort BEFORE left rows at equal time under ascending side
    * order — a same-timestamp right value is visible to the left row
    * in every variant (<= / >=, not strict). `withRt` additionally
    * packs the right TIME into the struct (as `__rt`) for distance
    * arithmetic.
    */
  private def taggedUnion(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      withRt: Boolean): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    val rightKept = right.select(
      (keyCols ++ Seq(rightTime) ++ rightVals).distinct.map(col): _*)
    val rvStruct = struct(rightVals.map(col) ++
      (if (withRt)
        Seq(millisOf(rightKept.schema(rightTime).dataType,
          col(rightTime)).as("__rt"))
      else Nil): _*)
    val rvType = {
      val f = rightVals.map(c =>
        org.apache.spark.sql.types.StructField(c, rightKept.schema(c).dataType)) ++
        (if (withRt) Seq(org.apache.spark.sql.types.StructField("__rt",
          org.apache.spark.sql.types.LongType)) else Nil)
      org.apache.spark.sql.types.StructType(f)
    }
    val l = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = leftCols.foldLeft(
        rightKept
          .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
          .withColumn("__rv", rvStruct)) {
        (df, c) => if (df.columns.contains(c)) df else
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val shape = (keyCols ++ leftCols.filterNot(keyCols.contains))
      .map(c => col(c)) ++ Seq(col("__t"), col("__side"), col("__rv"))
    (l.select(shape: _*).unionByName(r.select(shape: _*)), leftCols)
  }

  private def carryOneDirection(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      timeOrder: Column): DataFrame = {
    val (unioned, leftCols) = taggedUnion(
      left, right, keyCols, leftTime, rightTime, rightVals, withRt = false)
    // ties among right rows at one time break on the value struct
    // (deterministic regardless of partitioning)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1) // keep only left rows
      .select(leftCols.map(col) ++
        rightVals.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** @param left       probe side
    * @param right      build side (its latest-at-or-before row wins)
    * @param keyCols    equi-join key column names (present both sides)
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightVals  right columns to carry onto left rows
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame =
    carryOneDirection(left, right, keyCols, leftTime, rightTime, rightVals,
      col("__t").asc)

  /** Forward as-of join: for every left row, the EARLIEST right row
    * whose time is >= the left row's time, per key. Identical plan —
    * only the window order flips to descending time (the "last
    * preceding" in descending order IS the nearest following).
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame =
    carryOneDirection(left, right, keyCols, leftTime, rightTime, rightVals,
      col("__t").desc)

  /** Nearest as-of join: the right row closest in time to each left
    * row, per key — backward wins ties. Still ONE shuffle + sort: the
    * ascending union pass computes the backward carry
    * (`last ignoreNulls` over preceding) and the forward carry
    * (`first ignoreNulls` over following) in the same window, then
    * picks per row by time distance. An exact-time right match always
    * wins as backward with distance 0, so the forward carry being
    * strictly-after at ties is immaterial. Optional `toleranceMs`
    * nulls out matches farther than the bound (both directions).
    *
    * Output: `asof_<v>` per carried column, `asof_time` (the matched
    * right time as epoch-MILLISECONDS, whatever the input time type)
    * and `asof_dir` ('backward'/'forward'/NULL). `toleranceMs` is
    * milliseconds for TIMESTAMP/DATE columns and for numeric time
    * columns holding epoch-ms; a numeric column in other units is
    * compared in its own units.
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val (unioned, leftCols) = taggedUnion(
      left, right, keyCols, leftTime, rightTime, rightVals, withRt = true)
    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv"))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withCarries = unioned
      .withColumn("__back", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", first(col("__rv"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    // dispatch on the UNIONED frame's __t type, not the left input's:
    // unionByName coerces the time column (e.g. DATE left + TIMESTAMP
    // right → TIMESTAMP), and converting the coerced column with the
    // pre-union type's rule would day-truncate or fail the analysis
    val lMillis = millisOf(unioned.schema("__t").dataType, col("__t"))
    val bd = lMillis - col("__back").getField("__rt")
    val fd = col("__fwd").getField("__rt") - lMillis
    val bOk = toleranceMs.fold(col("__back").isNotNull)(t =>
      col("__back").isNotNull && bd <= t)
    val fOk = toleranceMs.fold(col("__fwd").isNotNull)(t =>
      col("__fwd").isNotNull && fd <= t)
    val pickBack = bOk && (!fOk || bd <= fd)
    val pickFwd = fOk && !pickBack
    val chosen = when(pickBack, col("__back"))
      .when(pickFwd, col("__fwd"))
    withCarries.select(leftCols.map(col) ++
      rightVals.map(c => chosen.getField(c).as(s"asof_$c")) ++ Seq(
        chosen.getField("__rt").as("asof_time"),
        when(pickBack, "backward").when(pickFwd, "forward")
          .otherwise(lit(null)).as("asof_dir")): _*)
  }
}
