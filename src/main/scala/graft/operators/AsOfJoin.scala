package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row whose
  * time is <= the left row's time, per key — the general form of the
  * reference's previous-value point lookup (SURVEY §2.3 J3) and a
  * staple operator Spark lacks natively.
  *
  * Implementation is the scalable union trick, NOT a range join:
  * tag both sides, union, then one window pass per key ordered by
  * (time, side) carrying the last right value forward
  * (`last(ignoreNulls)`). Cost = ONE shuffle on the key + a sort —
  * no key-cardinality blowup, no O(left × right-per-key) pair
  * expansion, skew-safe under AQE. A broadcast-range join would
  * explode exactly when it matters (hot keys at 100 TB).
  */
object AsOfJoin {

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
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right columns outside key/time/values would collide with left
    // columns through the union (type widening) — drop them up front.
    val rightKept = right.select(
      (keyCols ++ Seq(rightTime) ++ rightVals).distinct.map(col): _*)

    // The carried payload is a single STRUCT of the right values: a
    // matched right row whose values are all NULL still yields a
    // non-null struct, so last(ignoreNulls) carries the matched row's
    // NULLs instead of skipping back to an older row (true as-of
    // semantics; DuckDB ASOF agrees).
    val rvStruct = struct(rightVals.map(col): _*)
    val rvType = {
      val f = rightVals.map(c =>
        org.apache.spark.sql.types.StructField(c, rightKept.schema(c).dataType))
      org.apache.spark.sql.types.StructType(f)
    }

    // side ordering: at equal times the right row sorts FIRST so a
    // same-timestamp right value is visible to the left row (<=, not <);
    // ties among right rows break on the value struct (deterministic).
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

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select(shape: _*).unionByName(r.select(shape: _*))
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1) // keep only left rows
      .select(leftCols.map(col) ++
        rightVals.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
