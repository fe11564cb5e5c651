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
    // side ordering: at equal times the right row sorts FIRST so a
    // same-timestamp right value is visible to the left row (<=, not <)
    val l = rightVals.foldLeft(
        left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
        (df, c) => df.withColumn(s"__rv_$c", lit(null).cast(right.schema(c).dataType))
      }
    val r0 = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
    val r = leftCols.foldLeft(
        rightVals.foldLeft(r0)((df, c) => df.withColumn(s"__rv_$c", col(c)))) {
        (df, c) => if (df.columns.contains(c)) df else
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }.select((keyCols ++ leftCols.filterNot(keyCols.contains))
          .map(c => col(c)) ++
        Seq(col("__t"), col("__side")) ++ rightVals.map(c => col(s"__rv_$c")): _*)

    val lAligned = l.select((keyCols ++ leftCols.filterNot(keyCols.contains))
        .map(c => col(c)) ++
      Seq(col("__t"), col("__side")) ++ rightVals.map(c => col(s"__rv_$c")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightVals.foldLeft(lAligned.unionByName(r)) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("__side") === 1) // keep only left rows
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
