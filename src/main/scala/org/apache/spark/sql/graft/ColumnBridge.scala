package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 wraps classic
  * Expressions behind ColumnNode; the converter lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — this shim (inside the sql package namespace, the
  * established pattern for Spark-native libraries) re-exports the two
  * conversions the engine needs to plan its custom expressions
  * (e.g. [[graft.functions.IngestPrecompute]]) into DataFrames.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
