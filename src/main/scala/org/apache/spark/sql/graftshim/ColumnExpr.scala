package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark 4's `private[sql]` Column→Expression
  * converter. Spark 4 made `Column` a Connect-compatible wrapper
  * around a `ColumnNode` and hid the Catalyst expression behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; a file inside the
  * `org.apache.spark.sql` package namespace is the standard extension
  * escape hatch for reaching it (the same pattern Spark-native table
  * formats use for their `private[sql]` touchpoints). Only the
  * data-skipping predicate translator uses this — everything else in
  * the engine stays on the public surface. */
object ColumnExpr {
  /** The Catalyst expression a Column denotes, converted by the
    * session's own node converter (`ExpressionUtils.expression` alone
    * defers behind a lazy `ColumnNodeExpression` wrapper — the
    * session converter resolves function names like `and`/`>` to
    * their Catalyst nodes, leaving attributes unresolved). */
  def exprOf(s: SparkSession, c: Column): Expression =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)
}
