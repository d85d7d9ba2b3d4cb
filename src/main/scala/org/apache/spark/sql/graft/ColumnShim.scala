package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions for
  * graft's native (codegen'd) kernel expressions — the registration
  * point for `graft.functions.DotProduct` (see `VectorFunctions.dot`).
  * Spark 4 hides the Column(Expression) constructor behind
  * `private[sql]`, so the bridge lives in an `org.apache.spark.sql`
  * subpackage — the same access mechanism Spark's own connectors use;
  * no Spark internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
