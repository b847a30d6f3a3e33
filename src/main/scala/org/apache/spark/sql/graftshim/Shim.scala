package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the one
  * hook a library adding native Catalyst expressions needs. Spark 4's
  * classic API intentionally hides these behind the sql package; scoping
  * this object inside org.apache.spark.sql keeps the rest of graft on
  * public API only.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
