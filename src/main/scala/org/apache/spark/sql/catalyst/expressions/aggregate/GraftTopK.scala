package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for the `private[aggregate]` CollectTopK typed aggregate —
  * the bounded-priority-queue top-k collector with map-side partial
  * combine. Scoped here because that is the only package that may
  * construct it; everything else in graft goes through graftshim.Shim.
  */
object GraftTopK {
  def collectTopK(child: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(child, k, reverse).toAggregateExpression()
}
