// The classic-API bridge from a Catalyst Expression to a user-facing Column
// is private[sql] in Spark 4 (Column.apply(ColumnNode) and
// ExpressionColumnNode.apply). This shim lives in the org.apache.spark.sql
// package solely to re-export that one constructor for graft's custom
// expressions; it contains no logic.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

object GraftColumn {
  /** Wrap a raw Catalyst expression as a Column (analyzer resolves any
    * UnresolvedAttribute children at plan time, like selectExpr does). */
  def apply(e: Expression): Column = Column(ExpressionColumnNode(e))
}
