package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 routes Column through ColumnNode
  * (the Connect refactor) and gates the classic conversion helpers as
  * private[sql]; extension libraries shipping native Catalyst expressions
  * need this one-hop bridge package to expose them as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
