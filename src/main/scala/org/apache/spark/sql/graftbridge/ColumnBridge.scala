package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression interop. Spark 4 made the direct Column
  * constructor private[sql]; this shim lives inside the sql package tree to
  * reach `org.apache.spark.sql.classic.ExpressionUtils` (public Spark source,
  * sql/core columnNodeSupport.scala). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
