package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between catalyst Expressions and the public Column API.
  *
  * Spark 4 moved Column onto ColumnNode (the Connect-compatible
  * representation) and made the classic Expression<->Column converters
  * `private[sql]`. A library shipping native codegen'd expressions
  * (graft.functions: morton/mmh3/dot/...) needs exactly those two
  * converters to offer typed Column builders without forcing every
  * call through the string FunctionRegistry. This shim lives in an
  * `org.apache.spark.sql` subpackage purely to satisfy the
  * `private[sql]` access — the standard extension-library idiom.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
