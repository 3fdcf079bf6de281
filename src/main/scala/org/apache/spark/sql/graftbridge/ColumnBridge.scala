package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column<->Expression converters.
  *
  * Spark 4 moved the Column API behind ColumnNode (Spark Connect); the
  * supported way for libraries to lift a custom Catalyst Expression into a
  * Column is `classic.ExpressionUtils`, which is `private[sql]` — hence
  * this one-file shim inside the sql package, the conventional pattern for
  * Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> catalyst conversion. [[expression]] wraps the
    * node lazily (ColumnNodeExpression), which only unwraps when a plan
    * converter walks the tree — fine inside Dataset transformations, but
    * an expression RETURNED FROM a FunctionRegistry builder is spliced
    * into the plan as-is and the wrapper never resolves. SQL-facing
    * function builders must convert eagerly.
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** `AbstractDataType` is `private[sql]`; alias it out so library code
    * (graft.*) can declare `ExpectsInputTypes.inputTypes`.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
