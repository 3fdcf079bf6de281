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

  /** `AbstractDataType` is `private[sql]`; alias it out so library code
    * (graft.*) can declare `ExpectsInputTypes.inputTypes`.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
