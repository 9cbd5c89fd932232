package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Expression conversions (Spark 4
  * removed the public `Column(expr)` constructor in favor of
  * Connect-agnostic columns). Standard pattern for extension libraries
  * that define native Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]`; custom expressions
    * outside this package need it to declare `inputTypes` (analysis-time
    * type contracts on ImplicitCastInputTypes). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
