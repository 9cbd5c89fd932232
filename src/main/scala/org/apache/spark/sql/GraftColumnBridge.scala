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

  /** Release the storage blocks of a Dataset produced by
    * `localCheckpoint(...)` once its consumers have run.
    * `Dataset.unpersist` only drops CacheManager entries, so checkpoint
    * blocks otherwise live until the ContextCleaner's weak-reference
    * pass after a driver GC — at several checkpoints per visit that
    * builds tens of GB of dead blocks long before the cleaner runs
    * (the round-5 100× soak's visit-22-26 latency spikes). Safe only
    * when the frame will not be recomputed afterwards: a released
    * local checkpoint cannot be rebuilt (its lineage is truncated). */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
