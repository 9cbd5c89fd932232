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
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case p =>
        // Only the plan ROOT may match: walking the whole tree would
        // release every LogicalRDD a derived frame happens to embed —
        // including checkpoint blocks still shared with other consumers,
        // whose truncated-lineage RDDs then fail to recompute. Misuse
        // must fail loudly here, not corrupt a sibling's plan later.
        throw new IllegalArgumentException(
          "releaseLocalCheckpoint: plan root is " +
            s"${p.getClass.getSimpleName}, not a LogicalRDD — pass the " +
            "directly-checkpointed frame, not one derived from it")
    }

  /** True when `df` IS a materialized frame (plan root is the
    * checkpoint/RDD node) — i.e. [[releaseLocalCheckpoint]] would accept
    * it. Lets writers skip a redundant second materialization when the
    * caller already checkpointed. */
  def isMaterialized(df: Dataset[_]): Boolean =
    df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  /** The RELIABLE-checkpoint directory backing a frame returned by
    * `Dataset.checkpoint` — None for local checkpoints and
    * non-checkpoint frames (`RDD.getCheckpointFile` only reports
    * reliable checkpoint data). Spark never auto-deletes these files
    * (only `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * does, on RDD GC), so iterative loops rotate them explicitly via
    * [[graft.operators.Checkpoints.Loop]] (ADVICE r13). Same root-only
    * contract as [[releaseLocalCheckpoint]]: pass the
    * directly-checkpointed frame. */
  def checkpointFile(df: Dataset[_]): Option[String] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getCheckpointFile
      case _ => None
    }
}
