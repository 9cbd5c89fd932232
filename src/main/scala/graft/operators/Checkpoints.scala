package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage-break strategy for ITERATIVE round state.
  *
  * The iterative operators (star contraction, PageRank, Lloyd rounds,
  * BPE merges, the curation-pipeline fold) break lineage every round
  * so plans never compound. `localCheckpoint` is the right default —
  * executor-local blocks, no DFS round-trip — but its truncated
  * lineage CANNOT be recomputed after an executor loss: on a
  * preemptible / dynamically-allocated cluster, one lost executor at
  * round k kills the whole job (Spark says so at runtime:
  * "locally checkpointed … cannot be recomputed after unpersisting").
  * Single-shot lineage breaks elsewhere in the engine share the
  * exposure for at most one query retry; round state COMPOUNDS it —
  * k rounds of work are gone.
  *
  * [[stable]] picks per session: when the operator owns a RELIABLE
  * checkpoint dir (`SparkContext.setCheckpointDir` — HDFS/object
  * store on a real cluster), round state goes through
  * `Dataset.checkpoint` and survives executor loss; otherwise the
  * fast local path is kept (local[n], dedicated executors). The
  * oracle keys never set a checkpoint dir, so their plans and bench
  * cost are byte-identical either way; a production deployment opts
  * in with one line of session setup.
  *
  * Iterative LOOPS go through a [[Loop]] instead of raw [[stable]]
  * calls: the Loop latches the strategy once for the whole loop and
  * frees SUPERSEDED round state as the loop advances (local blocks
  * released; reliable checkpoint files deleted — Spark never cleans
  * `Dataset.checkpoint` output itself, so an unrotated k-round job
  * leaves k full copies on the checkpoint store; ADVICE r13).
  */
object Checkpoints {

  /** True iff round state in this session goes through the reliable
    * `checkpoint` path (a checkpoint dir is configured). Callers that
    * manually release superseded LOCAL round blocks must skip the
    * release on this path — reliable checkpoints are files, not
    * executor blocks. Loops should latch this ONCE (via [[Loop]])
    * rather than re-evaluating per round: a concurrent
    * `setCheckpointDir` flip mid-loop must not mix the strategies a
    * single loop's release decisions assume (ADVICE r13). */
  def reliable(ds: Dataset[_]): Boolean =
    reliable(ds.sparkSession)

  def reliable(spark: SparkSession): Boolean =
    spark.sparkContext.getCheckpointDir.isDefined

  /** Break lineage on iterative round state; see the object doc.
    *
    * Reliable-path detail (ADVICE r13): an eager `Dataset.checkpoint`
    * alone executes the plan TWICE — the eager count action, then the
    * checkpoint-write job recomputes the RDD — which both doubles the
    * round cost and double-fires any `observe` metrics riding the plan
    * (a bit_xor sketch self-cancels to 0, a count doubles). A
    * transient MEMORY_AND_DISK persist brackets the checkpoint so the
    * write job reads the cached blocks instead of recomputing: one
    * execution, metrics fire once, cache dropped immediately after.
    * Contract: `ds` must not be independently persisted by the caller
    * (the bracket unpersists it). */
  def stable[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    stableAs(reliable(ds), ds, eager)

  /** [[stable]] with the strategy FORCED by the caller — the latch
    * point [[Loop]] uses so a mid-loop checkpoint-dir flip cannot
    * change strategy between rounds. */
  private[graft] def stableAs[T](useReliable: Boolean, ds: Dataset[T],
      eager: Boolean = true): Dataset[T] =
    if (!useReliable) ds.localCheckpoint(eager)
    else if (!eager) ds.checkpoint(false)
    else {
      ds.persist(StorageLevel.MEMORY_AND_DISK)
      try ds.checkpoint(true)
      finally ds.unpersist(blocking = false)
    }

  /** Free a ONE-SHOT [[stable]] frame once its single consumer is done:
    * local checkpoint blocks are released, reliable checkpoint files
    * deleted (Spark cleans neither itself — an unreleased nightly
    * maintenance frame strands one table copy per night). Best-effort
    * like [[Loop]]'s rotation: housekeeping failures never kill the
    * caller. Same root-only contract as the bridge helpers: pass the
    * directly-checkpointed frame. */
  def release(ds: Dataset[_]): Unit =
    org.apache.spark.sql.GraftColumnBridge.checkpointFile(ds) match {
      case Some(f) =>
        val p = new org.apache.hadoop.fs.Path(f)
        scala.util.Try(p.getFileSystem(
          ds.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)): Unit
      case None =>
        scala.util.Try(
          org.apache.spark.sql.GraftColumnBridge
            .releaseLocalCheckpoint(ds)): Unit
    }

  /** Rotating lineage-break for ONE iterative loop.
    *
    * Latches the strategy at construction (the [[graft.BpeTokenizer]]
    * latch advice: release decisions and checkpoint calls must agree
    * for the whole loop even if another session user flips the
    * checkpoint dir mid-train) and keeps only the last `keep` rounds'
    * state alive:
    *  - LOCAL path: superseded round blocks are released eagerly
    *    (`Dataset.unpersist` never drops checkpoint blocks — the
    *    round-5 soak-spike lesson GraftColumnBridge encodes);
    *  - RELIABLE path: superseded rounds' checkpoint FILES are deleted
    *    (the MLlib PeriodicCheckpointer pattern). Without this, BPE
    *    writes one full word-table copy per merge and PageRank one
    *    rank copy per round — unbounded DFS growth on exactly the
    *    preemptible-cluster posture the reliable path targets.
    *
    * Only round state that later rounds no longer read may flow
    * through a Loop. `keep >= 2` covers consumers that compare round
    * k+1 against round k (star contraction's exceptAll fixpoint
    * check); `keep = 1` is for strict supersession (BPE's word table).
    * Loop-INVARIANT frames (edge lists, node tables) stay on plain
    * [[stable]] — a Loop would rotate them away mid-loop. The final
    * `keep` rounds are never freed here (the loop's result is one of
    * them); their cleanup is the session's (local blocks die with the
    * executors; at most `keep` reliable copies remain on the store —
    * bounded, vs one per round). */
  final class Loop(spark: SparkSession, keep: Int = 2) {
    require(keep >= 1, s"Checkpoints.Loop: keep must be >= 1, got $keep")
    val useReliable: Boolean = Checkpoints.reliable(spark)
    private val sc = spark.sparkContext
    private val hist = scala.collection.mutable.Queue.empty[Dataset[_]]

    def stable[T](ds: Dataset[T]): Dataset[T] = {
      val cp = stableAs(useReliable, ds, eager = true)
      hist.enqueue(cp)
      while (hist.size > keep) free(hist.dequeue())
      cp
    }

    // [[Checkpoints.release]] dispatches on checkpointFile, which is
    // Some iff the frame went through the reliable path — behaviorally
    // identical to dispatching on the latched strategy for frames this
    // Loop created, and ONE copy of the housekeeping instead of two
    private def free(old: Dataset[_]): Unit = Checkpoints.release(old)
  }
}
