package graft.operators

import org.apache.spark.sql.Dataset

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
  */
object Checkpoints {

  /** True iff round state in this session goes through the reliable
    * `checkpoint` path (a checkpoint dir is configured). Callers that
    * manually release superseded LOCAL round blocks (e.g.
    * [[graft.BpeTokenizer]]) must skip the release on this path —
    * reliable checkpoints are files, not executor blocks. */
  def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Break lineage on iterative round state; see the object doc. */
  def stable[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    if (reliable(ds)) ds.checkpoint(eager) else ds.localCheckpoint(eager)
}
