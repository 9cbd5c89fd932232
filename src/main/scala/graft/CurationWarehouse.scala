package graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Persistent curated-corpus warehouse: the batch-incremental ingest
  * path ([[CorpusPipeline.incrementalIngestWithIndex]] /
  * [[CorpusPipeline.incrementalNearDup]]) made durable. Each ingest
  * lands as one immutable SLICE directory holding three parquet tables:
  *
  *   - `docs` — the curated documents (with split assignment),
  *   - `fp`   — (doc_id, fp) canonical-content fingerprints,
  *   - `sigs` — (doc_id, sig) 64-long MinHash signatures,
  *
  * and becomes visible only when its empty COMMIT MARKER
  * (`commits/<sliceId>`) is created — the last step of the ingest.
  * Readers union exclusively committed slices, so a crash between the
  * three table writes leaves an invisible orphan directory (retried or
  * garbage-collected later), never a docs/index mismatch that would
  * re-admit duplicates — the "incremental == batch-on-union" invariant
  * survives mid-ingest failure. Marker creation is a single filesystem
  * create (atomic on HDFS; a single PUT on object stores), the same
  * commit shape as Spark's own _SUCCESS protocol, extended over three
  * tables.
  *
  * Each ingest reads ONLY the two small indexes (never warehouse text),
  * dedups the new slice against itself and the indexes, and appends the
  * survivors plus their index rows — the `obj_last` snapshot pattern
  * applied to corpus curation. At 100 TB the index tables are the
  * working set: ~48 bytes/doc of fingerprint and ~512 bytes/doc of
  * signature, bucketable by `fp`/`doc_id` for co-located anti-joins.
  * The daily-slice cost is proportional to the slice, not the corpus.
  *
  * Concurrency contract: ONE ingest per warehouse at a time, now
  * ENFORCED by a single-writer lease (`claims/LEASE`, created
  * fail-if-exists at ingest/init start, deleted at the end). Without
  * it, two concurrent ingests could each admit the other's duplicates
  * — both read the indexes before either commits. A second writer now
  * fails fast with `IllegalStateException` instead. Each lease carries
  * its owner's unique TOKEN: release deletes only a lease still
  * holding the releaser's token, and a crashed writer's stale lease
  * (older than [[LeaseTtlMs]]) is broken by an atomic RENAME followed
  * by a token check on the renamed file — only one breaker can win,
  * an overtaken writer cannot delete its successor's lease, and a
  * breaker that raced a fresh re-acquire renames the fresh lease
  * straight back instead of stealing it. Beneath the
  * lease, the claim files and fail-if-exists commit markers still
  * bound the damage of any protocol violation to disjoint extra
  * slices, never clobbered files. */
object CurationWarehouse {

  /** A lease older than this is considered abandoned by a crashed
    * writer and may be broken. Generous vs any real slice ingest; a
    * stuck-but-alive writer past this bound has already violated the
    * operational contract. (The protocol lives in [[WriterLease]]
    * since round 10 — the index-maintenance verbs share it.) */
  val LeaseTtlMs: Long = WriterLease.TtlMs

  private def fpOf(docs: DataFrame): DataFrame =
    CorpusPipeline.piiScrub(docs)
      .select(col("doc_id"),
        CorpusPipeline.fingerprintCol(col("text")).as("fp"))

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Slice ids with a commit marker, ascending. */
  private def committed(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val commits = new Path(dir, "commits")
    if (!f.exists(commits)) Seq.empty
    else f.listStatus(commits).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
  }

  private def read(spark: SparkSession, dir: String, table: String): DataFrame = {
    val ids = committed(spark, dir)
    require(ids.nonEmpty, s"no committed slices under $dir")
    spark.read.parquet(ids.map(i => s"$dir/slices/$i/$table"): _*)
  }

  /** Atomic fail-if-exists create ([[EstateFs.createExclusive]]:
    * O_EXCL on local — Hadoop's local create(overwrite=false) is
    * check-then-act, caught by the r12 two-JVM probe — server-enforced
    * on HDFS). ONLY "already exists" means the name is taken; any
    * other failure (permissions, quota, bad dir) propagates —
    * swallowing it would turn [[claimSliceId]]'s scan into an
    * infinite loop. */
  private def tryCreate(f: org.apache.hadoop.fs.FileSystem,
      p: Path): Boolean =
    EstateFs.createExclusive(p.toString)

  /** Acquire the warehouse's single-writer lease; returns the owner
    * token to pass to [[releaseLease]]. Must be held across the whole
    * read-indexes → dedup → commit span: the duplicate-admission race
    * lives between the index read and the marker create. Protocol
    * (atomic claim, token ownership, TTL stale-break): [[WriterLease]]. */
  private def acquireLease(spark: SparkSession, dir: String): String =
    WriterLease.acquire(spark, dir,
      "concurrent ingests would re-admit each other's duplicates.")

  /** Release ONLY our own lease — see [[WriterLease.release]]. */
  private def releaseLease(spark: SparkSession, dir: String,
      token: String): Unit =
    WriterLease.release(spark, dir, token)

  /** Reserve a slice id exclusively: atomically create `claims/<id>`
    * (fail-if-exists). A crashed attempt holds its claim forever, so
    * its id is never reallocated and a half-written slice can never be
    * clobbered by a committed one — the claim is what makes the
    * overwrite=true table writes below safe. Returns the first free id
    * at or after `from`. */
  private def claimSliceId(spark: SparkSession, dir: String,
      from: Long): Long = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir, "claims"))
    var id = from
    while (!tryCreate(f, new Path(s"$dir/claims/$id"))) id += 1
    id
  }

  /** Write one slice's three tables, then its commit marker (LAST — the
    * marker is what makes the slice exist; created fail-if-exists so a
    * protocol violation surfaces loudly instead of silently merging two
    * writers' slices). The caller must own `id` via [[claimSliceId]].
    * The input is materialized ONCE up front: the three table writes
    * would otherwise re-execute the plan, and a nondeterministic
    * curated plan (sampling, rand) could commit mutually inconsistent
    * docs/fp/sigs inside one slice — the exact mismatch the marker
    * protocol exists to rule out. */
  private def commitSlice(spark: SparkSession, dir: String, id: Long,
      docs: DataFrame): Unit = {
    import org.apache.spark.sql.GraftColumnBridge
    // skip the checkpoint when the caller already materialized (ingest
    // hands us its checkpointed survivors — a second copy buys nothing)
    val preMaterialized = GraftColumnBridge.isMaterialized(docs)
    val d = if (preMaterialized) docs else docs.localCheckpoint(true)
    val slice = s"$dir/slices/$id"
    d.write.mode("overwrite").parquet(s"$slice/docs")
    fpOf(d).write.mode("overwrite").parquet(s"$slice/fp")
    DedupQueries.minhashSignatures(d)
      .write.mode("overwrite").parquet(s"$slice/sigs")
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir, "commits"))
    if (!tryCreate(f, new Path(s"$dir/commits/$id")))
      throw new IllegalStateException(
        s"commit marker $dir/commits/$id already exists — slice id was " +
          "not exclusively claimed (protocol violation)")
    // the three writes were the only consumers of a checkpoint WE made;
    // release its blocks instead of stranding them until a driver GC
    // (a caller-materialized frame stays live for the caller)
    if (!preMaterialized) GraftColumnBridge.releaseLocalCheckpoint(d)
  }

  /** Create the warehouse from an ALREADY-CURATED corpus (e.g.
    * `CorpusPipeline.run` output): slice 0. Fails — BEFORE writing
    * anything — if the warehouse has any committed slice, including one
    * created before the claims protocol existed (the old claims-only
    * guard would have overwritten such a warehouse's slice 0 and only
    * then hit the marker conflict). A previous init that crashed after
    * claiming slice 0 but before committing left a half-written,
    * invisible slice 0; under the lease it is safe to reuse and
    * overwrite it, so a crashed init is retryable rather than bricking
    * the warehouse. */
  def init(spark: SparkSession, dir: String, curated: DataFrame): Unit = {
    val lease = acquireLease(spark, dir)
    try {
      require(committed(spark, dir).isEmpty,
        s"warehouse at $dir is already initialized")
      val f = fs(spark, dir)
      if (!f.exists(new Path(s"$dir/claims/0"))) {
        val id = claimSliceId(spark, dir, 0L)
        require(id == 0L, s"warehouse at $dir has a claimed slice $id " +
          "with no committed slices — unreachable under the lease")
      } // else: reclaiming a crashed init's slice 0 (no commit exists)
      commitSlice(spark, dir, 0L, curated)
    } finally releaseLease(spark, dir, lease)
  }

  /** Ingest a new document slice: exact dedup (in-batch + vs the fp
    * index), near-dup rejection vs the signature index, split
    * assignment; commit survivors and their index rows as one atomic
    * slice. Returns the appended documents. */
  def ingest(spark: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
    // the lease spans read-indexes → dedup → commit: that whole span is
    // the critical section (two ingests that both read the indexes
    // before either commits would each admit the other's duplicates)
    val lease = acquireLease(spark, dir)
    try {
      val fps = read(spark, dir, "fp").select("fp")
      val sigs = read(spark, dir, "sigs")
      val afterExact =
        CorpusPipeline.incrementalIngestWithIndex(fps, newDocs)
      val kept = CorpusPipeline.incrementalNearDup(sigs, afterExact)
        // materialize BEFORE writing the slice the indexes were read for:
        // a lazy plan would re-scan `sigs` mid-write (read-what-you-write)
        .localCheckpoint(true)
      // an all-duplicates slice commits nothing (an empty parquet dir
      // would poison later schema inference over the union)
      val out =
        if (!kept.isEmpty) {
          val id = claimSliceId(spark, dir, committed(spark, dir).max + 1L)
          commitSlice(spark, dir, id, kept)
          // return the DURABLE slice, so the checkpoint below can be
          // released instead of leaking until a driver GC
          spark.read.parquet(s"$dir/slices/$id/docs")
        } else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], kept.schema)
      org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(kept)
      out
    } finally releaseLease(spark, dir, lease)
  }

  def docs(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "docs")

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "fp")

  def signatures(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "sigs")
}
