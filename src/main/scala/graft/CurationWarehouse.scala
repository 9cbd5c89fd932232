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
  * Concurrency contract: ONE ingest per warehouse at a time. Slice ids
  * are reserved via atomic fail-if-exists claim files and commit
  * markers are likewise create-if-absent, so concurrent ingests can
  * never clobber each other's files or silently merge — but they could
  * each admit the other's duplicates (both read the indexes before
  * either commits). Serialize ingests; the claims bound the damage of
  * a violation to duplicate admissions in disjoint slices. */
object CurationWarehouse {

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
    while (!scala.util.Try {
      f.create(new Path(s"$dir/claims/$id"), false).close(); true
    }.getOrElse(false)) id += 1
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
    val d = docs.localCheckpoint(true)
    val slice = s"$dir/slices/$id"
    d.write.mode("overwrite").parquet(s"$slice/docs")
    fpOf(d).write.mode("overwrite").parquet(s"$slice/fp")
    DedupQueries.minhashSignatures(d)
      .write.mode("overwrite").parquet(s"$slice/sigs")
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir, "commits"))
    f.create(new Path(s"$dir/commits/$id"), false).close()
  }

  /** Create the warehouse from an ALREADY-CURATED corpus (e.g.
    * `CorpusPipeline.run` output): slice 0. Fails if the warehouse was
    * already initialized (slice 0 claimed). */
  def init(spark: SparkSession, dir: String, curated: DataFrame): Unit = {
    val id = claimSliceId(spark, dir, 0L)
    require(id == 0L, s"warehouse at $dir is already initialized")
    commitSlice(spark, dir, id, curated)
  }

  /** Ingest a new document slice: exact dedup (in-batch + vs the fp
    * index), near-dup rejection vs the signature index, split
    * assignment; commit survivors and their index rows as one atomic
    * slice. Returns the appended documents. */
  def ingest(spark: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
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
    if (!kept.isEmpty) {
      // the claim makes concurrent ingests allocate DISJOINT ids (they
      // race on the create, never on each other's files); note the
      // dedup read above is still single-writer-correct only — two
      // ingests that both read the indexes before either commits can
      // each admit the other's duplicates. Serialize ingests per
      // warehouse; the claims turn a violation into disjoint extra
      // slices rather than silent file clobbering.
      val id = claimSliceId(spark, dir, committed(spark, dir).max + 1L)
      commitSlice(spark, dir, id, kept)
    }
    kept
  }

  def docs(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "docs")

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "fp")

  def signatures(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "sigs")
}
