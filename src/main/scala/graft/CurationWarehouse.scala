package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Persistent curated-corpus warehouse: the batch-incremental ingest
  * path ([[CorpusPipeline.incrementalIngestWithIndex]] /
  * [[CorpusPipeline.incrementalNearDup]]) made durable. Three parquet
  * tables under one directory:
  *
  *   - `docs` — the curated documents (with split assignment),
  *   - `fp`   — (doc_id, fp) canonical-content fingerprints,
  *   - `sigs` — (doc_id, sig) 64-long MinHash signatures.
  *
  * Each ingest reads ONLY the two small indexes (never warehouse text),
  * dedups the new slice against itself and the indexes, and appends the
  * survivors plus their index rows — the `obj_last` snapshot pattern
  * applied to corpus curation. At 100 TB the index tables are the
  * working set: ~48 bytes/doc of fingerprint and ~512 bytes/doc of
  * signature, bucketable by `fp`/`doc_id` for co-located anti-joins.
  * The daily-slice cost is proportional to the slice, not the corpus. */
object CurationWarehouse {

  private def fpOf(docs: DataFrame): DataFrame =
    CorpusPipeline.piiScrub(docs)
      .select(col("doc_id"),
        CorpusPipeline.fingerprintCol(col("text")).as("fp"))

  /** Create the warehouse from an ALREADY-CURATED corpus (e.g.
    * `CorpusPipeline.run` output): writes docs + both indexes. */
  def init(spark: SparkSession, dir: String, curated: DataFrame): Unit = {
    curated.write.mode("overwrite").parquet(s"$dir/docs")
    fpOf(curated).write.mode("overwrite").parquet(s"$dir/fp")
    DedupQueries.minhashSignatures(curated)
      .write.mode("overwrite").parquet(s"$dir/sigs")
  }

  /** Ingest a new document slice: exact dedup (in-batch + vs the fp
    * index), near-dup rejection vs the signature index, split
    * assignment; append survivors and their index rows. Returns the
    * appended documents. */
  def ingest(spark: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
    val fps = spark.read.parquet(s"$dir/fp").select("fp")
    val sigs = spark.read.parquet(s"$dir/sigs")
    val afterExact =
      CorpusPipeline.incrementalIngestWithIndex(fps, newDocs)
    val kept = CorpusPipeline.incrementalNearDup(sigs, afterExact)
      // materialize BEFORE appending to the tables the plan reads from:
      // a lazy plan would re-scan `sigs` mid-append (read-what-you-write)
      .localCheckpoint(true)
    kept.write.mode("append").parquet(s"$dir/docs")
    fpOf(kept).write.mode("append").parquet(s"$dir/fp")
    DedupQueries.minhashSignatures(kept)
      .write.mode("append").parquet(s"$dir/sigs")
    kept
  }

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/docs")
}
