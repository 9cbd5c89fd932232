package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.VectorIndex
import graft.queries.DedupQueries

/** Streaming maintenance of a persisted IVF-PQ [[graft.VectorIndex]]:
  * a continuous embedding feed is coarse-assigned and PQ-encoded per
  * micro-batch and lands next to the batch-built codes, so the index
  * a query serves from is always base ∪ everything ingested so far —
  * the streaming half of the FAISS `add()` lifecycle, restated as
  * Structured Streaming over warehouse tables.
  *
  * Exactly-once across restarts WITHOUT a transaction log: each batch
  * writes its codes under `ivf_codes_stream/ingest_batch=<id>/list=…`
  * with DYNAMIC partition overwrite, so a replayed micro-batch
  * (foreachBatch reruns after a crash) overwrites its own partitions
  * instead of duplicating them — idempotence by layout, the same move
  * the warehouse commit protocol makes with slice claims. The coarse
  * list remains a partition column, so serve-time probe pruning works
  * identically on streamed codes (it prunes on the SECOND partition
  * level).
  *
  * At 100 TB/day: the encode is map-only per batch (broadcast books +
  * centroids), the write touches only the batch's own partitions, and
  * nothing ever reads or rewrites previously-ingested codes —
  * ingestion cost is O(batch), independent of index size. Periodic
  * compaction of small stream files into the base table is the same
  * consolidateNight() move the APDB store uses.
  */
object VectorIngest {

  /** Encode and land ONE micro-batch, idempotently (see object doc).
    * Callable directly for backfill; foreachBatch binds it for
    * streams. Codes are produced with the INDEX'S persisted codebooks
    * (a trained-books index would otherwise ADC-score streamed vectors
    * against the wrong quantizer — silently garbage distances); the
    * `books` override exists for tests that probe mismatch behavior. */
  def appendBatch(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long,
      books: Array[Array[Array[Long]]] = null): Unit = {
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(
      if (books != null) books else VectorIndex.loadIvfBooks(spark, dir))
    // coarse-assign under the index's CURRENT persisted centroids (a
    // rebalanceIvf between batches re-trains them; batches before/after
    // land consistently with how serving will probe)
    val cents = spark.sparkContext.broadcast(
      VectorIndex.loadIvfCentroids(spark, dir))
    batch.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (batchId, VectorIndex.nearestIn(cents.value, ed, 1).head, id,
          DedupQueries.pqEncode(ed.map(DedupQueries.scale1e6), cb.value))
      }.toDF("ingest_batch", "list", "cand_id", "code")
      .write.mode(SaveMode.Overwrite)
      // per-writer option, NOT a session-conf toggle: overwrite must
      // replace only THIS batch's partitions (idempotent replay), never
      // truncate the table
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "list")
      .parquet(s"$dir/ivf_codes_stream")
    // the maintenance payload rides along (same idempotent layout):
    // rebalanceIvf re-trains/re-assigns on true embeddings, never codes
    batch.select(lit(batchId).as("ingest_batch"),
        col("vec_id").as("cand_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$dir/ivf_vectors_stream")
  }

  /** Attach the feed to the index: every micro-batch appends via
    * [[appendBatch]]. The caller owns trigger/termination; restart
    * with the same checkpoint resumes exactly-once. */
  def ingest(spark: SparkSession, dir: String, stream: DataFrame,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendBatch(spark, dir, b.toDF(), id)
      }
      .start()
}
