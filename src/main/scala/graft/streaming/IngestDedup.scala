package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest deduplication for a continuous document feed — the
  * streaming counterpart of the batch x1/x12 operators: canonical-form
  * fingerprint (lowercased alphanumerics, md5) plus stateful
  * drop-duplicates bounded by an event-time watermark, so duplicate
  * documents arriving within the tolerance window are emitted once and
  * dedup state is evicted as the watermark advances (state never grows
  * unboundedly — the property that matters when the feed is 100 TB).
  *
  * Input schema: (doc_id long, text string, ingest_time timestamp).
  */
object IngestDedup {

  /** Canonical-content fingerprint (same definition as x12). */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Deduplicated stream: first arrival of each fingerprint within the
    * watermark window survives. Works on batch frames too (falls back
    * to plain dropDuplicates semantics for tests/backfill). */
  def dedupStream(docs: DataFrame, disorderTolerance: String = "10 minutes"): DataFrame = {
    val withFp = docs.withColumn("fingerprint", fingerprint(col("text")))
    if (docs.isStreaming)
      withFp
        .withWatermark("ingest_time", disorderTolerance)
        .dropDuplicatesWithinWatermark("fingerprint")
    else
      withFp.dropDuplicates("fingerprint")
  }

  /** Streaming curation: the batch CorpusPipeline's stateless stages
    * (PII scrub, train/val/test assignment) composed around the one
    * stateful stage (watermark-bounded fingerprint dedup). Scrubbing
    * happens BEFORE fingerprinting — a stream must dedup on what it
    * will emit — and the split is x28's pure hash of doc_id, so a doc
    * lands in the same split whether it arrived via batch or stream.
    * The stateless stages add no state and no shuffle; the dedup state
    * stays watermark-bounded exactly as in [[dedupStream]]. */
  def curateStream(docs: DataFrame, disorderTolerance: String = "10 minutes"): DataFrame =
    graft.CorpusPipeline.splitAssign(
      dedupStream(graft.CorpusPipeline.piiScrub(docs), disorderTolerance))

  /** Streaming length profile: per event-time window, the document-size
    * distribution as a capacity-bounded mergeable histogram
    * ([[graft.plans.StreamingHistogramAgg]] — the same aggregate behind
    * the batch x37 quantile key). The monitoring companion of
    * [[trendingTerms]]: drift in the corpus's length distribution shows
    * up window by window with constant state per window. */
  def lengthProfile(docs: DataFrame, windowLen: String = "10 minutes",
      disorderTolerance: String = "10 minutes",
      capacity: Int = 256): DataFrame =
    docs
      .withWatermark("ingest_time", disorderTolerance)
      .groupBy(window(col("ingest_time"), windowLen))
      .agg(graft.plans.SketchFunctions.streamingHistogram(
        length(col("text")), capacity).as("length_hist"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("length_hist"))

  /** Streaming heavy-hitters: per event-time window, the top terms of
    * the document feed via the mergeable SpaceSaving aggregate
    * ([[graft.plans.SpaceSavingAgg]] — the same native
    * `TypedImperativeAggregate` the batch x35 key uses). The streaming
    * state per window is ONE bounded summary (≤ `capacity` entries), not
    * a per-term count table: vocabulary growth cannot grow the state
    * store, and the watermark evicts whole windows — the two bounds a
    * 100 TB/day feed needs. Works on batch frames too (same window
    * aggregation without state). */
  def trendingTerms(docs: DataFrame, windowLen: String = "10 minutes",
      disorderTolerance: String = "10 minutes",
      capacity: Int = 1024): DataFrame = {
    val terms = docs
      .withWatermark("ingest_time", disorderTolerance)
      .select(col("ingest_time"),
        explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
    terms
      .groupBy(window(col("ingest_time"), windowLen))
      .agg(graft.plans.SketchFunctions.spaceSavingTopK(
        col("term"), capacity).as("top_terms"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("top_terms"))
  }
}
