package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, Tables, TextQueries}

/** End-to-end training-corpus curation — the extension operators
  * composed into one runnable pipeline, the shape large-scale data
  * curation actually takes:
  *
  *   1. language filter (x9 stopword-profile ID)
  *   2. quality threshold (x10 heuristics)
  *   3. repetition filter (x21 Gopher-style repeated-n-gram rule)
  *   4. PII scrub (x27 regex redaction — before the in-pipeline
  *      content hashing of stages 5-8; the id-keyed stages 9-10
  *      deliberately fingerprint the original table text, see
  *      [[piiScrub]])
  *   5. exact dedup (x1 canonical-form content hash)
  *   6. substring-level dedup (x31 signal, max-owner rule: drop docs
  *      whose every sliding window occurs in a larger-id doc — the
  *      containment-dup class — provably without content loss, see
  *      [[substringDedup]])
  *   7. line-level dedup (x26 C4 rule: a span that already occurred
  *      anywhere in the corpus is REMOVED from the document; docs that
  *      lose every span are dropped)
  *   8. duplicate-span excision (x60/x61 ExactSubstr rule: maximal
  *      shared runs ≥ SpanMin words cut from the later doc — catches
  *      arbitrary-length plagiarized passages the fixed-width stages
  *      6-7 quantize or miss)
  *   9. near-dup clustering (x7 pairs → x16 components), keep each
  *      cluster's minimum SURVIVING member
  *  10. semantic dedup (x30 embedding-LSH pairs → star-contraction
  *      components; vec_id keys to doc_id for the embedded subset of
  *      the corpus — docs without an embedding pass through), keep
  *      each cluster's minimum surviving member
  *  11. decontamination (x20 benchmark n-gram overlap)
  *  12. per-source stratified sample (x17 ordering key)
  *  13. train/val/test assignment (x28 hash split — an annotation, the
  *      one stage that widens the schema, so it runs last)
  *
  * Each filtering/rewriting stage is a DataFrame → DataFrame function
  * over the same schema, so stages compose and any prefix of the
  * pipeline is a valid corpus. Writes the curated corpus as parquet
  * plus one JSON stats line per stage (rows in/out) for auditability.
  *
  * Usage: runMain graft.CorpusPipeline <sfDir> <outDir> [lang] [minQuality] [samplePerSource]
  */
object CorpusPipeline {

  final case class StageStat(stage: String, rowsIn: Long, rowsOut: Long)

  def languageFilter(s: SparkSession, d: String, lang: String)(docs: DataFrame): DataFrame =
    docs.join(TextQueries.x9Langid(s, d)
      .where(col("detected_lang") === lang).select("doc_id"), "doc_id")

  def qualityFilter(s: SparkSession, d: String, minScore: Double)(docs: DataFrame): DataFrame =
    docs.join(TextQueries.x10QualityScore(s, d)
      .where(col("quality_score") >= minScore).select("doc_id"), "doc_id")

  /** Drop docs failing the Gopher-style repetition rule (x21). Anti-join
    * on the FAILING set: x21 emits no row for sub-2-word docs, and those
    * are by definition not repetitive — an inner join on the passing set
    * would silently drop them. */
  def repetitionFilter(s: SparkSession, d: String, maxFraction: Double)(docs: DataFrame): DataFrame =
    docs.join(TextQueries.x21Repetition(s, d)
      .where(col("rep_fraction") > maxFraction).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** Drop non-canonical members of embedding-similarity clusters: x30's
    * LSH-prefiltered cosine pairs (vec_id keys to doc_id) labeled by
    * skew-robust star contraction; each semantic cluster keeps its
    * minimum SURVIVING member. COVERAGE = the embedded subset of the
    * corpus: at SFs where embeddings are fewer than documents (e.g.
    * sf0.1: 2 000 vectors vs 5 000 docs), docs without an embedding are
    * never semantic-dedup candidates and pass through unchanged — the
    * usual production situation where only part of a corpus is
    * embedded. Id-keyed like [[nearDupCanonical]]: similarity is
    * computed over the full embedding collection and joined by id, so
    * text rewrites upstream don't change membership (an embedding
    * describes the original document). */
  def semanticDedup(s: SparkSession, d: String)(docs: DataFrame): DataFrame =
    dropNonCanonicalSurvivors(docs,
      graft.operators.ConnectedComponents.starContract(s,
          DedupQueries.x30NeardupLsh(s, d).select("vec_a", "vec_b"))
        .select(col("node").as("doc_id"), col("root").as("cluster_id")))

  /** Keep each cluster's minimum SURVIVING member. The naive rule
    * (drop every node ≠ cluster root) loses content when the root was
    * already removed by an earlier stage — the cluster would then keep
    * NO representative. Re-canonicalizing among the members still
    * present guarantees every cluster that reaches this stage keeps
    * exactly one doc. `labels`: (doc_id, cluster_id). */
  private def dropNonCanonicalSurvivors(docs: DataFrame,
      labels: DataFrame): DataFrame = {
    val surviving = labels.join(docs.select("doc_id"), "doc_id")
    val keep = surviving.groupBy("cluster_id")
      .agg(min(col("doc_id")).as("keep_id"))
    val drop = surviving.join(keep, "cluster_id")
      .where(col("doc_id") =!= col("keep_id"))
      .select("doc_id")
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Drop docs overlapping the held-out benchmark set (x20) — AND the
    * benchmark stand-in docs themselves (doc_id % DecontamEvery == 0):
    * the eval suite must never flow into the training corpus, which is
    * the leakage decontamination exists to prevent.
    *
    * NOTE: composing this stage RUNS Spark jobs immediately (the bench
    * gram count + bloom build inside x34 — the probe needs the filter
    * as a foldable literal). Pipeline plans containing this stage are
    * therefore not free to construct; see x34's doc. */
  def decontaminate(s: SparkSession, d: String)(docs: DataFrame): DataFrame =
    // the bloom-prefiltered variant (x34): same flagged set as x20 by
    // construction, but the corpus stream is pruned by a codegen'd
    // might_contain probe before any join — the shape that holds when
    // the corpus is 100 TB and the bench gram set is millions of rows
    docs.join(
        DedupQueries.x34DecontaminateBloom(s, d).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
      .where(col("doc_id") % DedupQueries.DecontamEvery =!= 0)

  /** Redact emails/phone numbers in place (x27's shared scrub
    * expression). Runs before the in-pipeline content hashing
    * (exact_dedup fingerprints, substring_dedup windows, line_dedup
    * spans) so those see the scrubbed text. The id-keyed stages (near_dup_canonical,
    * decontaminate) intentionally fingerprint the ORIGINAL table text:
    * near-dup membership must not be created by shared <EMAIL>/<PHONE>
    * placeholders, and contamination is overlap with what the document
    * originally said. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.withColumn("text", TextQueries.piiScrubCol(col("text")))

  /** Substring-level dedup over the CURRENT corpus (the x31 signal,
    * applied): drop every doc whose EVERY sliding window also occurs
    * in some LARGER-id doc — the containment-dup case exact dedup
    * can't see (one doc verbatim inside another).
    *
    * The max-owner rule is what makes the stage content-safe with no
    * ordering prerequisite: if doc D is dropped, each of its windows
    * occurs in a strictly larger doc; if that doc was dropped too, the
    * window occurs in a still-larger one — ids are finite, so every
    * window of every dropped doc survives in a kept doc. This handles
    * the cases the naive "occurs in any OTHER doc" rule destroys:
    * byte-identical twins (the larger-id twin survives), mutual
    * containment (P×3 vs P×2 — the larger-id member survives), and a
    * unique internally-periodic doc (its own windows have max owner =
    * itself → kept). The trade: a dup whose container has a SMALLER id
    * is conservatively kept (false keep, never false drop).
    * [[exactDedup]] still runs first as the cheaper pass. The join key
    * carries the window TEXT alongside its 60-bit hash — the hash
    * bounds shuffle fan-out, the text makes a hash collision harmless
    * (at 10^12 windows, 2^60 collisions are expected; they must not
    * delete unrelated content). Docs shorter than one window are
    * kept. */
  def substringDedup(docs: DataFrame): DataFrame = {
    val docWins = TextQueries.slidingWindows(docs)
      .select("doc_id", "win_h", "win").distinct()
    val owners = docWins.groupBy("win_h", "win")
      .agg(max(col("doc_id")).as("max_owner"))
    val covered = docWins.join(owners, Seq("win_h", "win"))
      .groupBy("doc_id")
      .agg(min(when(col("max_owner") > col("doc_id"), 1L).otherwise(0L))
        .as("all_later"))
      .where(col("all_later") === 1L)
      .select("doc_id")
    docs.join(covered, Seq("doc_id"), "left_anti")
  }

  /** C4-style line-level dedup over the CURRENT corpus (x26 semantics,
    * applied): every fixed-width span whose content already occurred at
    * a smaller (doc_id, position) is removed from the document, the
    * text is rebuilt from the kept spans, and a doc that loses all its
    * spans is dropped. One shuffle keyed by (60-bit span hash, span
    * text) — the hash bounds shuffle fan-out, the text makes a hash
    * collision harmless (a destructive stage must never delete on hash
    * equality alone) — then one by doc_id for the rebuild. Span
    * segmentation is shared with x26 ([[TextQueries.segmentSpans]]). */
  /** Per-source boilerplate strip (x81's detection, applied): spans
    * recurring in ≥ [[graft.queries.MiningQueries.BoilerMinDocs]]
    * distinct docs of the SAME source are template chrome — EVERY
    * occurrence is removed (unlike [[lineDedup]]/[[spanExcise]], whose
    * keep-first policy is for genuine content: a footer's first copy
    * is just as worthless as its thousandth). Text is rebuilt from the
    * surviving spans; an all-boilerplate doc drops out. Runs AFTER
    * exact_dedup so replicated corpora (the soak's twin stress) don't
    * read their own copies as per-source templates.
    *
    * Scale shape: x81's two (source, line_h)-keyed shuffles plus the
    * per-doc rebuild aggregation — linear, no pair join. */
  def boilerplateStrip(docs: DataFrame): DataFrame = {
    val segs = TextQueries.segmentSpans(docs, carry = Seq("source"))
    val boiler = segs
      .groupBy(col("source"), col("line_h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= graft.queries.MiningQueries.BoilerMinDocs)
      .select(col("source"), col("line_h"), lit(true).as("_boiler"))
    val rebuilt = segs.join(boiler, Seq("source", "line_h"), "left")
      .where(col("_boiler").isNull)
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(seg, line))), x -> x.line), ' ')")
        .as("_new_text"))
    docs.join(rebuilt, "doc_id") // inner: all-boilerplate docs drop out
      .withColumn("text", col("_new_text")).drop("_new_text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def lineDedup(docs: DataFrame): DataFrame = {
    val segs = TextQueries.segmentSpans(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("line_h"), col("line"))
      .orderBy(col("doc_id"), col("seg"))
    val rebuilt = segs.withColumn("occ", row_number().over(w))
      .where(col("occ") === 1)
      .groupBy("doc_id")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(seg, line))), x -> x.line), ' ')")
        .as("_new_text"))
    docs.join(rebuilt, "doc_id") // inner: fully-duplicated docs drop out
      .withColumn("text", col("_new_text")).drop("_new_text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Cross-document duplicate-span excision over the CURRENT corpus
    * (x60/x61's kernel, applied): every exactly-shared span ≥
    * [[DedupQueries.SpanMin]] words is removed from the LATER document
    * (keep-first — Lee et al.'s ExactSubstr policy), text rebuilt from
    * the kept words, a doc excised to nothing drops out. Distinct from
    * [[substringDedup]]/[[lineDedup]] (fixed-width windows, whole-doc
    * or per-line granularity): this one finds MAXIMAL shared runs of
    * any length on (pair, diagonal) anchors, so a 40-word plagiarized
    * passage inside an otherwise-unique doc is cut exactly, not
    * window-quantized. Span relation is pair-bounded and checkpointed;
    * untouched docs ride through one left join. */
  def spanExcise(docs: DataFrame): DataFrame = {
    val spans = DedupQueries.spanRunsOf(docs)
      .where(col("span_words") >= DedupQueries.SpanMin)
      .select(col("doc_b").as("doc_id"),
        (col("start_a") - col("diag")).as("start"), col("span_words"))
      .localCheckpoint(true)
    val covered = spans.select(col("doc_id"),
        explode(expr("sequence(start, start + span_words - 1)")).as("pos"))
      .distinct()
    val affected = spans.select(col("doc_id")).distinct()
      .withColumn("_aff", lit(true))
    val words = docs.join(affected.drop("_aff"), "doc_id")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "word")
    val cleaned = words.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(pos, word))), x -> x.word), ' ')")
        .as("_clean"))
    docs.join(cleaned, Seq("doc_id"), "left")
      .join(affected, Seq("doc_id"), "left")
      // affected + no kept words = excised to nothing -> drop the doc
      .where(!coalesce(col("_aff"), lit(false)) || col("_clean").isNotNull)
      .withColumn("text",
        when(coalesce(col("_aff"), lit(false)), col("_clean"))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_clean", "_aff")
  }

  /** x28's deterministic hash split as a final annotation column
    * (shared expressions — thresholds/salt live in TextQueries). */
  def splitAssign(docs: DataFrame): DataFrame =
    docs.withColumn("split", TextQueries.splitNameCol(TextQueries.splitBucketCol))

  def exactDedup(docs: DataFrame): DataFrame = {
    // MUST stay the same expression as fingerprintCol: the warehouse fp
    // index and the incremental invariant both depend on batch and
    // incremental paths hashing identically
    val canonical = docs
      .groupBy(fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(canonical, "doc_id")
  }

  /** Canonical-content fingerprint column (the exactDedup key). */
  def fingerprintCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(lower(c), "[^a-z0-9]", ""))

  /** Batch-incremental ingest: curate a NEW document batch against an
    * already-curated warehouse WITHOUT touching the warehouse — the
    * production path when a 100 TB corpus grows by a daily slice. The
    * new batch is PII-scrubbed, exact-deduped within itself (lowest id
    * per fingerprint, same rule as [[exactDedup]]), anti-joined against
    * the warehouse's fingerprints, and split-assigned (x28's pure hash,
    * so a doc gets the same split whether it arrived via full batch,
    * stream, or increment). Only the increment is scanned twice and the
    * warehouse ONCE for its fingerprints — at scale that one pass reads
    * a maintained fingerprint index (fp parquet bucketed by fp, the
    * obj_last pattern), never the warehouse text. [[IngestDedup]] is
    * the streaming counterpart; the invariant both share: incremental
    * result == batch pipeline on the union, restricted to new ids
    * (CorpusPipelineSpec pins it). */
  def incrementalIngest(warehouse: DataFrame, newDocs: DataFrame): DataFrame =
    incrementalIngestWithIndex(
      piiScrub(warehouse).select(fingerprintCol(col("text")).as("fp")).distinct(),
      newDocs)

  /** Same, against a MAINTAINED fingerprint index (one `fp` column) —
    * the form that never touches warehouse text. */
  def incrementalIngestWithIndex(warehouseFps: DataFrame,
      newDocs: DataFrame): DataFrame = {
    val scrubbed = piiScrub(newDocs)
    val inBatch = scrubbed
      .groupBy(fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    val fresh = inBatch.join(warehouseFps, Seq("fp"), "left_anti")
      .select("doc_id")
    splitAssign(scrubbed.join(fresh, "doc_id"))
  }

  /** Near-dup increment: drop new docs whose MinHash signature agrees
    * ≥ 0.5 (x2's verification rule) with ANY warehouse document. The
    * warehouse enters as its SIGNATURE table — 64 longs per doc,
    * maintained incrementally exactly like the fingerprint index, so the
    * warehouse text is never re-read. Candidates come from the LSH
    * band-bucket join (new-side bands × warehouse bands — shuffle by
    * (band, bucket), never all-pairs), then full-signature verification.
    * Docs under 3 words have no shingles/signature and pass through
    * (same contract as x2). Compose after [[incrementalIngest]]'s exact
    * pass: exact dups are gone, this catches the near misses. */
  def incrementalNearDup(warehouseSigs: DataFrame, newDocs: DataFrame): DataFrame = {
    val newSigs = DedupQueries.minhashSignatures(newDocs).localCheckpoint(true)
    val newBands = DedupQueries.bandBuckets(newSigs)
    // vs-warehouse: any agreeing warehouse doc disqualifies the new doc
    val spark = newDocs.sparkSession
    // skew-guarded (x2's guard): a hot warehouse bucket — boilerplate
    // that accumulated over many slices — would otherwise square inside
    // one reducer on every future ingest
    val vsWarehouse = DedupQueries.bucketJoin(spark,
        DedupQueries.bandBuckets(warehouseSigs)
          .select(col("band"), col("bucket"), col("doc_id").as("w_id")),
        newBands, Seq("band", "bucket"))
      .select(col("doc_id"), col("w_id"))
      .dropDuplicates("doc_id", "w_id")
      .join(newSigs.select(col("doc_id"), col("sig").as("sig_a")), "doc_id")
      .join(warehouseSigs.select(col("doc_id").as("w_id"),
        col("sig").as("sig_b")), "w_id")
      .where(DedupQueries.sigAgreement(col("sig_a"), col("sig_b")) >= 0.5)
      .select("doc_id")
    // WITHIN-slice: a near-dup pair inside the same ingest slice would
    // otherwise both pass (neither is in the warehouse yet) and both
    // persist forever. Greedy min-id rule: drop a doc iff an agreeing
    // SMALLER-id slice-mate exists — matches the batch canonical-keeps-
    // min rule pairwise (a chain a~b~c with a!~c keeps a AND c where
    // batch components keep only a: the conservative false-keep, never
    // a false drop).
    val inSlice = DedupQueries.bucketSelfJoin(spark, newBands,
        newBands.select(col("band"), col("bucket"),
          col("doc_id").as("doc_b")), Seq("band", "bucket"))
      .where(col("doc_b") < col("doc_id"))
      .select(col("doc_id"), col("doc_b"))
      .dropDuplicates("doc_id", "doc_b")
      .join(newSigs.select(col("doc_id"), col("sig").as("sig_a")), "doc_id")
      .join(newSigs.select(col("doc_id").as("doc_b"),
        col("sig").as("sig_b")), "doc_b")
      .where(DedupQueries.sigAgreement(col("sig_a"), col("sig_b")) >= 0.5)
      .select("doc_id")
    newDocs.join(vsWarehouse.union(inSlice).distinct(),
      Seq("doc_id"), "left_anti")
  }

  def nearDupCanonical(s: SparkSession, d: String)(docs: DataFrame): DataFrame =
    // x16 clusters over the full corpus; keep each cluster's minimum
    // member still present (see dropNonCanonicalSurvivors — the global
    // canonical may have been dropped by an earlier stage)
    dropNonCanonicalSurvivors(docs,
      DedupQueries.x16DupClusters(s, d).select("doc_id", "cluster_id"))

  def stratifiedSample(perSource: Int)(docs: DataFrame): DataFrame = {
    val key = expr(graft.queries.PortableHash.hex60(
      "concat('x17:', CAST(doc_id AS STRING))"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(key.asc, col("doc_id"))
    docs.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= perSource).drop("_rk")
  }

  /** The pipeline's stage list in run order — exposed so the soak can
    * time each stage over an arbitrary starting corpus. */
  def stages(s: SparkSession, d: String, lang: String = "en",
      minQuality: Double = 0.25,
      samplePerSource: Int = 100): Seq[(String, DataFrame => DataFrame)] =
    Seq(
      "language_filter" -> languageFilter(s, d, lang) _,
      "quality_filter" -> qualityFilter(s, d, minQuality) _,
      "repetition_filter" -> repetitionFilter(s, d, maxFraction = 0.5) _,
      "pii_scrub" -> (piiScrub _),
      "exact_dedup" -> (exactDedup _),
      "boilerplate_strip" -> (boilerplateStrip _),
      "substring_dedup" -> (substringDedup _),
      "line_dedup" -> (lineDedup _),
      "span_excise" -> (spanExcise _),
      "near_dup_canonical" -> nearDupCanonical(s, d) _,
      "semantic_dedup" -> semanticDedup(s, d) _,
      "decontaminate" -> decontaminate(s, d) _,
      "stratified_sample" -> stratifiedSample(samplePerSource) _,
      "split_assign" -> (splitAssign _),
      "shuffle_shard" -> (shuffleShard _))

  /** Stage 14 — publish shuffle: the x78 seeded shuffle-then-shard on
    * whatever survived curation. Deterministic (portable hash of the
    * salted doc id), so republish ≡ same layout; a reshuffle is a salt
    * change. Widens the schema (shard, shard_pos) and never drops a
    * row, so it runs last, after split_assign. */
  private[graft] def shuffleShard(c: DataFrame): DataFrame =
    graft.queries.MiningQueries.shuffleShardCols(c)

  /** Post-pipeline publication (round 8): the curated corpus does not
    * end as parquet alone — it ships as SERVING artifacts. Builds the
    * persisted BM25 [[TextIndex]] over the curated text and the
    * IVF-PQ [[VectorIndex]] over the curated documents' embeddings
    * (vec_id ≡ doc_id, the same identification the semantic-dedup
    * stage relies on), so retrieval serves exactly what curation kept
    * — the index can never drift from the published corpus because it
    * is built from the same frame in the same job. Returns the
    * artifact row counts. */
  def publishIndexes(s: SparkSession, d: String, curated: DataFrame,
      outDir: String): Map[String, Long] = {
    TextIndex.build(s, s"$outDir/text_index",
      curated.select(col("doc_id"), col("text")))
    val emb = graft.queries.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .join(curated.select(col("doc_id").as("vec_id")), "vec_id")
      .localCheckpoint(true) // buildIvfPq consumes it twice (codes + vectors)
    VectorIndex.buildIvfPq(s, s"$outDir/vector_index", emb)
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(emb)
    // counts come from the metas the builders just wrote — no extra jobs
    def grab(path: String, key: String): Long =
      (s""""$key":(\\d+)""").r
        .findFirstMatchIn(EstateFs.readString(path)).get.group(1).toLong
    Map(
      "text_docs" -> grab(s"$outDir/text_index/meta.json", "n_docs"),
      "vectors" -> grab(s"$outDir/vector_index/meta_ivf.json", "vectors"))
  }

  /** Run the pipeline; returns (curated corpus, per-stage stats). */
  def run(s: SparkSession, d: String, lang: String = "en",
      minQuality: Double = 0.25, samplePerSource: Int = 100): (DataFrame, Seq[StageStat]) = {
    var corpus = Tables.documents(s, d)
    val stats = scala.collection.mutable.ArrayBuffer.empty[StageStat]
    // stage outputs rotate through a Loop: each stage reads only its
    // predecessor, so state older than keep=2 is freed as the fold
    // advances (the curated result and its predecessor stay alive for
    // the publish step after the loop)
    val loop = new operators.Checkpoints.Loop(s, keep = 2)
    stages(s, d, lang, minQuality, samplePerSource).foreach { case (name, fn) =>
      val in = corpus.count()
      corpus = loop.stable(fn(corpus))
      stats += StageStat(name, in, corpus.count())
    }
    (corpus, stats.toSeq)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusPipeline <sfDir> <outDir> ...")
    val (sfDir, outDir) = (args(0), args(1))
    val lang = if (args.length > 2) args(2) else "en"
    val minQ = if (args.length > 3) args(3).toDouble else 0.25
    val perSource = if (args.length > 4) args(4).toInt else 100
    val spark = MasterConf(SparkSession.builder(),
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (curated, stats) = run(spark, sfDir, lang, minQ, perSource)
    curated.write.mode("overwrite").parquet(s"$outDir/corpus")
    stats.foreach(st => println(
      s"""{"stage":"${st.stage}","rows_in":${st.rowsIn},"rows_out":${st.rowsOut}}"""))
    val published = publishIndexes(spark, sfDir, curated, outDir)
    println(s"""{"stage":"publish_indexes","text_docs":${
      published("text_docs")},"vectors":${published("vectors")}}""")
    spark.stop()
  }
}
