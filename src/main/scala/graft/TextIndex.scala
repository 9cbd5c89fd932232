package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{PortableHash, TextQueries}

/** Persisted BM25 lexical index — the build-once / serve-many form of
  * the x51 retrieval key, and the lexical sibling of [[VectorIndex]]
  * (the lifecycle Lucene's segment files give a single node, restated
  * as warehouse tables).
  *
  * Layout under `dir`:
  *  - `postings/` — (doc_id, term, tf) rows WRITTEN PARTITIONED BY
  *    `bucket` = hash(term) % [[TermBuckets]]. The partitioning is the
  *    point: a query batch touches only its terms' buckets, so the
  *    serve-time scan prunes every other partition's files — the
  *    lexical analog of the IVF-PQ list prune (and of the engine's
  *    pixel-bucket prune on the spatial side).
  *  - `lengths/`  — (doc_id, dl, fp) document lengths for the BM25
  *    length normalization, plus `fp` = xxhash64 of the raw text: the
  *    CONTENT fingerprint the replay-after-fold detection compares, so
  *    only a byte-identical redelivery no-ops while an edited document
  *    re-appended under a reused doc_id still refuses loudly even when
  *    the edit preserves word count (ADVICE r11 — dl containment alone
  *    was a silent-data-loss hole). Indexes built before round 12 lack
  *    the column; their rows read as fp-null and the detection falls
  *    back to dl containment for exactly those rows.
  *  - `meta.json` — (n_docs, sum_dl, buckets): the corpus scalars are
  *    computed ONCE at build time; serving attaches them as a literal
  *    one-row frame instead of re-aggregating the corpus per query
  *    batch (x51's inline form must re-derive them because the registry
  *    contract is one self-contained DataFrame per key).
  *
  * All control-plane IO (meta, markers, batch enumeration, staged-table
  * swaps) goes through [[EstateFs]] — the Hadoop FileSystem layer — so
  * the index hosts on HDFS/S3 exactly like its parquet data plane
  * (round 11; the java.nio form was local-POSIX-only).
  *
  * At 100 TB the postings table is a bucketed warehouse table; a serve
  * touches `|query terms|` buckets of it plus the lengths of matching
  * docs, and the tokenize+aggregate cost of building postings is paid
  * once instead of per query batch. Scoring is
  * [[TextQueries.bm25Score]] — the SAME kernel the inline key runs, so
  * served rankings agree with x51 by construction.
  */
object TextIndex {

  /** Postings partition count. 64 keeps per-bucket file counts sane at
    * small SF while still pruning 98% of a uniform term distribution;
    * a 100 TB deployment would raise it with corpus vocabulary. */
  val TermBuckets = 64

  /** Default result depth for the CLI (mirrors x51's). */
  val DefaultK: Int = TextQueries.Bm25TopK

  private def bucketCol = expr(PortableHash.hex60("term")) % TermBuckets

  /** Build the index from (doc_id, text) rows: ONE tokenize pass feeds
    * the postings aggregate; lengths and the corpus scalars come from a
    * second narrow projection of the same input. Tokenization is x51's
    * exactly (whitespace split, no normalization) — the index must
    * reproduce the inline key's rankings bit-for-bit. */
  def build(spark: SparkSession, dir: String, docs: DataFrame): Unit = {
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      xxhash64(col("text")).as("fp"))
      .localCheckpoint(true) // consumed by the write AND the stats agg
    // fail BEFORE any table is written: an empty corpus would otherwise
    // leave a half-built index (postings but no meta) and a null Σdl
    val statsRow = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .collect()(0)
    require(statsRow.getLong(0) > 0,
      s"TextIndex.build: input has no documents — refusing to build $dir")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketCol)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"$dir/postings")
    dl.write.mode(SaveMode.Overwrite).parquet(s"$dir/lengths")
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(dl)
    EstateFs.writeStringAtomic(s"$dir/meta.json",
      s"""{"n_docs":${statsRow.getLong(0)},"sum_dl":${statsRow.getLong(1)},"buckets":$TermBuckets}""")
    // a rebuild over a previously-compacted dir resets pv to 0 — drop
    // the now-unreferenced versioned tables
    dropStaleTables(dir, 0)
  }

  /** Current version of the BASE postings/lengths tables, recorded in
    * meta.json as `pv` (absent/0 = the as-built unversioned layout).
    * [[compact]] stages its folded tables under `postings_v{pv+1}` /
    * `lengths_v{pv+1}` and FLIPS `pv` in one atomic meta write — the
    * whole consolidation lifecycle is RENAME-FREE (round 11), so it
    * runs on object stores exactly as on HDFS/local: markers and meta
    * are [[EstateFs.writeStringAtomic]] (posture-aware), staged tables
    * are plain parquet writes to fresh paths, and old versions are
    * deleted after the flip. */
  private def pvOf(dir: String): Int =
    """"pv":(\d+)""".r
      .findFirstMatchIn(EstateFs.readString(s"$dir/meta.json"))
      .map(_.group(1).toInt).getOrElse(0)

  /** Resolved (postings, lengths) base-table paths at the CURRENT
    * version — every base read goes through this. */
  private[graft] def tablePaths(dir: String): (String, String) = {
    val v = pvOf(dir)
    if (v == 0) (s"$dir/postings", s"$dir/lengths")
    else (s"$dir/postings_v$v", s"$dir/lengths_v$v")
  }

  /** Drop every base-table dir that is not the `keepPv` version —
    * idempotent post-flip cleanup (and build's stale-version sweep). */
  private def dropStaleTables(dir: String, keepPv: Int): Unit = {
    val keep = Set(
      if (keepPv == 0) "postings" else s"postings_v$keepPv",
      if (keepPv == 0) "lengths" else s"lengths_v$keepPv")
    EstateFs.listNames(dir).foreach { nme =>
      val isBase = nme == "postings" || nme == "lengths" ||
        nme.matches("postings_v\\d+") || nme.matches("lengths_v\\d+")
      if (isBase && !keep(nme)) EstateFs.deleteRecursive(s"$dir/$nme")
    }
  }

  private def meta(dir: String): (Long, Long, Int) = {
    val txt = EstateFs.readString(s"$dir/meta.json")
    def grab(k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(txt).getOrElse(
        throw new IllegalStateException(
          s"$dir/meta.json has no \"$k\" — not a TextIndex dir")
      ).group(1).toLong
    (grab("n_docs"), grab("sum_dl"), grab("buckets").toInt)
  }

  // -- incremental update (VERDICT r7 #5) --------------------------------

  /** Batches whose delta write COMMITTED (marker file present). A batch
    * killed mid-write leaves partitions but no marker; reads filter to
    * committed ids, so a half-written batch is invisible until its
    * replay overwrites the partitions and drops the marker — the same
    * exactly-once-by-layout move [[graft.streaming.VectorIngest]]
    * makes, plus a marker because BM25 also needs the batch's SCALARS
    * (n_docs/Σdl) to land atomically with its rows.
    *
    * Tiering (negative ids): [[mergeDeltas]] writes a MERGED segment
    * under a reserved id < 0 whose marker lists the batch ids it
    * folded. The effective committed set excludes every folded id, so
    * the instant the merged marker lands (one atomic write) readers
    * switch from the small batches to the merged segment — the
    * leftover small-batch dirs/markers are dead weight that
    * [[cleanupFoldedDeltas]] removes idempotently. */
  private[graft] def committedBatches(dir: String): Seq[Long] = {
    val all = allMarkerIds(dir)
    val folded = all.filter(_ < 0).flatMap(foldedList(dir, _)).toSet
    all.filterNot(folded).sorted
  }

  private def allMarkerIds(dir: String): Seq[Long] =
    EstateFs.listNames(dir)
      .collect { case s if s.startsWith("meta_delta_batch_") && s.endsWith(".json") =>
        s.stripPrefix("meta_delta_batch_").stripSuffix(".json").toLong
      }

  /** The batch ids a merged segment's marker records as folded (empty
    * for plain append batches, whose markers carry no `folded` key; a
    * marker deleted since the listing — cleanup of a nested merge
    * removes inner markers mid-iteration — reads as empty too). */
  private def foldedList(dir: String, batch: Long): Seq[Long] = {
    val p = s"$dir/meta_delta_batch_$batch.json"
    if (!EstateFs.exists(p)) return Nil
    val txt = EstateFs.readString(p)
    """"folded":\[([0-9,\-]*)\]""".r.findFirstMatchIn(txt)
      .map(_.group(1).split(",").filter(_.nonEmpty).map(_.toLong).toSeq)
      .getOrElse(Nil)
  }

  private def deltaMeta(dir: String, batch: Long): (Long, Long) = {
    val txt = EstateFs.readString(s"$dir/meta_delta_batch_$batch.json")
    def grab(k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    (grab("n_docs"), grab("sum_dl"))
  }

  /** Lengths frame with a guaranteed `fp` column: pre-round-12 tables
    * lack the content fingerprint, so their rows read as fp-null and
    * the replay detection falls back to dl containment for them. */
  private def withFpNullable(df: DataFrame): DataFrame =
    if (df.columns.contains("fp")) df
    else df.withColumn("fp", lit(null).cast("long"))

  /** `lengths_delta` read with a PINNED schema (ADVICE r12): with the
    * default `mergeSchema=false` Spark infers the table schema from
    * one file's footer, so a directory mixing pre-r12 partitions (no
    * `fp`) with post-r12 ones could come back without `fp` at all —
    * nulling real fingerprints and silently degrading replay detection
    * back to the dl-containment hole `fp` closed. Pinning the schema
    * keeps `fp` (nullable — pre-r12 rows genuinely lack it) on every
    * read; `ingest_batch` resolves from the partition directory names
    * as usual. */
  private def readLengthsDelta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.read.schema(StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("dl", LongType, nullable = false),
        StructField("fp", LongType, nullable = true),
        StructField("ingest_batch", LongType, nullable = false))))
      .parquet(s"$dir/lengths_delta")
  }

  /** All committed doc lengths (doc_id, dl — serving needs no fp):
    * base plus delta batches (optionally excluding one batch — the
    * collision check must not see the batch's OWN half-written
    * partitions during a replay). */
  private def lengthsAll(spark: SparkSession, dir: String,
      excludeBatch: Option[Long] = None): DataFrame = {
    val base = spark.read.parquet(tablePaths(dir)._2)
      .select(col("doc_id"), col("dl"))
    val batches = committedBatches(dir).filterNot(excludeBatch.contains)
    if (batches.isEmpty) base
    else base.unionByName(
      readLengthsDelta(spark, dir)
        .where(col("ingest_batch").isin(batches: _*))
        .select(col("doc_id"), col("dl")))
  }

  /** Append a document batch to an EXISTING index without rebuilding:
    * the batch's postings land under
    * `postings_delta/ingest_batch=<id>/bucket=…` with dynamic partition
    * overwrite (replay-idempotent; bucket stays a partition level, so
    * serve-time term pruning works on deltas exactly as on the base),
    * lengths land beside them, and the batch's corpus scalars commit
    * LAST as the batch's marker file. Refuses doc_id collisions with
    * already-indexed docs — re-indexing a changed document is a rebuild
    * decision, not a silent double-count — EXCEPT the one collision a
    * healthy stream produces: a replay of a batch that committed and
    * was then FOLDED by [[mergeDeltas]]/[[compact]] before the stream
    * checkpoint advanced. Its docs then live in the base or a merged
    * segment, so the replay is detected by full (doc_id, dl)
    * containment with no clashing doc owned by a LIVE positive batch,
    * and no-ops — the rows are already indexed, and refusing would
    * turn exactly-once replay into a permanent crash loop (ADVICE
    * r10). A collision with a live batch's docs still refuses. */
  def append(spark: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit = {
    require(EstateFs.exists(s"$dir/meta.json"),
      s"TextIndex.append: $dir has no meta.json — build the base index first")
    requireNoPendingCompact(dir, "append")
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      xxhash64(col("text")).as("fp"))
      .localCheckpoint(true)
    // finally-released: the refusal paths below must not strand the
    // eager checkpoint's blocks (a crash-looping stream retrying a
    // clashing batch would otherwise accumulate them forever)
    val statsRow =
      try {
        val row = dl
          .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
          .collect()(0)
        require(row.getLong(0) > 0,
          s"TextIndex.append: batch $batchId has no documents")
        // indexed lengths WITH provenance: base rows tagged with a
        // sentinel, delta rows with their batch id — the replay
        // detection below needs to know WHERE a clashing doc lives
        val commits = committedBatches(dir).filterNot(_ == batchId)
        val baseRaw = spark.read.parquet(tablePaths(dir)._2)
        val baseL = withFpNullable(baseRaw)
          .select(col("doc_id"), col("dl"), col("fp"),
            lit(Long.MinValue).as("src_batch"))
        val indexed =
          if (commits.isEmpty) baseL
          else baseL.unionByName {
            readLengthsDelta(spark, dir)
              .where(col("ingest_batch").isin(commits: _*))
              .select(col("doc_id"), col("dl"), col("fp"),
                col("ingest_batch").as("src_batch"))
          }
        val clash = dl
          .join(indexed.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .limit(1).count()
        if (clash > 0) {
          // Replay-after-fold detection (ADVICE r10): a batch that
          // committed and was then FOLDED by mergeDeltas/compact before
          // the stream checkpoint advanced redelivers with its marker
          // gone — excludeBatch cannot hide it, and refusing would turn
          // exactly-once replay into a permanent crash loop. Such a
          // replay is recognized by BOTH (a) every incoming doc already
          // indexed with IDENTICAL CONTENT — the `fp` text fingerprint,
          // not dl: an edited doc whose edit preserves word count must
          // NOT pass as a replay (ADVICE r11; fp-null legacy rows fall
          // back to dl) — AND (b) no clashing doc living in a LIVE
          // positive batch (folded rows live in the base or a merged
          // id<0 segment). A re-send of docs a live batch owns — a
          // genuine double-index attempt — still refuses.
          val idx = indexed.select(col("doc_id").as("i_doc"),
            col("dl").as("i_dl"), col("fp").as("i_fp"))
          val novel = dl
            .join(idx,
              col("doc_id") === col("i_doc") &&
                (col("i_fp") === col("fp") ||
                  (col("i_fp").isNull && col("i_dl") === col("dl"))),
              "left_anti")
            .limit(1).count()
          val liveOwned = dl
            .join(indexed.where(col("src_batch") >= 0)
              .select(col("doc_id")), Seq("doc_id"), "left_semi")
            .limit(1).count()
          require(novel == 0 && liveOwned == 0,
            s"TextIndex.append: batch $batchId contains doc_ids already in " +
              "the index (or re-sends them with CHANGED content) — " +
              "appending would double-count their postings; rebuild instead")
          return
        }
        docs.select(col("doc_id"),
            explode(split(col("text"), " ")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("bucket", bucketCol)
          .withColumn("ingest_batch", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch", "bucket")
          .parquet(s"$dir/postings_delta")
        dl.withColumn("ingest_batch", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(s"$dir/lengths_delta")
        row
      } finally {
        org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(dl)
      }
    // marker LAST, via the atomic write primitive: a crash mid-write
    // must never leave a present-but-truncated marker (which would read
    // as "committed" with corrupt scalars)
    EstateFs.writeStringAtomic(s"$dir/meta_delta_batch_$batchId.json",
      s"""{"n_docs":${statsRow.getLong(0)},"sum_dl":${statsRow.getLong(1)}}""")
  }

  // -- delta compaction (VERDICT r8 #3: the lifecycle's third verb) ------

  /** Test seam: runs immediately after [[compact]] writes its commit
    * marker and before the swap — lets a spec kill the job at the
    * worst instant deterministically. No-op in production. */
  private[graft] var compactCrashHook: () => Unit = () => ()

  /** Test seam: runs right after [[compact]]/[[mergeDeltas]] snapshot
    * the committed-batch list and before any table read — the window a
    * concurrent append can land in. No-op in production. */
  private[graft] var compactSnapshotHook: () => Unit = () => ()

  private def compactMarker(dir: String) = s"$dir/meta_compact.json"

  /** Lease tokens of writers whose stale lease was BROKEN — the break
    * protocol leaves the old lease as `claims/LEASE.broken.<uuid>`
    * still carrying its token, so the set is readable forever after.
    * Tokens are per-acquire UUIDs, never reused, so membership exactly
    * identifies commits by overtaken writers. */
  private def brokenTokens(dir: String): Set[String] =
    EstateFs.listNames(s"$dir/claims")
      .filter(_.startsWith("LEASE.broken."))
      .flatMap(n =>
        scala.util.Try(EstateFs.readString(s"$dir/claims/$n")).toOption)
      .toSet

  private def markerBy(txt: String): Option[String] =
    """"by":"([0-9a-fA-F\-]+)"""".r.findFirstMatchIn(txt).map(_.group(1))

  /** Fence against the verifyHeld check-then-act window (ADVICE r11):
    * if the pending compact marker was committed by a writer whose
    * lease was broken (its token sits in `claims/LEASE.broken.*`), its
    * staged next-version tables may interleave with the breaker's own
    * staging — the marker is NOT trusted. Provided the version flip has
    * not happened yet (meta `pv` < marker `pv`), the base and every
    * delta are still intact, so the suspect commit is simply DISCARDED
    * (staged tables + marker deleted) and the fold reruns from scratch.
    * Once the flip landed, discarding would delete the LIVE base —
    * resume normally instead (the exposure already materialized inside
    * the unavoidable window; this fence shrinks it to flip-or-nothing).
    * Returns true iff a suspect commit was discarded. */
  private def discardSuspectCompact(dir: String): Boolean = {
    val p = compactMarker(dir)
    if (!EstateFs.exists(p)) return false
    val txt = EstateFs.readString(p)
    val markerPv = """"pv":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
    val flipped = markerPv.exists(_ <= pvOf(dir))
    if (!flipped && markerBy(txt).exists(brokenTokens(dir))) {
      markerPv.foreach { v =>
        EstateFs.deleteRecursive(s"$dir/postings_v$v")
        EstateFs.deleteRecursive(s"$dir/lengths_v$v")
      }
      EstateFs.deleteIfExists(p)
      true
    } else false
  }

  /** Refuse to serve/append across a half-finished compaction: between
    * the commit marker and the final cleanup the on-disk state mixes
    * folded and unfolded rows, and reading it would double-count. */
  private def requireNoPendingCompact(dir: String, op: String): Unit =
    require(!EstateFs.exists(compactMarker(dir)),
      s"TextIndex.$op: $dir has a committed-but-unfinished compaction " +
        "(meta_compact.json present) — run TextIndex.compact(dir) to " +
        "finish it first")

  /** Fold every COMMITTED delta batch into the base postings/lengths
    * tables and rewrite meta — the segment-merge verb between
    * [[append]] (which accumulates per-batch partitions forever) and a
    * full [[build]] (reference analog: the nightly DiaObject copy/
    * delete consolidation, `log2influx.py:197-204`). Serving is
    * byte-identical before and after: the folded tables hold the same
    * (doc_id, term, tf)/(doc_id, dl) row sets and the integer BM25
    * kernel is summation-order-free.
    *
    * Crash protocol (two-phase, RENAME-FREE since r11 — object-store
    * safe): the consolidated tables are staged under the NEXT version
    * (`postings_v{pv+1}`/`lengths_v{pv+1}`) while serving still
    * resolves the current `pv` — a kill before the marker leaves only
    * dead staging dirs, and a rerun restarts cleanly. The atomic
    * `meta_compact.json` write is THE commit point: it records the new
    * scalars, the new `pv`, and the folded batch ids, after which
    * [[search]]/[[append]] refuse (the intermediate states
    * double-count) and re-running compact replays the remaining
    * idempotent steps — the atomic meta write flips the served version,
    * deletes are idempotent, marker removed last. Batches appended
    * AFTER the batch-list snapshot (including
    * during the long phase-1 writes) are untouched in BOTH staged
    * tables and fold on the next cycle. Immediately before the marker
    * lands the writer re-verifies it still holds the lease
    * ([[WriterLease.verifyHeld]]): a consolidation that outlived the
    * TTL and was broken aborts instead of interleaving with its
    * successor.
    *
    * Cost is O(base + deltas) — the whole index rewrites. Callers on a
    * nightly cadence should go through [[maintain]], which runs the
    * O(deltas) [[mergeDeltas]] tier instead until the accumulated
    * deltas justify a base rewrite.
    *
    * Returns the number of delta batches folded (0 = nothing to do). */
  def compact(spark: SparkSession, dir: String): Int = {
    // single-writer lease (round 10 parity with warehouse ingest): the
    // crash protocol makes a RERUN safe, not a CONCURRENT twin — two
    // live compactions stage into the same next-version dirs. Appends need no
    // lease: their safety vs a running compaction is the snapshot
    // protocol above (spec-pinned), and refusal mid-swap is explicit.
    val lease = WriterLease.acquire(spark, dir,
      "two concurrent consolidations would interleave staged tables.")
    try compactLocked(spark, dir, lease)
    finally WriterLease.release(spark, dir, lease)
  }

  private def compactLocked(spark: SparkSession, dir: String,
      lease: String): Int = {
    // resume a committed-but-unfinished cycle before anything else —
    // unless the marker came from a BROKEN writer's late commit, in
    // which case it is discarded and this run folds from scratch
    if (EstateFs.exists(compactMarker(dir)) && !discardSuspectCompact(dir))
      return finishCompact(spark, dir, lease)
    require(EstateFs.exists(s"$dir/meta.json"),
      s"TextIndex.compact: $dir has no meta.json — not a TextIndex dir")
    // finish any pending merge cleanup FIRST: finishCompact deletes the
    // folded merged markers, and a batch whose own marker still lingered
    // would otherwise re-surface as committed afterwards (double count)
    cleanupFoldedDeltas(dir)
    val batches = committedBatches(dir)
    if (batches.isEmpty) return 0
    compactSnapshotHook()
    val (nDocsBase, sumDlBase, buckets) = meta(dir)
    val (nDocs, sumDl) = batches.foldLeft((nDocsBase, sumDlBase)) {
      case ((n, s), b) => val (dn, ds) = deltaMeta(dir, b); (n + dn, s + ds)
    }
    val curPv = pvOf(dir)
    val (postPath, lenPath) =
      if (curPv == 0) (s"$dir/postings", s"$dir/lengths")
      else (s"$dir/postings_v$curPv", s"$dir/lengths_v$curPv")
    val newPv = curPv + 1
    // phase 1 — stage the folded tables under the NEXT version while
    // serving still reads the current one (no rename anywhere: the
    // version flip in meta is the swap — object-store-safe). One file
    // per bucket: compaction is also where the append-cycle file growth
    // resets. BOTH staged tables filter to the SNAPSHOTTED batch list —
    // a batch whose append commits during this (long) write must fold
    // on the NEXT cycle, in neither table: a re-enumeration here would
    // put its dl rows in the new base while the marker's folded list
    // (and finishCompact's deletes) miss it, double-counting its
    // lengths forever.
    val postAll = spark.read.parquet(postPath)
      .select(col("doc_id"), col("term"), col("tf"), col("bucket"))
      .unionByName(spark.read.parquet(s"$dir/postings_delta")
        .where(col("ingest_batch").isin(batches: _*))
        .select(col("doc_id"), col("term"), col("tf"), col("bucket")))
    postAll.repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"$dir/postings_v$newPv")
    // fp travels through the fold (null for pre-fp base rows): the
    // replay-after-fold detection needs the fingerprint EXACTLY for
    // docs whose batch was folded — dropping it here would reopen the
    // same-word-count silent-loss hole for every folded doc
    withFpNullable(spark.read.parquet(lenPath))
      .select(col("doc_id"), col("dl"), col("fp"))
      .unionByName(readLengthsDelta(spark, dir)
        .where(col("ingest_batch").isin(batches: _*))
        .select(col("doc_id"), col("dl"), col("fp")))
      .coalesce(
        math.max(1, spark.sparkContext.defaultParallelism / 4))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lengths_v$newPv")
    // phase 2 — THE commit point. Re-verify lease ownership FIRST: the
    // phase-1 writes are the long part of the cycle, and a writer that
    // outlived the TTL and was broken must abort here, not commit a
    // marker over its successor's state (VERDICT r10 #2).
    WriterLease.verifyHeld(spark, dir, lease)
    // `by` = the committing writer's lease token (ADVICE r11): verifyHeld
    // is check-then-act, so a writer broken BETWEEN the verify and this
    // write can still land the marker. The token makes that detectable —
    // a later resumer cross-checks `by` against claims/LEASE.broken.* and
    // discards a broken writer's un-flipped commit ([[discardSuspectCompact]]).
    EstateFs.writeStringAtomic(compactMarker(dir),
      s"""{"n_docs":$nDocs,"sum_dl":$sumDl,"buckets":$buckets,"pv":$newPv,"by":"$lease","folded":[${batches.mkString(",")}]}""")
    compactCrashHook()
    // phase 3 — idempotent finish
    finishCompact(spark, dir, lease)
  }

  /** Replay the post-commit steps of a compaction cycle; every step is
    * idempotent, so a kill anywhere in here is repaired by calling it
    * (or [[compact]]) again — under the lease: the cleanup deletes are
    * destructive, and two live finishers would interleave (ADVICE r10 —
    * the resume path used to run lease-free). Rename-free (r11): the
    * meta write below IS the base-table swap — readers resolve the base
    * paths through `pv`, so one atomic meta write flips the served
    * version; old-version tables, folded deltas, and the marker are
    * then removed idempotently. */
  private def finishCompact(spark: SparkSession, dir: String,
      lease: String): Int = {
    WriterLease.verifyHeld(spark, dir, lease)
    val txt = EstateFs.readString(compactMarker(dir))
    def grab(k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    val folded = """"folded":\[([0-9,\-]*)\]""".r.findFirstMatchIn(txt).get
      .group(1).split(",").filter(_.nonEmpty).map(_.toLong).toSeq
    val newPv = grab("pv")
    // THE swap: flip the served version in one atomic meta write
    EstateFs.writeStringAtomic(s"$dir/meta.json",
      s"""{"n_docs":${grab("n_docs")},"sum_dl":${grab("sum_dl")},"buckets":${grab("buckets")},"pv":$newPv}""")
    dropStaleTables(dir, newPv.toInt)
    folded.foreach { b =>
      EstateFs.deleteRecursive(s"$dir/postings_delta/ingest_batch=$b")
      EstateFs.deleteRecursive(s"$dir/lengths_delta/ingest_batch=$b")
      EstateFs.deleteIfExists(s"$dir/meta_delta_batch_$b.json"): Unit
    }
    // drop now-empty delta roots so the layout returns to the as-built
    // shape (a batch appended after the commit marker keeps its root)
    Seq("postings_delta", "lengths_delta").foreach { t =>
      if (EstateFs.hasNoSubdirs(s"$dir/$t"))
        EstateFs.deleteRecursive(s"$dir/$t")
    }
    EstateFs.deleteIfExists(compactMarker(dir))
    folded.size
  }

  // -- tiered merge (VERDICT r9 #2: nightly cost ∝ new data) -------------

  /** Merge policy defaults for [[maintain]]: fold the base only when
    * the accumulated deltas reach [[FullFoldRatio]] of it (by Σdl, the
    * postings-volume proxy the markers already carry — the decision is
    * metadata-only, no Spark job); below that, squash ≥
    * [[MergeMinBatches]] committed batches into ONE merged segment at
    * O(deltas) cost. The classic two-level LSM shape: nightly work is
    * proportional to NEW data, and the O(base) rewrite amortizes to
    * ~once per 1/ratio nights of appends. */
  val MergeMinBatches = 2
  val FullFoldRatio = 0.2

  /** Test seam like [[compactCrashHook]]: runs after [[mergeDeltas]]
    * moves the staged segment into the delta layout and BEFORE its
    * commit marker lands. No-op in production. */
  private[graft] var mergeCrashHook: () => Unit = () => ()

  /** Squash every committed delta batch into ONE merged segment —
    * the O(deltas) tier between [[append]] and a full [[compact]].
    * The merged segment lives in the SAME `postings_delta/lengths_delta`
    * layout under a reserved id < 0, so serving/compaction treat it as
    * just another committed batch; its marker additionally records the
    * folded ids, and [[committedBatches]] excludes those the instant
    * the marker lands (one atomic write = the commit point). The
    * folded batches' dirs/markers become dead weight removed by the
    * idempotent cleanup — a kill anywhere leaves either the old state
    * (no marker: half-staged segment is invisible and the rerun
    * overwrites it, same id) or the new one (marker present: folded
    * batches excluded; rerun finishes the deletes). Like compact, the
    * writer re-verifies lease ownership immediately before the marker.
    *
    * Returns the number of batches folded (0 = fewer than 2 committed
    * batches — nothing worth squashing). */
  def mergeDeltas(spark: SparkSession, dir: String): Int = {
    // same single-writer lease as compact: two live merges write the
    // same reserved segment dir (deterministic merged id)
    val lease = WriterLease.acquire(spark, dir,
      "two concurrent consolidations would interleave staged tables.")
    try mergeDeltasLocked(spark, dir, lease)
    finally WriterLease.release(spark, dir, lease)
  }

  private def mergeDeltasLocked(spark: SparkSession, dir: String,
      lease: String): Int = {
    requireNoPendingCompact(dir, "mergeDeltas")
    require(EstateFs.exists(s"$dir/meta.json"),
      s"TextIndex.mergeDeltas: $dir has no meta.json — not a TextIndex dir")
    cleanupFoldedDeltas(dir)
    val batches = committedBatches(dir)
    if (batches.size < 2) return 0
    compactSnapshotHook()
    // deterministic reserved id: a killed merge reruns over the same
    // batch set, lands on the same id, and overwrites its own debris
    val mergedId = math.min(0L, batches.min) - 1L
    val (nDocs, sumDl) = batches.foldLeft((0L, 0L)) {
      case ((n, s), b) => val (dn, ds) = deltaMeta(dir, b); (n + dn, s + ds)
    }
    // stage DIRECTLY into the merged segment's partition dir (rename-
    // free, r11): the reads above filter to the SNAPSHOTTED positive
    // batch ids, so writing under ingest_batch=<mergedId> never
    // overlaps them (the file listing predates the write, and the
    // reserved id is outside the filter); Overwrite truncates only this
    // segment's own debris from a killed prior run. The segment stays
    // INVISIBLE until its marker lands — committedBatches reads
    // markers, not dirs.
    val destP = s"$dir/postings_delta/ingest_batch=$mergedId"
    val destL = s"$dir/lengths_delta/ingest_batch=$mergedId"
    spark.read.parquet(s"$dir/postings_delta")
      .where(col("ingest_batch").isin(batches: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("bucket"))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(destP)
    // fp preserved for the same replay-after-fold reason as compact
    readLengthsDelta(spark, dir)
      .where(col("ingest_batch").isin(batches: _*))
      .select(col("doc_id"), col("dl"), col("fp"))
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
      .write.mode(SaveMode.Overwrite).parquet(destL)
    mergeCrashHook()
    // commit point: the merged marker (scalars + folded list) in one
    // atomic write — readers switch to the segment instantly. Lease
    // re-verified first (same TTL-overrun argument as compact).
    WriterLease.verifyHeld(spark, dir, lease)
    EstateFs.writeStringAtomic(s"$dir/meta_delta_batch_$mergedId.json",
      s"""{"n_docs":$nDocs,"sum_dl":$sumDl,"by":"$lease","folded":[${batches.mkString(",")}]}""")
    cleanupFoldedDeltas(dir)
    batches.size
  }

  /** Remove the dead dirs/markers of batches a committed merged
    * segment already folded. Idempotent; dirs first, marker last, so a
    * kill mid-cleanup leaves the batch still excluded (its id stays in
    * the folded list) and the rerun finishes.
    *
    * Fence first (ADVICE r11, the merge-tier twin of
    * [[discardSuspectCompact]]): a merged marker committed by a BROKEN
    * writer (token in `claims/LEASE.broken.*`) may reference a segment
    * interleaved with its breaker's staging — while every folded
    * batch's own marker still exists (i.e. no cleanup has destroyed
    * the inputs), the suspect segment + marker are discarded and the
    * batches simply re-merge on the next cycle. Once any folded input
    * is gone the segment is normally the only owner of those rows and
    * must stand — EXCEPT the late-zombie window (ADVICE r12): a
    * zombie's merged marker that lands AFTER its successor already
    * re-merged the same inputs and cleaned up their markers would pass
    * that test and double-count every folded doc. So a broken-by
    * marker is ALSO discarded when its folded set is a SUBSET of
    * another live segment's folded set — the other segment physically
    * owns every one of its rows, so dropping the zombie's is loss-free.
    * (The successor picks its inputs from `committedBatches` at merge
    * time, which includes everything the zombie could have folded, so
    * the successor's set is always a superset — the inverse case
    * cannot arise from this interleave.) Equal-set ties between two
    * broken markers keep exactly the max id: the shadow test requires
    * a live non-broken shadower, a strictly larger set, or a larger
    * id, so one segment always survives. A zombie writer calling this
    * right after its own late commit discards its OWN marker — which
    * is exactly the correct outcome. */
  private[graft] def cleanupFoldedDeltas(dir: String): Unit = {
    val broken = brokenTokens(dir)
    if (broken.nonEmpty) {
      val negIds = allMarkerIds(dir).filter(_ < 0)
      val foldedSets: Map[Long, Set[Long]] =
        negIds.map(m => m -> foldedList(dir, m).toSet).toMap
      negIds.foreach { m =>
        val p = s"$dir/meta_delta_batch_$m.json"
        if (EstateFs.exists(p) && markerBy(EstateFs.readString(p)).exists(broken)) {
          val inputs = foldedSets(m)
          val inputsIntact = inputs.nonEmpty && inputs.forall(b =>
            EstateFs.exists(s"$dir/meta_delta_batch_$b.json"))
          // live-shadow test evaluated NOW (not from the pre-pass map's
          // keys): a shadower discarded earlier in this same loop no
          // longer exists and no longer shadows, so an equal-set ring
          // can never discard all of its members
          def shadowed: Boolean = foldedSets.exists { case (m2, s2) =>
            m2 != m && s2.nonEmpty && inputs.subsetOf(s2) && {
              val p2 = s"$dir/meta_delta_batch_$m2.json"
              EstateFs.exists(p2) && {
                !markerBy(EstateFs.readString(p2)).exists(broken) ||
                  inputs != s2 || m2 > m
              }
            }
          }
          if (inputsIntact || (inputs.nonEmpty && shadowed)) {
            EstateFs.deleteIfExists(p) // marker first: segment invisible at once
            EstateFs.deleteRecursive(s"$dir/postings_delta/ingest_batch=$m")
            EstateFs.deleteRecursive(s"$dir/lengths_delta/ingest_batch=$m")
          }
        }
      }
    }
    val all = allMarkerIds(dir).toSet
    allMarkerIds(dir).filter(_ < 0).foreach { m =>
      foldedList(dir, m).filter(all).foreach { b =>
        EstateFs.deleteRecursive(s"$dir/postings_delta/ingest_batch=$b")
        EstateFs.deleteRecursive(s"$dir/lengths_delta/ingest_batch=$b")
        EstateFs.deleteIfExists(s"$dir/meta_delta_batch_$b.json"): Unit
      }
    }
  }

  /** What [[maintain]] did. `action`: "none" (nothing committed / one
    * lone batch / below both thresholds), "merge" (O(deltas) squash),
    * or "full" (base rewrite — deltas reached `fullFoldRatio` of the
    * base, or a committed-but-unfinished compaction was resumed). */
  final case class MaintainResult(action: String, batchesFolded: Int)

  /** The nightly policy verb: pick the cheapest safe consolidation.
    * Decision is metadata-only (marker scalars vs base meta), then at
    * most one of the consolidation bodies runs — so a night with one
    * tiny delta costs a directory listing, not an index rewrite. The
    * WHOLE verb (resume, cleanup, decision, consolidation) runs under
    * ONE [[WriterLease]] acquisition: the resume path replays the
    * destructive base-table swap, and two double-fired nightly jobs
    * entering it lease-free could interleave rm+move and leave the
    * index without base postings (ADVICE r10).
    *
    * Streaming callers: quiesce or checkpoint-sync the ingest stream
    * around maintenance when possible. A batch that committed but whose
    * stream checkpoint did not advance before a merge folds it is still
    * safe — [[append]] detects the fully-contained replay and no-ops —
    * but a PARTIALLY delivered batch plus a concurrent fold is refused
    * loudly and needs a rebuild decision. */
  def maintain(spark: SparkSession, dir: String,
      mergeMinBatches: Int = MergeMinBatches,
      fullFoldRatio: Double = FullFoldRatio): MaintainResult = {
    val lease = WriterLease.acquire(spark, dir,
      "two concurrent consolidations would interleave staged tables.")
    try {
      // a committed-but-unfinished compaction outranks policy: serving
      // refuses until it finishes (a broken writer's late commit is
      // discarded instead — its deltas are intact and refold by policy)
      if (EstateFs.exists(compactMarker(dir)) && !discardSuspectCompact(dir))
        return MaintainResult("full", finishCompact(spark, dir, lease))
      cleanupFoldedDeltas(dir)
      // retention GC for lease-audit debris (broken records / orphan
      // break tickets beyond WriterLease.AuditRetentionMs) — runs
      // AFTER discardSuspectCompact so the fencing read above saw
      // every in-retention broken token, and under THIS lease per the
      // gcAuditRecords contract
      WriterLease.gcAuditRecords(spark, dir): Unit
      val batches = committedBatches(dir)
      if (batches.isEmpty) return MaintainResult("none", 0)
      val (_, sumDlBase, _) = meta(dir)
      val deltaSumDl = batches.map(deltaMeta(dir, _)._2).sum
      if (sumDlBase == 0L ||
        deltaSumDl.toDouble / sumDlBase >= fullFoldRatio)
        MaintainResult("full", compactLocked(spark, dir, lease))
      else if (batches.size >= mergeMinBatches)
        MaintainResult("merge", mergeDeltasLocked(spark, dir, lease))
      else MaintainResult("none", 0)
    } finally WriterLease.release(spark, dir, lease)
  }

  /** Attach a (doc_id, text) stream: every micro-batch appends via
    * [[append]]; restart with the same checkpoint replays the killed
    * batch into its own partitions — exactly-once by layout. A batch
    * folded by [[maintain]] between its commit and the checkpoint
    * advance replays as a no-op (full-containment detection in
    * [[append]]), so running maintenance beside a live stream is safe;
    * see [[maintain]]'s scaladoc for the partial-delivery caveat. */
  def ingest(spark: SparkSession, dir: String,
      stream: DataFrame, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          append(spark, dir, b.toDF(), id)
      }
      .start()

  /** Serve a BM25 query batch from the PERSISTED index. The postings
    * scan carries `bucket IN (query-term buckets)` — parquet partition
    * pruning skips every other bucket's files — plus a pushed
    * `term IN (...)` row filter; corpus scalars attach from meta as a
    * one-row literal frame (no corpus aggregation in the serve plan).
    * Returns (query_id, rank, doc_id, score_s), x51's exact shape. */
  def search(spark: SparkSession, dir: String,
      queryBatch: Seq[(Long, Seq[String])],
      k: Int = TextQueries.Bm25TopK): DataFrame = {
    import spark.implicits._
    requireNoPendingCompact(dir, "search")
    val (nDocsBase, sumDlBase, buckets) = meta(dir)
    require(buckets == TermBuckets,
      s"$dir built with $buckets buckets, this build expects $TermBuckets")
    // fold committed incremental batches into the served corpus: rows
    // union in, scalars sum in — BM25 over the union is byte-identical
    // to a from-scratch rebuild (tf/dl rows are the same set; the
    // integer-scaled kernel is summation-order-free)
    val batches = committedBatches(dir)
    val (nDocs, sumDl) = batches.foldLeft((nDocsBase, sumDlBase)) {
      case ((n, s), b) =>
        val (dn, ds) = deltaMeta(dir, b); (n + dn, s + ds)
    }
    val terms = queryBatch.flatMap(_._2).distinct
    val termBuckets = terms
      .map(t => TextIndexHash.bucketOf(t, buckets)).distinct
    val tfBase = spark.read.parquet(tablePaths(dir)._1)
      .where(col("bucket").isin(termBuckets: _*) &&
        col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    val tf =
      if (batches.isEmpty) tfBase
      else tfBase.unionByName(
        spark.read.parquet(s"$dir/postings_delta")
          .where(col("ingest_batch").isin(batches: _*) &&
            col("bucket").isin(termBuckets: _*) &&
            col("term").isin(terms: _*))
          .select(col("doc_id"), col("term"), col("tf")))
    val dl = lengthsAll(spark, dir)
    val stats = Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
    val qterms = queryBatch
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    TextQueries.bm25Score(spark, tf, dl, stats, qterms, k)
  }
}

/** Driver-side twin of the postings bucket expression: the same
  * md5-derived 60-bit hash [[PortableHash]] evaluates in SQL, computed
  * in Scala so [[TextIndex.search]] can enumerate a query's buckets
  * without a Spark job. A spec pins the two implementations equal. */
object TextIndexHash {
  def bucketOf(term: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = md.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }
}
