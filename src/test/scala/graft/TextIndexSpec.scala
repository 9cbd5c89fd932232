package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Tables, TextQueries}

/** The persisted BM25 lexical index lifecycle: build once, serve many —
  * served rankings must agree exactly with x51's inline form, and the
  * postings scan must prune to the query terms' bucket partitions. */
class TextIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("driver-side bucket hash equals the SQL bucket expression") {
    import spark.implicits._
    val words = TextQueries.bm25Queries.flatMap(_._2).distinct ++
      Seq("the", "zebra", "Dup", "", "a b", "ümlaut", "123", "x" * 50)
    val sqlBuckets = words.toDF("term")
      .select(col("term"),
        (expr(graft.queries.PortableHash.hex60("term")) %
          TextIndex.TermBuckets).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    words.foreach { w =>
      assert(TextIndexHash.bucketOf(w, TextIndex.TermBuckets)
        == sqlBuckets(w), s"bucket mismatch for '$w'")
    }
  }

  test("persisted index serves x51's exact ranking with a pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("txtidx").toString
    TextIndex.build(spark, dir,
      Tables.documents(spark, sf).select("doc_id", "text"))

    val served = TextIndex.search(spark, dir, TextQueries.bm25Queries)

    // the bucket partition column must actually prune the postings
    // scan: the batch's 9 distinct terms touch at most 9 of the 64
    // bucket partitions (sparkPlan, not executedPlan: AQE hides scans
    // behind query-stage leaves)
    val scans = served.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val postScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("postings"))).get
    assert(postScan.metadata("PartitionFilters").contains("bucket"),
      "postings scan carries no bucket partition filter")
    val selected = postScan.selectedPartitions.partitionCount
    val nTerms = TextQueries.bm25Queries.flatMap(_._2).distinct.size
    assert(selected <= nTerms,
      s"scan opened $selected bucket partitions for $nTerms terms")
    // and the serve plan never tokenizes: no corpus explode stage
    val plan = served.queryExecution.sparkPlan.toString
    assert(!plan.contains("Generate explode"),
      "serve plan re-tokenizes the corpus — index not persisted")
    assert(!scans.exists(_.metadata.get("Location")
      .exists(_.contains("documents.parquet"))),
      "serve plan scans the raw documents table")

    val inline = TextQueries.x51Bm25TopK(spark, sf)
    assert(served.collect().map(_.toString).toSeq ==
      inline.collect().map(_.toString).toSeq,
      "persisted BM25 serving diverged from x51's inline form")
  }

  test("serving an unknown term set returns empty, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("txtidx2").toString
    TextIndex.build(spark, dir,
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text"))
    val out = TextIndex.search(spark, dir,
      Seq(0L -> Seq("qqqzzznotaterm", "alsonotaterm")))
    assert(out.collect().isEmpty)
  }

  test("TextIndexTool round-trips build + search through parquet on disk") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ttool").toString
    val sfSmall = "/root/testdata/sf0.001"
    TextQueries.bm25Queries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
      .write.parquet(s"$root/queries.parquet")
    TextIndexTool.run(spark, Array("build", s"$root/idx",
      s"$sfSmall/documents.parquet"))
    TextIndexTool.run(spark, Array("search", s"$root/idx",
      s"$root/queries.parquet", s"$root/out.parquet"))
    val out = spark.read.parquet(s"$root/out.parquet")
    val inline = TextQueries.x51Bm25TopK(spark, sfSmall)
    assert(out.orderBy(col("query_id"), col("rank"))
      .collect().map(_.toString).toSeq ==
      inline.collect().map(_.toString).toSeq)
  }

  test("incremental append ≡ batch rebuild, replay-idempotent, uncommitted invisible") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val half = docs.where(col("doc_id") % 2 === 0)
    val rest = docs.where(col("doc_id") % 2 === 1)

    // rebuilt-from-scratch reference over the full corpus
    val full = java.nio.file.Files.createTempDirectory("txtfull").toString
    TextIndex.build(spark, full, docs)
    val want = TextIndex.search(spark, full, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // base on half, then append the rest incrementally
    val inc = java.nio.file.Files.createTempDirectory("txtinc").toString
    TextIndex.build(spark, inc, half)
    TextIndex.append(spark, inc, rest, batchId = 0L)
    val got = TextIndex.search(spark, inc, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(got == want,
      "incremental index rankings diverged from batch rebuild")

    // replay (kill-and-resume): re-running the SAME batch overwrites its
    // own partitions — no double count, identical rankings
    TextIndex.append(spark, inc, rest, batchId = 0L)
    assert(TextIndex.search(spark, inc, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "replayed batch changed rankings — append not idempotent")

    // a batch whose marker is missing (killed before commit) must be
    // invisible: simulate by deleting the marker
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(inc, "meta_delta_batch_0.json"))
    val baseOnly = TextIndex.search(spark, inc, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    val halfIdx = java.nio.file.Files.createTempDirectory("txthalf").toString
    TextIndex.build(spark, halfIdx, half)
    assert(baseOnly == TextIndex.search(spark, halfIdx,
      TextQueries.bm25Queries).collect().map(_.toString).toSeq,
      "uncommitted delta partitions leaked into serving")
    // ...and the replay after the simulated crash restores the union
    TextIndex.append(spark, inc, rest, batchId = 0L)
    assert(TextIndex.search(spark, inc, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)

    // doc_id collisions refuse loudly (a different batch id re-sending
    // indexed docs would double-count postings)
    val e = intercept[IllegalArgumentException] {
      TextIndex.append(spark, inc, rest.limit(5), batchId = 1L)
    }
    assert(e.getMessage.contains("double-count"))
  }

  test("streaming ingest: kill-and-resume appends exactly once") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val base = docs.where(col("doc_id") < 30)
    val feed = docs.where(col("doc_id") >= 30)
    val dir = java.nio.file.Files.createTempDirectory("txtstream").toString
    TextIndex.build(spark, dir, base)

    // file-source staging + checkpoint restarts (VectorIngestSpec's
    // kill-and-resume shape)
    val inDir = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val chk = s"$dir/chk"
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(inDir, name))
    }
    def runOnce(): Unit = {
      val q = TextIndex.ingest(spark, dir,
        spark.readStream.schema(feed.schema).parquet(inDir), chk)
      q.processAllAvailable(); q.stop()
    }
    stage(feed.where(col("doc_id") < 40), "f1.parquet")
    runOnce() // run 1, then the "kill"
    stage(feed.where(col("doc_id") >= 40), "f2.parquet")
    runOnce() // resume from the SAME checkpoint: f1 must not re-append

    // exactly-once: every feed doc indexed exactly once across restarts
    val delta = spark.read.parquet(s"$dir/lengths_delta")
      .select("doc_id").as[Long].collect()
    assert(delta.length == delta.distinct.length,
      "restart double-appended a batch")
    assert(delta.toSet == feed.select("doc_id").as[Long].collect().toSet)

    // the grown index ranks exactly like a monolithic rebuild
    val full = java.nio.file.Files.createTempDirectory("txtfull2").toString
    TextIndex.build(spark, full, docs)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq ==
      TextIndex.search(spark, full, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq,
      "stream-grown index diverged from monolithic rebuild")
  }

  test("compact: identical serving, bounded files across cycles, crash-resumable") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    def countFiles(p: String): Int = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(q => q.toString.endsWith(".parquet")).count().toInt
        finally s.close()
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("txtcomp").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") % 5 === 0))
    (1 to 3).foreach { m =>
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") % 5 === m), batchId = m.toLong)
    }
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(countFiles(s"$dir/postings_delta") > 0)

    // fold: serving must be byte-identical, deltas gone, scalars rolled
    assert(TextIndex.compact(spark, dir) == 3)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "compaction changed served rankings")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "postings_delta")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "lengths_delta")))
    // base paths resolve through the version pointer after a compact
    // (rename-free swap, r11)
    val filesAfterC1 = countFiles(TextIndex.tablePaths(dir)._1)

    // nothing to fold → no-op
    assert(TextIndex.compact(spark, dir) == 0)

    // a second append/compact cycle lands at the SAME file count — the
    // growth append accumulates is reset every cycle
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") % 5 === 4), batchId = 10L)
    val want2 = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(TextIndex.compact(spark, dir) == 1)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want2)
    assert(countFiles(TextIndex.tablePaths(dir)._1) == filesAfterC1,
      "postings file count grows across append/compact cycles")
    // fully folded index serves exactly like a monolithic rebuild
    val full = java.nio.file.Files.createTempDirectory("txtcompfull").toString
    TextIndex.build(spark, full, docs)
    assert(want2 == TextIndex.search(spark, full, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq,
      "compacted index diverged from monolithic rebuild")

    // kill at the worst instant — right after the commit marker: serve
    // and append must refuse (intermediate state double-counts), and
    // re-running compact finishes the cycle
    val crash = java.nio.file.Files.createTempDirectory("txtcrash").toString
    TextIndex.build(spark, crash, docs.where(col("doc_id") < 100))
    TextIndex.append(spark, crash,
      docs.where(col("doc_id") >= 100 && col("doc_id") < 150), batchId = 0L)
    val wantCrash = TextIndex.search(spark, crash, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    TextIndex.compactCrashHook =
      () => throw new RuntimeException("injected kill")
    try intercept[RuntimeException] { TextIndex.compact(spark, crash) }
    finally TextIndex.compactCrashHook = () => ()
    val eS = intercept[IllegalArgumentException] {
      TextIndex.search(spark, crash, TextQueries.bm25Queries)
    }
    assert(eS.getMessage.contains("unfinished compaction"))
    val eA = intercept[IllegalArgumentException] {
      TextIndex.append(spark, crash,
        docs.where(col("doc_id") >= 150).limit(5), batchId = 1L)
    }
    assert(eA.getMessage.contains("unfinished compaction"))
    assert(TextIndex.compact(spark, crash) == 1,
      "re-run did not finish the committed cycle")
    assert(TextIndex.search(spark, crash, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == wantCrash,
      "crash-resumed compaction changed served rankings")
  }

  test("compact folds exactly the snapshotted batches — a concurrent append survives") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtrace").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 40))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 40 && col("doc_id") < 60), batchId = 0L)
    // the race window: an append COMMITS between compact's batch-list
    // snapshot and its (long, at scale) staged-table writes
    TextIndex.compactSnapshotHook = () =>
      TextIndex.append(spark, dir, docs.where(col("doc_id") >= 60),
        batchId = 1L)
    try assert(TextIndex.compact(spark, dir) == 1,
      "compact must fold only the snapshotted batch")
    finally TextIndex.compactSnapshotHook = () => ()
    // the late batch is untouched: marker + both delta dirs survive
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_delta_batch_1.json")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "postings_delta", "ingest_batch=1")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "lengths_delta", "ingest_batch=1")))
    // the folded base holds each snapshot doc's dl exactly once and
    // NONE of the late batch's (the r9 bug folded the late lengths in)
    val baseLens = spark.read.parquet(TextIndex.tablePaths(dir)._2)
      .select("doc_id").as[Long].collect()
    assert(baseLens.length == baseLens.distinct.length,
      "duplicate dl rows in the folded base")
    assert(baseLens.toSet ==
      docs.where(col("doc_id") < 60).select("doc_id").as[Long]
        .collect().toSet,
      "folded base lengths diverge from the snapshotted batches")
    // serving counts every doc's dl exactly once ≡ monolithic rebuild
    val full = java.nio.file.Files.createTempDirectory("txtracefull").toString
    TextIndex.build(spark, full, docs)
    val want = TextIndex.search(spark, full, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "serving after the racy compact diverged from monolithic rebuild")
    // the late batch folds on the NEXT cycle, exactly once
    assert(TextIndex.compact(spark, dir) == 1)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "second-cycle fold of the late batch changed rankings")
  }

  test("mergeDeltas folds exactly the snapshotted batches — a concurrent append survives") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtmrace").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 40))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 40 && col("doc_id") < 50), batchId = 0L)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 50 && col("doc_id") < 60), batchId = 1L)
    // the race window: an append COMMITS between the merge's batch-list
    // snapshot and its staged-segment writes (same seam compact pins)
    TextIndex.compactSnapshotHook = () =>
      TextIndex.append(spark, dir, docs.where(col("doc_id") >= 60),
        batchId = 2L)
    try assert(TextIndex.mergeDeltas(spark, dir) == 2,
      "merge must fold only the snapshotted batches")
    finally TextIndex.compactSnapshotHook = () => ()
    // the late batch is untouched beside the merged segment — BOTH are
    // committed, the folded two are gone
    assert(TextIndex.committedBatches(dir).sorted == Seq(-1L, 2L),
      s"committed set after racy merge: ${TextIndex.committedBatches(dir)}")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "postings_delta", "ingest_batch=2")))
    // serving ≡ monolithic rebuild (every doc's postings + dl once)
    val full = java.nio.file.Files.createTempDirectory("txtmracefull").toString
    TextIndex.build(spark, full, docs)
    val want = TextIndex.search(spark, full, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "serving after the racy merge diverged from monolithic rebuild")
    // the late batch folds on the NEXT cycle (nested merge), once
    assert(TextIndex.mergeDeltas(spark, dir) == 2)
    assert(TextIndex.committedBatches(dir) == Seq(-2L))
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "second-cycle fold of the late batch changed rankings")
  }

  private def fileIdentity(p: String): Seq[(String, Long, Long)] = {
    val root = java.nio.file.Paths.get(p)
    val s = java.nio.file.Files.walk(root)
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(q => q.toString.endsWith(".parquet"))
      .map(q => (root.relativize(q).toString, java.nio.file.Files.size(q),
        java.nio.file.Files.getLastModifiedTime(q).toMillis))
      .toSeq.sortBy(_._1)
    finally s.close()
  }

  test("mergeDeltas: O(deltas) squash — base untouched, serving identical, crash-resumable") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtmerge").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") % 10 < 7))
    (7 to 9).foreach { m =>
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") % 10 === m), batchId = m.toLong)
    }
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    val baseBefore = fileIdentity(s"$dir/postings")

    assert(TextIndex.mergeDeltas(spark, dir) == 3)
    assert(fileIdentity(s"$dir/postings") == baseBefore,
      "merge rewrote the base postings — must be O(deltas), not O(base)")
    assert(TextIndex.committedBatches(dir) == Seq(-1L),
      s"expected one merged segment: ${TextIndex.committedBatches(dir)}")
    (7 to 9).foreach { m =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, s"meta_delta_batch_$m.json")),
        s"folded batch $m's marker survived cleanup")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "postings_delta", s"ingest_batch=$m")))
    }
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "merge changed served rankings")

    // nested: a later batch merges WITH the previous merged segment
    // (disjoint negative doc_ids so the collision check passes)
    TextIndex.append(spark, dir,
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select(((col("doc_id") * -1) - 1).as("doc_id"), col("text"))
        .limit(20), batchId = 10L)
    val want2 = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(TextIndex.mergeDeltas(spark, dir) == 2,
      "nested merge must fold the merged segment + the new batch")
    assert(TextIndex.committedBatches(dir) == Seq(-2L))
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want2)
    // full compact folds the nested segment; scalars stay exact
    assert(TextIndex.compact(spark, dir) == 1)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want2,
      "post-merge full fold changed rankings")

    // crash between the segment move and the marker: uncommitted stays
    // invisible; the rerun lands on the same id and finishes
    val crash = java.nio.file.Files.createTempDirectory("txtmcrash").toString
    TextIndex.build(spark, crash, docs.where(col("doc_id") % 10 < 8))
    (8 to 9).foreach { m =>
      TextIndex.append(spark, crash,
        docs.where(col("doc_id") % 10 === m), batchId = m.toLong)
    }
    val wantC = TextIndex.search(spark, crash, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    TextIndex.mergeCrashHook = () => throw new RuntimeException("injected kill")
    try intercept[RuntimeException] { TextIndex.mergeDeltas(spark, crash) }
    finally TextIndex.mergeCrashHook = () => ()
    assert(TextIndex.committedBatches(crash) == Seq(8L, 9L),
      "half-staged merged segment leaked into the committed set")
    assert(TextIndex.search(spark, crash, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == wantC,
      "serving changed under a crashed merge")
    assert(TextIndex.mergeDeltas(spark, crash) == 2)
    assert(TextIndex.committedBatches(crash) == Seq(-1L))
    assert(TextIndex.search(spark, crash, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == wantC,
      "resumed merge changed rankings")
  }

  test("maintain: metadata-only gating picks none / merge / full") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtpolicy").toString
    // base = 18/20 of the corpus; two tiny deltas ≈ 5% each of it
    TextIndex.build(spark, dir, docs.where(col("doc_id") % 20 < 18))
    assert(TextIndex.maintain(spark, dir) ==
      TextIndex.MaintainResult("none", 0), "empty delta set must no-op")

    TextIndex.append(spark, dir,
      docs.where(col("doc_id") % 20 === 18), batchId = 0L)
    val baseBefore = fileIdentity(s"$dir/postings")
    assert(TextIndex.maintain(spark, dir) ==
      TextIndex.MaintainResult("none", 0),
      "one lone small batch must not trigger any rewrite")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_delta_batch_0.json")),
      "no-op night must leave the delta untouched")

    TextIndex.append(spark, dir,
      docs.where(col("doc_id") % 20 === 19), batchId = 1L)
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(TextIndex.maintain(spark, dir) ==
      TextIndex.MaintainResult("merge", 2),
      "two small batches below the ratio must MERGE, not fold the base")
    assert(fileIdentity(s"$dir/postings") == baseBefore,
      "merge-tier night rewrote the base postings")
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)

    // a delta at >= FullFoldRatio of the base triggers the full fold
    val big = java.nio.file.Files.createTempDirectory("txtbig").toString
    TextIndex.build(spark, big, docs.where(col("doc_id") % 3 === 0))
    TextIndex.append(spark, big,
      docs.where(col("doc_id") % 3 =!= 0), batchId = 0L)
    val wantBig = TextIndex.search(spark, big, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    assert(TextIndex.maintain(spark, big) ==
      TextIndex.MaintainResult("full", 1),
      "2x-base delta must trigger the base fold")
    assert(TextIndex.committedBatches(big).isEmpty)
    assert(TextIndex.search(spark, big, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == wantBig)
  }

  test("consolidation verbs hold the single-writer lease (round 10 parity)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtlease").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") % 5 === 0))
    (1 to 2).foreach { m =>
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") % 5 === m), batchId = m.toLong)
    }
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // a concurrent consolidator's live lease → both verbs refuse fast,
    // on-disk state untouched (serving identical), lease NOT stolen
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")
    java.nio.file.Files.createDirectories(lease.getParent)
    java.nio.file.Files.write(lease, "other-writer".getBytes)
    Seq(() => TextIndex.compact(spark, dir),
        () => TextIndex.mergeDeltas(spark, dir)).foreach { verb =>
      val e = intercept[IllegalStateException](verb())
      assert(e.getMessage.contains("lease"))
    }
    assert(java.nio.file.Files.readString(lease) == "other-writer",
      "refused verb must not delete the holder's lease")
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)

    // append stays lease-free BY DESIGN (snapshot protocol covers it)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") % 5 === 3), batchId = 3L)

    // holder releases → verbs run and release their own lease after
    java.nio.file.Files.delete(lease)
    assert(TextIndex.mergeDeltas(spark, dir) == 3)
    assert(!java.nio.file.Files.exists(lease),
      "mergeDeltas must release its lease")
    assert(TextIndex.compact(spark, dir) >= 1)
    assert(!java.nio.file.Files.exists(lease),
      "compact must release its lease")

    // a FAILED verb releases too: poison the layout so the locked body
    // throws past the lease acquire (meta.json gone mid-flight)
    val meta = java.nio.file.Paths.get(dir, "meta.json")
    val metaBak = java.nio.file.Paths.get(dir, "meta.json.bak")
    java.nio.file.Files.move(meta, metaBak)
    intercept[Exception](TextIndex.compact(spark, dir))
    assert(!java.nio.file.Files.exists(lease),
      "a failed compact must still release its lease")
    java.nio.file.Files.move(metaBak, meta)
  }

  test("TTL-broken live consolidation refuses to commit (r11: commit-time lease re-check)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtbreak").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    (0 to 1).foreach { m =>
      TextIndex.append(spark, dir, docs.where(
        col("doc_id") >= 30 + 20 * m && col("doc_id") < 50 + 20 * m),
        batchId = m.toLong)
    }
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")

    // Simulate a TTL break DURING the consolidation (the writer is past
    // its lease acquire, mid long-stage): the snapshot hook fires after
    // the batch-list snapshot, where we replace the writer's lease with
    // a successor's. The stale writer must then abort at its commit
    // point WITHOUT landing a marker — committing would interleave the
    // two writers' staged state.
    def breakLease(): Unit = {
      java.nio.file.Files.delete(lease)
      // drop the Hadoop LocalFileSystem checksum sibling too: a raw
      // java.nio rewrite under a stale .crc would make the lease read
      // as UNREADABLE (ChecksumException → None) rather than as the
      // successor's token — the refusal still fires, but this test is
      // about the token-mismatch path specifically
      java.nio.file.Files.deleteIfExists(
        lease.resolveSibling(".LEASE.crc"))
      java.nio.file.Files.write(lease, "successor-token".getBytes)
    }
    Seq("compact" -> (() => TextIndex.compact(spark, dir): Unit),
        "mergeDeltas" -> (() => TextIndex.mergeDeltas(spark, dir): Unit))
      .foreach { case (name, verb) =>
        TextIndex.compactSnapshotHook = breakLease
        try {
          val e = intercept[IllegalStateException](verb())
          assert(e.getMessage.contains("lease lost"), s"$name: $e")
        } finally TextIndex.compactSnapshotHook = () => ()
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, "meta_compact.json")),
          s"$name: overtaken writer landed its commit marker anyway")
        assert(TextIndex.committedBatches(dir).size == 2,
          s"$name: overtaken writer mutated the committed-batch set")
        assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
          .collect().map(_.toString).toSeq == want,
          s"$name: overtaken writer changed serving")
        // the overtaken writer's release must NOT evict the successor
        assert(java.nio.file.Files.readString(lease) == "successor-token",
          s"$name: overtaken writer deleted the successor's lease")
        java.nio.file.Files.delete(lease) // successor "finishes"
      }

    // with no interference the rerun consolidates the (possibly
    // debris-laden) state cleanly
    assert(TextIndex.compact(spark, dir) == 2)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)
  }

  test("maintain resumes an unfinished compaction only UNDER the lease (ADVICE r10)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtresume").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 40))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 40 && col("doc_id") < 60), batchId = 0L)
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    // kill right after the commit marker → committed-but-unfinished
    TextIndex.compactCrashHook =
      () => throw new RuntimeException("injected kill")
    try intercept[RuntimeException] { TextIndex.compact(spark, dir) }
    finally TextIndex.compactCrashHook = () => ()
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_compact.json")))

    // a rival nightly job still holds the lease → the resume REFUSES
    // instead of replaying the destructive base swap beside it (the
    // cron-double-fire corruption the lease exists to prevent)
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")
    java.nio.file.Files.createDirectories(lease.getParent)
    java.nio.file.Files.write(lease, "rival-nightly".getBytes)
    val e = intercept[IllegalStateException](TextIndex.maintain(spark, dir))
    assert(e.getMessage.contains("lease"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_compact.json")),
      "lease-refused resume must not touch the pending cycle")
    java.nio.file.Files.delete(lease)

    // rival gone → maintain resumes the cycle (action "full") and serves
    assert(TextIndex.maintain(spark, dir) ==
      TextIndex.MaintainResult("full", 1))
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)
  }

  test("replay of a batch folded by merge/compact no-ops instead of crash-looping (ADVICE r10)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtfoldrep").toString
    val b0 = docs.where(col("doc_id") >= 30 && col("doc_id") < 60)
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir, b0, batchId = 0L)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 60 && col("doc_id") < 90), batchId = 1L)
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // nightly merge folds batches 0 and 1 BEFORE the stream checkpoint
    // advanced past batch 0 — the ordinary-night scenario
    assert(TextIndex.mergeDeltas(spark, dir) == 2)
    val batchesAfterMerge = TextIndex.committedBatches(dir)

    // restart replays batch 0: its docs live in the merged segment, its
    // own marker is gone — the replay must NO-OP, not refuse forever
    TextIndex.append(spark, dir, b0, batchId = 0L)
    assert(TextIndex.committedBatches(dir) == batchesAfterMerge,
      "folded-batch replay committed a duplicate batch")
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "folded-batch replay changed serving (double count?)")

    // ...and the same after a FULL fold into the base
    assert(TextIndex.compact(spark, dir) >= 1)
    TextIndex.append(spark, dir, b0, batchId = 0L)
    assert(TextIndex.committedBatches(dir).isEmpty)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)

    // a PARTIALLY novel batch that collides still refuses loudly — only
    // the exact fully-contained replay no-ops
    val partial = docs.where(col("doc_id") >= 50 && col("doc_id") < 100)
    val e = intercept[IllegalArgumentException] {
      TextIndex.append(spark, dir, partial, batchId = 7L)
    }
    assert(e.getMessage.contains("double-count"))

    // a re-send of docs a LIVE batch owns refuses too (not a fold replay)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 90 && col("doc_id") < 95), batchId = 8L)
    val e2 = intercept[IllegalArgumentException] {
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") >= 90 && col("doc_id") < 95), batchId = 9L)
    }
    assert(e2.getMessage.contains("double-count"))
  }

  test("object-store posture: a stale lease is NEVER auto-broken (VERDICT r11 #1)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtposture").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 30 && col("doc_id") < 60), batchId = 0L)

    // a crashed writer's stale lease: present, readable, past the TTL
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")
    java.nio.file.Files.createDirectories(lease.getParent)
    java.nio.file.Files.write(lease, "crashed-writer".getBytes)
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))

    // under the object-store posture the break arm needs an atomic
    // rename it does not have — acquire must REFUSE with operator
    // guidance, not race a copy+delete against a hypothetical twin
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    try {
      val e = intercept[IllegalStateException](TextIndex.compact(spark, dir))
      assert(e.getMessage.contains("disabled") &&
        e.getMessage.contains("claims/LEASE"), e.getMessage)
      assert(java.nio.file.Files.readString(lease) == "crashed-writer",
        "posture-refused acquire must leave the stale lease untouched")
      assert(new java.io.File(s"$dir/claims").list()
        .count(_.startsWith("LEASE.broken.")) == 0,
        "posture-refused acquire must not move the lease aside")
    } finally spark.conf.set(EstateFs.AtomicRenameKey, "true")

    // back on the atomic posture the SAME stale lease is broken and the
    // verb proceeds — the degradation is posture-scoped, not a new brick
    assert(TextIndex.compact(spark, dir) == 1)
    assert(new java.io.File(s"$dir/claims").list()
      .count(_.startsWith("LEASE.broken.")) == 1,
      "atomic-posture break must leave its audit file")
  }

  test("edited doc with UNCHANGED word count refuses after a fold — content fingerprint (ADVICE r11)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtfp").toString
    val b0 = docs.where(col("doc_id") >= 30 && col("doc_id") < 60)
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir, b0, batchId = 0L)
    assert(TextIndex.compact(spark, dir) == 1) // fold: batch-0 marker gone
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // byte-identical redelivery of the folded batch still no-ops
    TextIndex.append(spark, dir, b0, batchId = 0L)
    assert(TextIndex.committedBatches(dir).isEmpty)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)

    // an EDIT that preserves each doc's word count (vowel swap touches
    // no spaces) re-sent under the same doc_ids/batch id must REFUSE:
    // under dl-only containment this passed as a replay and the new
    // text was silently never indexed
    val edited = b0.select(col("doc_id"),
      translate(col("text"), "aeiou", "eioua").as("text"))
    val e = intercept[IllegalArgumentException] {
      TextIndex.append(spark, dir, edited, batchId = 0L)
    }
    assert(e.getMessage.contains("double-count"), e.getMessage)
    assert(TextIndex.committedBatches(dir).isEmpty,
      "refused edited batch must not commit")
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)
  }

  private val zombieTok = "deadbeef-0000-4000-8000-000000000000"

  test("a BROKEN writer's late compact marker is discarded, not resumed (ADVICE r11 fencing)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtfence").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 30 && col("doc_id") < 60), batchId = 0L)
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // the verifyHeld check-then-act window: writer Z was TTL-broken,
    // then landed its marker anyway. Its staged v1 tables may be
    // interleaved with the breaker's — fabricate exactly that state:
    // an audit file carrying Z's token, Z's marker naming it in `by`,
    // and garbage staging under the next version.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "claims"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "claims", "LEASE.broken.test"), zombieTok.getBytes)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "postings_v1"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "postings_v1", "garbage.parquet"), "junk".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "meta_compact.json"),
      (s"""{"n_docs":1,"sum_dl":1,"buckets":${TextIndex.TermBuckets},""" +
        s""""pv":1,"by":"$zombieTok","folded":[0]}""").getBytes)

    // resume path must DISCARD the suspect commit (base + delta intact)
    // and rerun the fold from scratch — serving ≡ monolithic rebuild
    assert(TextIndex.compact(spark, dir) == 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_compact.json")))
    assert(TextIndex.committedBatches(dir).isEmpty)
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "fenced compact diverged from the pre-marker state")
    // and the garbage staging did not leak into the served base
    val full = java.nio.file.Files.createTempDirectory("txtfencefull").toString
    TextIndex.build(spark, full, docs.where(col("doc_id") < 60))
    assert(want == TextIndex.search(spark, full, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq)
  }

  test("a BROKEN writer's late merged marker is discarded while its inputs survive (ADVICE r11)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtmfence").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 30 && col("doc_id") < 60), batchId = 0L)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 60 && col("doc_id") < 90), batchId = 1L)
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // zombie Z's merged segment: marker names Z in `by`, Z's token is
    // in the broken audit set, and BOTH folded inputs still exist —
    // the segment content is untrustworthy (garbage here) but the
    // inputs can simply re-merge
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "claims"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "claims", "LEASE.broken.test"), zombieTok.getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      dir, "postings_delta", "ingest_batch=-1"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "postings_delta", "ingest_batch=-1", "garbage.parquet"),
      "junk".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "meta_delta_batch_-1.json"),
      s"""{"n_docs":1,"sum_dl":1,"by":"$zombieTok","folded":[0,1]}""".getBytes)

    // next maintenance: the suspect segment is discarded FIRST (inputs
    // intact), then the ordinary merge folds the two real batches
    assert(TextIndex.mergeDeltas(spark, dir) == 2)
    assert(TextIndex.committedBatches(dir) == Seq(-1L))
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "fenced merge lost or duplicated rows")
    val full = java.nio.file.Files.createTempDirectory("txtmfencefull").toString
    TextIndex.build(spark, full, docs.where(col("doc_id") < 90))
    assert(want == TextIndex.search(spark, full, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq)
  }

  test("a zombie's LATE merged marker landing after the successor re-merged is discarded (ADVICE r12)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtzlate").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 30 && col("doc_id") < 60), batchId = 0L)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 60 && col("doc_id") < 90), batchId = 1L)
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // the SUCCESSOR re-merges batches 0,1 into segment -1 and cleans up
    // their markers — the real lifecycle, run to completion
    assert(TextIndex.mergeDeltas(spark, dir) == 2)
    assert(TextIndex.committedBatches(dir) == Seq(-1L))
    assert(!EstateFs.exists(s"$dir/meta_delta_batch_0.json"),
      "precondition: the folded inputs' markers are gone")

    // NOW zombie Z's marker lands late: folded set identical to the
    // live successor segment's, Z's token in the broken audit set. The
    // old inputs-intact fence can't see it (inputs' markers are gone) —
    // without the subset arm BOTH segments would serve and every folded
    // doc's postings would double-count.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "claims"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "claims", "LEASE.broken.test"), zombieTok.getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      dir, "postings_delta", "ingest_batch=-2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "postings_delta", "ingest_batch=-2", "garbage.parquet"),
      "junk".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "meta_delta_batch_-2.json"),
      s"""{"n_docs":60,"sum_dl":1,"by":"$zombieTok","folded":[0,1]}""".getBytes)

    TextIndex.cleanupFoldedDeltas(dir)
    assert(!EstateFs.exists(s"$dir/meta_delta_batch_-2.json"),
      "zombie's late marker must be discarded by the subset arm")
    assert(TextIndex.committedBatches(dir) == Seq(-1L))
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want,
      "late-zombie discard lost or duplicated rows")
  }

  test("equal-set broken merged markers: exactly one survives the fence (ADVICE r12 tie-break)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtztie").toString
    TextIndex.build(spark, dir, docs.where(col("doc_id") < 30))
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 30 && col("doc_id") < 60), batchId = 0L)
    TextIndex.append(spark, dir,
      docs.where(col("doc_id") >= 60 && col("doc_id") < 90), batchId = 1L)
    assert(TextIndex.mergeDeltas(spark, dir) == 2)
    assert(TextIndex.committedBatches(dir) == Seq(-1L))
    val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq

    // mark the REAL segment's writer broken too, and plant a second
    // broken marker with the same folded set: the tie-break must keep
    // exactly one (max id = -1, the real segment), never discard both
    val realBy = """"by":"([0-9a-f-]+)"""".r
      .findFirstMatchIn(EstateFs.readString(s"$dir/meta_delta_batch_-1.json"))
      .get.group(1)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "claims"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "claims", "LEASE.broken.a"), realBy.getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "claims", "LEASE.broken.b"), zombieTok.getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      dir, "postings_delta", "ingest_batch=-2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      dir, "meta_delta_batch_-2.json"),
      s"""{"n_docs":60,"sum_dl":1,"by":"$zombieTok","folded":[0,1]}""".getBytes)

    TextIndex.cleanupFoldedDeltas(dir)
    assert(TextIndex.committedBatches(dir) == Seq(-1L),
      "tie-break must keep exactly the max-id segment")
    assert(!EstateFs.exists(s"$dir/meta_delta_batch_-2.json"))
    assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == want)
  }

  test("meta guards: a non-index dir fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("notidx").toString
    val e = intercept[Exception] {
      TextIndex.search(spark, dir, TextQueries.bm25Queries)
    }
    assert(e.getMessage.contains("meta.json") ||
      e.isInstanceOf[java.nio.file.NoSuchFileException])
  }
}
