package graft.fs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{EstateFs, TextIndex, VectorIndex, WriterLease}
import graft.queries.{Tables, TextQueries}

/** The estate protocols under a DELIBERATELY object-store-weak
  * FileSystem ([[FaultyFileSystem]]: copy+delete rename, laggy
  * listing) — proving the `graft.fs.atomicRename=false` posture
  * contract on semantics, not just API routing (VERDICT r11 #6), and
  * DEMONSTRATING the two-breaker lease race the posture gate prevents
  * (VERDICT r11 #1 / what's-wrong #1). */
class FaultyFsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    FaultyFileSystem.install(s)
    s
  }

  private def tmpFaulty(prefix: String): String =
    "faulty://" + java.nio.file.Files.createTempDirectory(prefix).toString

  private def localOf(uri: String): String = uri.stripPrefix("faulty://")

  test("TextIndex full lifecycle on faulty:// under the object-store posture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    try {
      val dir = tmpFaulty("ftxt")
      TextIndex.build(spark, dir, docs.where(col("doc_id") < 40))
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") >= 40 && col("doc_id") < 70), batchId = 0L)
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") >= 70), batchId = 1L)
      val want = TextIndex.search(spark, dir, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq
      // monolithic rebuild on plain local FS agrees
      val mono = java.nio.file.Files.createTempDirectory("ftxtmono").toString
      TextIndex.build(spark, mono, docs)
      assert(want == TextIndex.search(spark, mono, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq)
      // merge tier then full fold, all marker protocols on the weak FS
      assert(TextIndex.maintain(spark, dir,
        mergeMinBatches = 2, fullFoldRatio = 100.0) ==
        TextIndex.MaintainResult("merge", 2))
      assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq == want)
      assert(TextIndex.compact(spark, dir) == 1)
      assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq == want)
      assert(TextIndex.committedBatches(dir).isEmpty)
    } finally spark.conf.set(EstateFs.AtomicRenameKey, "true")
  }

  test("VectorIndex IVF-PQ build/serve/rebalance on faulty:// under the posture") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    try {
      val dir = tmpFaulty("fivf")
      VectorIndex.buildIvfPq(spark, dir, emb)
      val q = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val served = VectorIndex.searchIvfPq(spark, dir, q, k = 5)
        .collect().map(_.toString).toSeq
      assert(served.nonEmpty)
      VectorIndex.rebalanceIvf(spark, dir)
      assert(VectorIndex.searchIvfPq(spark, dir, q, k = 5)
        .collect().map(_.toString).toSeq.nonEmpty)
      assert(VectorIndex.ivfDrift(spark, dir) == 0.0)
    } finally spark.conf.set(EstateFs.AtomicRenameKey, "true")
  }

  test("laggy listing degrades serving to a stale-but-CONSISTENT snapshot") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    try {
      val dir = tmpFaulty("flag")
      TextIndex.build(spark, dir, docs.where(col("doc_id") < 40))
      val baseOnly = TextIndex.search(spark, dir, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq
      val cut = System.currentTimeMillis()
      Thread.sleep(50) // mtime granularity: the append lands after `cut`
      TextIndex.append(spark, dir,
        docs.where(col("doc_id") >= 40), batchId = 0L)
      val fresh = TextIndex.search(spark, dir, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq

      // the store's listing now lags: the batch's marker (just written)
      // is invisible — serving must return EXACTLY the pre-append state
      // (rows and scalars excluded together), not a torn mix
      FaultyFileSystem.listingAsOfMs = cut
      try {
        assert(TextIndex.committedBatches(dir).isEmpty,
          "lagging listing leaked the fresh marker")
        assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
          .collect().map(_.toString).toSeq == baseOnly,
          "laggy serving was not the consistent pre-append snapshot")
      } finally FaultyFileSystem.reset()

      // listing caught up → the committed batch serves again
      assert(TextIndex.search(spark, dir, TextQueries.bm25Queries)
        .collect().map(_.toString).toSeq == fresh)
    } finally {
      spark.conf.set(EstateFs.AtomicRenameKey, "true")
      FaultyFileSystem.reset()
    }
  }

  test("MetricsLog writes the reference line format against a non-file warehouse URI") {
    // before r12 the constructor's java.nio createDirectories threw on
    // any non-local warehouse and ApSim died at startup (VERDICT r11 #3)
    val dir = tmpFaulty("fmetrics")
    val log = new graft.apdb.MetricsLog(dir)
    val ts = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
    log.timer(ts, "ap_proto_visit", 3, "DiaObject", 1.25)
    log.counts(ts, "read_counts", 3, "DiaSource", 42L)
    log.close()
    val lines = EstateFs.readString(s"$dir/metrics.log").split("\n").toSeq
    assert(lines.size == 2, lines)
    assert(lines.forall(_.contains("[INFO] ap_proto: apdb_metrics: ")),
      "line shape diverged from the reference format")
    assert(lines.head.contains(""""name": "ap_proto_visit""""))
    assert(lines(1).contains(""""row_count": 42"""))
    // idempotent close
    log.close()

    // a SECOND run appends — the pre-r13 create-overwrite stream wiped
    // prior runs' lines exactly on non-local warehouses (ADVICE r12)
    val log2 = new graft.apdb.MetricsLog(dir)
    log2.counts(ts, "store_counts", 4, "DiaObject", 7L)
    log2.close()
    val lines2 = EstateFs.readString(s"$dir/metrics.log").split("\n").toSeq
    assert(lines2.size == 3,
      s"second run truncated the metrics log: $lines2")
    assert(lines2(2).contains(""""row_count": 7"""))

    // a constructed-but-never-emitting log must not touch the file —
    // its lazy stream is never forced, close() is a no-op
    val idle = new graft.apdb.MetricsLog(dir)
    idle.close()
    assert(EstateFs.readString(s"$dir/metrics.log").split("\n").length == 3,
      "idle MetricsLog wiped or touched the file on close")
  }

  test("conditional-create mode: two racing claims, exactly one wins at close (VERDICT r12 #2)") {
    val dir = tmpFaulty("fcond")
    EstateFs.mkdirs(dir)
    FaultyFileSystem.conditionalCreate = true
    try {
      val target = s"$dir/claims/CLAIM"
      // claimer A parks INSIDE close() (bytes written, object not yet
      // landed); claimer B completes a whole claim in the window; A's
      // deferred If-None-Match PUT must then LOSE, not overwrite
      val parked = new java.util.concurrent.CountDownLatch(1)
      val proceed = new java.util.concurrent.CountDownLatch(1)
      val oneShot = new java.util.concurrent.atomic.AtomicBoolean(true)
      FaultyFileSystem.conditionalClosePause = () =>
        if (oneShot.getAndSet(false)) { parked.countDown(); proceed.await() }
      var aWon = false
      val a = new Thread(() => { aWon = EstateFs.createExclusive(target, "A") })
      a.start()
      parked.await()
      val bWon = EstateFs.createExclusive(target, "B")
      proceed.countDown()
      a.join()
      assert(bWon && !aWon,
        s"expected B to land and A's deferred PUT to lose (aWon=$aWon bWon=$bWon)")
      assert(EstateFs.readString(target) == "B",
        "loser's buffered bytes overwrote the winner's claim")
    } finally FaultyFileSystem.reset()
  }

  test("stale lease BREAKS safely on a conditional-create store without atomic rename (VERDICT r12 #2)") {
    val dir = tmpFaulty("fcbreak")
    EstateFs.mkdirs(s"$dir/claims")
    val leaseLocal = java.nio.file.Paths.get(localOf(dir), "claims", "LEASE")
    java.nio.file.Files.write(leaseLocal, "stale-writer-token".getBytes)
    java.nio.file.Files.setLastModifiedTime(leaseLocal,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    FaultyFileSystem.conditionalCreate = true
    try {
      // same setup WITHOUT the capability refuses (the r11 gate) — with
      // it, the ticket-arbitrated break acquires
      val tok = WriterLease.acquire(spark, dir, "conditional break test.")
      assert(EstateFs.readString(s"$dir/claims/LEASE") == tok,
        "break did not install the breaker's token")
      val names = EstateFs.listNames(s"$dir/claims")
      val brokenFiles = names.filter(_.startsWith("LEASE.broken."))
      assert(brokenFiles.size == 1, s"audit record missing: $names")
      assert(EstateFs.readString(s"$dir/claims/${brokenFiles.head}") ==
        "stale-writer-token", "audit record must carry the broken token")
      assert(!names.exists(_.startsWith("LEASE.break.")),
        s"ticket not cleaned up: $names")
      WriterLease.release(spark, dir, tok)
    } finally {
      spark.conf.set(EstateFs.AtomicRenameKey, "true")
      FaultyFileSystem.reset()
    }
  }

  test("staleness evidence must postdate the token read (scenario-G TOCTOU)") {
    // The double-claim contention scenario G caught across real JVMs
    // (round 13): breaker A breaks the planted stale lease and
    // re-claims INSIDE breaker B's gap between its two lease reads.
    // With status-then-token, B pairs the OLD file's stale mtime with
    // A's fresh token and "legitimately" breaks A's live lease. This
    // replays that interleave deterministically: the openPause hook
    // fires when acquire reads the token and swaps in a live holder's
    // fresh lease — acquire must REFUSE and leave it untouched.
    val dir = tmpFaulty("fgtoctou")
    EstateFs.mkdirs(s"$dir/claims")
    val leaseLocal = java.nio.file.Paths.get(localOf(dir), "claims", "LEASE")
    java.nio.file.Files.write(leaseLocal, "stale-writer-token".getBytes)
    java.nio.file.Files.setLastModifiedTime(leaseLocal,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    FaultyFileSystem.conditionalCreate = true
    val swapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    FaultyFileSystem.openPause = p =>
      if (p.getName == "LEASE" && swapped.compareAndSet(false, true)) {
        // "breaker A" completes its whole break+re-claim in the gap:
        // the planted stale lease is replaced by a LIVE one (fresh
        // mtime, new token)
        java.nio.file.Files.delete(leaseLocal)
        java.nio.file.Files.write(leaseLocal, "live-holder-token".getBytes)
      }
    try {
      val e = intercept[IllegalStateException] {
        WriterLease.acquire(spark, dir, "scenario-G TOCTOU replay.")
      }
      assert(e.getMessage.contains("another writer holds"),
        s"want the live-holder refusal, got: ${e.getMessage}")
      assert(swapped.get, "the hook never fired — the replay is vacuous")
      assert(new String(java.nio.file.Files.readAllBytes(leaseLocal)) ==
        "live-holder-token", "the live holder's lease must survive")
      assert(!EstateFs.listNames(s"$dir/claims")
          .exists(_.startsWith("LEASE.broken.")),
        "no break may be recorded against a live lease")
    } finally {
      spark.conf.set(EstateFs.AtomicRenameKey, "true")
      FaultyFileSystem.reset()
    }
  }

  test("two RACING breakers on the conditional store: the ticket admits exactly one") {
    val dir = tmpFaulty("fcbrace")
    EstateFs.mkdirs(s"$dir/claims")
    val leaseLocal = java.nio.file.Paths.get(localOf(dir), "claims", "LEASE")
    java.nio.file.Files.write(leaseLocal, "stale-writer-token".getBytes)
    java.nio.file.Files.setLastModifiedTime(leaseLocal,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    FaultyFileSystem.conditionalCreate = true
    try {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, String]]()
      val threads = (0 until 4).map { _ =>
        val t = new Thread(() =>
          results.add(
            try Right(WriterLease.acquire(spark, dir, "breaker race."))
            catch { case e: IllegalStateException => Left(e.getMessage) }))
        t.start(); t
      }
      threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val wins = results.asScala.collect { case Right(t) => t }.toSeq
      assert(wins.size == 1,
        s"exactly one breaker must win, got ${wins.size}: $results")
      assert(EstateFs.readString(s"$dir/claims/LEASE") == wins.head,
        "the surviving lease must carry the single winner's token")
      WriterLease.release(spark, dir, wins.head)
    } finally {
      spark.conf.set(EstateFs.AtomicRenameKey, "true")
      FaultyFileSystem.reset()
    }
  }

  test("crashed breaker's leftover ticket: later breakers refuse with operator guidance") {
    val dir = tmpFaulty("fcticket")
    EstateFs.mkdirs(s"$dir/claims")
    val leaseLocal = java.nio.file.Paths.get(localOf(dir), "claims", "LEASE")
    java.nio.file.Files.write(leaseLocal, "stale-writer-token".getBytes)
    java.nio.file.Files.setLastModifiedTime(leaseLocal,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    FaultyFileSystem.conditionalCreate = true
    try {
      // plant the crashed breaker's ticket for THIS stale generation
      val gen = java.security.MessageDigest.getInstance("SHA-256")
        .digest("stale-writer-token".getBytes("UTF-8"))
        .take(8).map(b => "%02x".format(b & 0xff)).mkString
      java.nio.file.Files.write(java.nio.file.Paths.get(
        localOf(dir), "claims", s"LEASE.break.$gen"), "crashed".getBytes)
      val e = intercept[IllegalStateException] {
        WriterLease.acquire(spark, dir, "leftover ticket test.")
      }
      assert(e.getMessage.contains("break ticket") &&
        e.getMessage.contains(s"LEASE.break.$gen"),
        s"refusal must name the ticket: ${e.getMessage}")
    } finally {
      spark.conf.set(EstateFs.AtomicRenameKey, "true")
      FaultyFileSystem.reset()
    }
  }

  test("two breakers on a copy+delete rename BOTH claim — the race the posture gate prevents") {
    // stale lease on the weak FS
    val dir = tmpFaulty("frace")
    EstateFs.mkdirs(s"$dir/claims")
    val leaseLocal = java.nio.file.Paths.get(localOf(dir), "claims", "LEASE")
    java.nio.file.Files.write(leaseLocal, "stale-writer".getBytes)
    java.nio.file.Files.setLastModifiedTime(leaseLocal,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))

    // posture LYING (atomicRename=true on a store whose rename is
    // copy+delete): drive two racing breakers through the window —
    // breaker 1 parks between its copy and its delete; breaker 2 runs a
    // full acquire (sees the stale lease still present, breaks it too)
    val oneShot = new java.util.concurrent.atomic.AtomicBoolean(true)
    val inPause = new java.util.concurrent.CountDownLatch(1)
    val resume = new java.util.concurrent.CountDownLatch(1)
    FaultyFileSystem.renamePause = () =>
      if (oneShot.getAndSet(false)) {
        inPause.countDown()
        resume.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
      }
    var tok1: String = null
    var err1: Throwable = null
    val t1 = new Thread(() =>
      try tok1 = WriterLease.acquire(spark, dir, "race demo.")
      catch { case e: Throwable => err1 = e })
    try {
      t1.start()
      assert(inPause.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "breaker 1 never reached its rename window")
      val tok2 = WriterLease.acquire(spark, dir, "race demo.")
      resume.countDown()
      t1.join(60000)
      assert(err1 == null, s"breaker 1 failed instead of racing: $err1")
      // THE HAZARD: both breakers returned a token — two live writers
      // each believe they hold the single-writer lease (and breaker 1's
      // late delete even destroyed breaker 2's fresh lease file on its
      // way, so the store ends serialized by NOBODY)
      assert(tok1 != null && tok2 != null && tok1 != tok2,
        "expected the documented double-claim on a non-atomic rename")
    } finally {
      FaultyFileSystem.reset()
      resume.countDown()
    }

    // the SAME state under the object-store posture: the break arm is
    // disabled — a refusal with operator guidance, lease untouched
    val dir2 = tmpFaulty("frace2")
    EstateFs.mkdirs(s"$dir2/claims")
    val lease2 = java.nio.file.Paths.get(localOf(dir2), "claims", "LEASE")
    java.nio.file.Files.write(lease2, "stale-writer".getBytes)
    java.nio.file.Files.setLastModifiedTime(lease2,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WriterLease.TtlMs - 60000L))
    spark.conf.set(EstateFs.AtomicRenameKey, "false")
    try {
      val e = intercept[IllegalStateException] {
        WriterLease.acquire(spark, dir2, "race demo.")
      }
      assert(e.getMessage.contains("disabled"), e.getMessage)
      assert(java.nio.file.Files.readString(lease2) == "stale-writer")
    } finally spark.conf.set(EstateFs.AtomicRenameKey, "true")
  }
}
