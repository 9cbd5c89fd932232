package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apdb.{ApdbConfig, ApdbSpark, Schemas, SparkGeo}
import graft.queries.{DedupQueries, Tables, TextQueries}
import graft.streaming.VectorIngest

/** The unified nightly maintenance job (VERDICT r8 #4): one call runs
  * drift-gated IVF rebalance, BM25 delta compaction, chunk retention
  * and APDB consolidation over whatever estate is present — each verb
  * fires exactly once per night's accumulated work, and serving on
  * every estate member stays correct across the pass. */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = 64

  test("nightly pass: four verbs fire exactly once, serving green throughout") {
    import spark.implicits._
    val rng = new scala.util.Random(99)

    // -- vector estate: base corpus + a drifted ingest ------------------
    val base = (0 until 300).map { i =>
      (i.toLong, Array.fill(dims)((rng.nextGaussian() / 8.0).toFloat))
    }
    val centers = Array.fill(12) {
      val v = Array.fill(dims)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val drifted = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 10).map { j =>
        (1000L + ci * 100L + j,
          c.zip(Array.fill(dims)(rng.nextGaussian() / 16.0))
            .map { case (a, b) => (a + b).toFloat })
      }
    }
    val vecDir = java.nio.file.Files.createTempDirectory("mnt_vec").toString
    val books = DedupQueries.trainPqCodebooks(
      base.take(256).map(_._2.map(f =>
        DedupQueries.scale1e6(f.toDouble))).toArray)
    VectorIndex.buildIvfPq(spark, vecDir,
      base.toDF("vec_id", "embedding"), books)
    drifted.grouped(60).zipWithIndex.foreach { case (b, i) =>
      VectorIngest.appendBatch(spark, vecDir,
        b.toSeq.toDF("vec_id", "embedding"), batchId = i.toLong, books)
    }

    // -- text estate: a big base + two SMALL delta batches (an ordinary
    // night: deltas well under FullFoldRatio of the base, so the gate
    // must pick the O(deltas) merge and leave the base files alone) ----
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val txtDir = java.nio.file.Files.createTempDirectory("mnt_txt").toString
    TextIndex.build(spark, txtDir, docs.where(col("doc_id") % 20 < 18))
    TextIndex.append(spark, txtDir,
      docs.where(col("doc_id") % 20 === 18), batchId = 1L)
    TextIndex.append(spark, txtDir,
      docs.where(col("doc_id") % 20 === 19), batchId = 2L)
    val txtWant = TextIndex.search(spark, txtDir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq
    def baseFiles(): Seq[(String, Long, Long)] = {
      val root = java.nio.file.Paths.get(txtDir, "postings")
      val s = java.nio.file.Files.walk(root)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(q => q.toString.endsWith(".parquet"))
        .map(q => (root.relativize(q).toString,
          java.nio.file.Files.size(q),
          java.nio.file.Files.getLastModifiedTime(q).toMillis))
        .toSeq.sortBy(_._1)
      finally s.close()
    }
    val txtBaseBefore = baseFiles()

    // -- apdb estate: one visit whose chunk the nightly cut expires -----
    val wh = java.nio.file.Files.createTempDirectory("mnt_apdb").toString
    val cfg = ApdbConfig(warehouseDir = wh,
      replicaChunkSeconds = 600L, replicaChunkKeepDays = 1)
    val store = new ApdbSpark(spark, cfg)
    store.makeSchema(drop = true)
    val ts1 = Timestamp.valueOf("2026-01-01 01:00:00")
    val objs = Seq((1L, 10.0, -45.0)).toDF("diaObjectId", "ra", "dec")
      .withColumn("nDiaSources", lit(1))
      .withColumn("lastNonForcedSource", lit(ts1))
      .withColumn("pixelId", SparkGeo.pixelIndexRaDec(
        cfg.pix, col("ra"), col("dec")))
    def empty(t: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t)
    store.store(ts1, objs, empty(Schemas.diaSource),
      empty(Schemas.diaForcedSource))
    val nightCut = Timestamp.valueOf("2026-01-03 01:00:00")

    // -- the nightly pass ----------------------------------------------
    val report = MaintenanceTool.runNightly(spark,
      vectorDir = Some(vecDir), textDir = Some(txtDir),
      apdbStore = Some(store), asOf = Some(nightCut),
      driftBound = 0.05)
    assert(report.ivfDrift.exists(_ > 0.05),
      s"drifted ingest did not move the metric: ${report.ivfDrift}")
    assert(report.ivfRebalanced, "drift above bound must trigger rebalance")
    assert(report.textAction == "merge",
      s"small-delta night must take the merge tier: ${report.textAction}")
    assert(report.textBatchesFolded == 2,
      s"expected 2 folded BM25 batches, got ${report.textBatchesFolded}")
    assert(baseFiles() == txtBaseBefore,
      "a small-delta night rewrote the BM25 base postings — the tier " +
        "gate must keep nightly cost proportional to new data")
    assert(report.apdbChunksDropped("DiaObjectChunks") == 1,
      s"expected the expired chunk dropped: ${report.apdbChunksDropped}")
    assert(report.apdbTablesConsolidated)
    assert(report.json.contains("\"ivf_rebalanced\":true"))
    // the nightly budget decomposes per verb in the log line (r10):
    // all four verbs timed, the rebalancing night's ivf term dominant
    assert(Seq("ivf", "text", "retention", "consolidate")
      .forall(report.verbSecs.contains), s"verbs: ${report.verbSecs.keys}")
    assert(report.json.contains("\"verb_secs\":{\"consolidate\":"))
    assert(report.verbSecs("ivf") > 0.0)

    // -- serving green on every estate member ---------------------------
    // vector: the consolidated index serves a drifted id as its own top
    // candidate with full probes, and the stream tables are folded
    val probe = drifted.head
    val top = VectorIndex.searchIvfPq(spark, vecDir,
      Seq((probe._1, probe._2)).toDF("query_id", "embedding"), k = 1,
      probes = DedupQueries.IvfClusters)
      .select("cand_id").as[Long].collect()
    assert(top.headOption.contains(probe._1))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(vecDir, "ivf_codes_stream")))
    // text: byte-identical rankings after the fold
    assert(TextIndex.search(spark, txtDir, TextQueries.bm25Queries)
      .collect().map(_.toString).toSeq == txtWant)
    // apdb: object still served from the consolidated snapshot
    assert(store.objectsLast.count() == 1)

    // -- a second night with no new work: every verb no-ops -------------
    val again = MaintenanceTool.runNightly(spark,
      vectorDir = Some(vecDir), textDir = Some(txtDir),
      apdbStore = Some(store), asOf = Some(nightCut),
      driftBound = 0.05)
    assert(!again.ivfRebalanced,
      s"rebalance re-fired on a fresh layout (drift ${again.ivfDrift})")
    assert(again.textAction == "none" && again.textBatchesFolded == 0,
      s"second night re-consolidated the lone merged segment: ${again.textAction}")
    assert(again.apdbChunksDropped.values.forall(_ == 0L))
  }

  test("maintain GCs lease-audit debris beyond retention, keeps fresh records") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mnt_gc").toString
    TextIndex.build(spark, dir,
      Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text"))
    val claims = new java.io.File(s"$dir/claims")
    claims.mkdirs()
    def plant(name: String, ageMs: Long): java.io.File = {
      val f = new java.io.File(claims, name)
      java.nio.file.Files.write(f.toPath, "dead-token".getBytes("UTF-8"))
      assert(f.setLastModified(System.currentTimeMillis() - ageMs))
      f
    }
    val eightDays = 8L * 24 * 3600 * 1000
    val oldBroken = plant("LEASE.broken.old-record", eightDays)
    val oldTicket = plant("LEASE.break.deadbeef01", eightDays)
    val freshBroken = plant("LEASE.broken.fresh-record", 60 * 1000L)
    TextIndex.maintain(spark, dir)
    // beyond AuditRetentionMs (7 days): broken record AND orphan break
    // ticket retired; inside the window: kept (the by-marker commit
    // fencing still needs it)
    assert(!oldBroken.exists(), "8-day-old broken record not GC'd")
    assert(!oldTicket.exists(), "8-day-old orphan break ticket not GC'd")
    assert(freshBroken.exists(), "in-retention broken record was GC'd")
    // maintain released its own lease as usual
    assert(!new java.io.File(claims, "LEASE").exists())
    // the direct API reports what it removed
    val again = plant("LEASE.broken.old2", eightDays)
    assert(WriterLease.gcAuditRecords(spark, dir) === 1)
    assert(!again.exists() && freshBroken.exists())
  }

  test("apdb estate without a nightly cut refuses loudly") {
    val wh = java.nio.file.Files.createTempDirectory("mnt_req").toString
    val store = new ApdbSpark(spark, ApdbConfig(warehouseDir = wh))
    val e = intercept[IllegalArgumentException] {
      MaintenanceTool.runNightly(spark, apdbStore = Some(store))
    }
    assert(e.getMessage.contains("asOf"))
  }
}
