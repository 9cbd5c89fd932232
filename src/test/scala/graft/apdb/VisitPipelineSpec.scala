package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** t1 end-to-end smoke: N visits of the SURVEY §3.1 pipeline on a tiny
  * synthetic sky, asserting the reference's own invariants (SURVEY §5):
  * per-visit counts, ID determinism/uniqueness, nDiaSources growth,
  * latest-version uniqueness, 30-day forced cutoff, resume state. */
class VisitPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshApdb(tag: String): ApdbSpark = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"apdb_$tag").toString
    val cfg = ApdbConfig(warehouseDir = dir,
      transientPerVisit = 10, falsePerVisit = 90)
    val apdb = new ApdbSpark(spark, cfg)
    apdb.makeSchema(drop = true)
    apdb
  }

  private val pointing = Vec3(0.1, -0.2, -0.97).normalized // southern sky

  test("three visits: counts, matching, snapshot and history invariants") {
    val apdb = freshApdb("t1")
    val catalog = DiaSim.genCatalog(spark, 200000L, hemi = -1, seed = 42)
      .localCheckpoint(true)
    val t0 = Timestamp.valueOf("2026-01-01 01:00:00")
    val visits = VisitPipeline.visitTimes(t0, 3)

    val stats = visits.map { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing)
    }

    // per-visit detections present, transients Poisson-ish around 100
    stats.foreach { s =>
      assert(s.nSources > 0, s"visit ${s.visitId} produced no sources")
      assert(s.nTransients > 50 && s.nTransients < 200)
    }

    // visit 1 sees an empty store; later visits read objects back
    assert(stats.head.nObjectsRead == 0)
    assert(stats(1).nObjectsRead > 0)
    assert(stats(1).nObjectsFiltered <= stats(1).nObjectsRead)

    // snapshot: exactly one latest version per object
    val last = apdb.objectsLast
    assert(last.groupBy("diaObjectId").count().where(col("count") > 1).isEmpty)

    // re-detected variables accumulate nDiaSources (same pointing all 3
    // visits → catalog variables detected every visit)
    val maxN = last.agg(max("nDiaSources")).head().getInt(0)
    assert(maxN == 3, s"expected some object with 3 detections, got $maxN")

    // version history: complete, validity intervals well-formed (W3)
    val hist = apdb.getDiaObjectsHistory
    val badIntervals = hist.where(col("validityEnd").isNotNull &&
      col("validityEnd") <= col("validityStart")).count()
    assert(badIntervals == 0)

    // sources table: appended counts add up; IDs unique and deterministic
    val srcCount = apdb.sources.count()
    assert(srcCount == stats.map(_.nSources).sum)
    assert(apdb.sources.select("diaSourceId").distinct().count() == srcCount)

    // transient IDs allocated monotonically from the high-water mark
    val transIds = apdb.sources
      .where(col("diaObjectId") >= Schemas.TransientStartId)
      .select("diaObjectId").distinct().count()
    val state = VisitPipeline.VisitStateStore.read(apdb.config.warehouseDir).get
    assert(state.lastObjectId == Schemas.TransientStartId - 1 + transIds)
    assert(state.visitId == 3)

    // history reads saw prior visits' sources by the last visit
    assert(stats(2).historySources > 0)
  }

  test("forced photometry: eligible = known, not re-detected, fresh") {
    val apdb = freshApdb("forced")
    val catalog = DiaSim.genCatalog(spark, 200000L, hemi = -1, seed = 7)
      .localCheckpoint(true)
    val t0 = Timestamp.valueOf("2026-02-01 01:00:00")

    // visit 1 at pointing A; visit 2 at disjoint pointing B; visit 3 back
    // at A → objects from visit 1 (nDiaSources 1) aren't eligible; after
    // visit 3 re-detection they have nDiaSources 2, so a visit-4 at B
    // forces photometry on them
    val pointA = pointing
    val pointB = Mat3.aboutAxis(Vec3.xAxis, math.toRadians(30))(pointing)
    val vs = VisitPipeline.visitTimes(t0, 4)
    val s1 = VisitPipeline.visit(apdb, catalog, vs(0)._1, vs(0)._2, pointA)
    val s2 = VisitPipeline.visit(apdb, catalog, vs(1)._1, vs(1)._2, pointB)
    val s3 = VisitPipeline.visit(apdb, catalog, vs(2)._1, vs(2)._2, pointA)
    val s4 = VisitPipeline.visit(apdb, catalog, vs(3)._1, vs(3)._2, pointB)

    // visit 2 saw no prior objects at B → no forced rows from A-region
    // (A-objects aren't in the B envelope at all)
    assert(s2.nForcedSources == 0)
    // visit 4: A-objects still not in B envelope; B-objects from visit 2
    // were re-detected? no — they're detected again at same pointing →
    // they ARE in newSources, so anti-join removes them. Forced rows can
    // only come from B-envelope objects absent this visit: transients
    // from visit 2 with nDiaSources == 1 are filtered by n > 1 → expect 0
    assert(s4.nForcedSources == 0)
    // now verify the positive path directly: after visit 3, A-objects
    // have nDiaSources == 2; a hypothetical empty-detection visit at A
    // must force-photometer them
    val latest = apdb.getDiaObjects(Circle(pointA, apdb.config.fovRad / 2))
    val eligible = latest.where(col("nDiaSources") > 1).count()
    assert(eligible > 0)

    // forced rows were appended for re-detections? verify table exists
    // shape-wise (may be empty): schema stable
    assert(apdb.forcedSources.columns.toSet ==
      Schemas.diaForcedSource.fieldNames.toSet)
  }

  test("telemetry loop: pipeline metrics reconstruct the reference CSV") {
    val apdb = freshApdb("telemetry")
    val log = new MetricsLog(apdb.config.warehouseDir)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 42)
      .localCheckpoint(true)
    val t0 = Timestamp.valueOf("2026-01-01 01:00:00")
    VisitPipeline.visitTimes(t0, 2).foreach { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing, metrics = Some(log))
    }
    val metrics = graft.streaming.LogAnalytics.parseMetrics(
      spark.read.text(s"${apdb.config.warehouseDir}/metrics.log"))
    val csv = graft.streaming.LogAnalytics.visitCsv(metrics).collect()
    assert(csv.length == 2)
    csv.foreach { r =>
      // engine-run visits populate selects, inserts, store and visit
      // timers plus the read counters
      Seq("obj_select_real", "src_select_real", "fsrc_select_real",
        "obj_insert_real", "obj_last_insert_real", "src_insert_real",
        "obj_repl_insert_real", "src_repl_insert_real",
        "sum_select_real", "store_real", "tile_visit_real",
        "visit_proc_real", "visit_real").foreach { c =>
        assert(!r.isNullAt(r.fieldIndex(c)), s"$c should be populated")
        assert(r.getDouble(r.fieldIndex(c)) >= 0.0)
      }
      assert(!r.isNullAt(r.fieldIndex("obj_selected")))
      assert(!r.isNullAt(r.fieldIndex("obj_in_fov")))
    }
    // query fan-out counters from getDiaObjects envelope math
    val qc = graft.streaming.LogAnalytics.queryCounters(metrics).collect()
    assert(qc.length == 2) // one DiaObject row per visit
    qc.foreach { r =>
      assert(r.getLong(r.fieldIndex("num_queries")) >= 1)
      assert(r.getLong(r.fieldIndex("num_sp_part")) >= 1)
    }
  }

  test("facade round-trips client-convention catalogs (README renames)") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_afw").toString
    val apdb = new ApdbSpark(spark,
      ApdbConfig(warehouseDir = dir, clientNaming = true))
    apdb.makeSchema(drop = true)
    import spark.implicits._
    val ts = Timestamp.valueOf("2026-01-01 01:00:00")
    val pix = apdb.config.pix
    // client-convention DiaObject catalog: id / coord_ra / coord_dec
    val objs = Seq((1L, 10.0, -45.0), (2L, 10.2, -45.1)).toDF(
      "id", "coord_ra", "coord_dec")
      .withColumn("nDiaSources", org.apache.spark.sql.functions.lit(1))
      .withColumn("lastNonForcedSource", org.apache.spark.sql.functions.lit(ts))
      .withColumn("pixelId", graft.apdb.SparkGeo.pixelIndexRaDec(
        pix, col("coord_ra"), col("coord_dec")))
    // client-convention DiaSource catalog incl. parent
    val srcs = Seq((100L, 1L, 10.0, -45.0, 0L)).toDF(
      "id", "diaObjectId", "coord_ra", "coord_dec", "parent")
      .withColumn("visit", org.apache.spark.sql.functions.lit(1))
      .withColumn("detector", org.apache.spark.sql.functions.lit(0))
      .withColumn("psFlux", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("psFluxErr", org.apache.spark.sql.functions.lit(0.01))
      .withColumn("midpointMjdTai", org.apache.spark.sql.functions.lit(apdb.mjd(ts)))
      .withColumn("pixelId", graft.apdb.SparkGeo.pixelIndexRaDec(
        pix, col("coord_ra"), col("coord_dec")))
    val fsrcs = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.diaForcedSource)
    apdb.store(ts, objs, srcs, fsrcs)

    // reads come back in client convention
    val got = apdb.getDiaObjects(Circle(Vec3.fromRaDec(10.0, -45.0),
      math.toRadians(2)))
    assert(got.columns.contains("id") && got.columns.contains("coord_ra") &&
      got.columns.contains("coord_dec") && !got.columns.contains("diaObjectId"))
    assert(got.count() == 2)
    val hist = apdb.getDiaSources(got.select(col("id")), ts)
    assert(hist.columns.contains("id") && hist.columns.contains("parent") &&
      !hist.columns.contains("diaSourceId"))
    assert(hist.count() == 1)
  }

  test("config override file: reference pex.config names load") {
    val f = java.nio.file.Files.createTempFile("apdb_cfg", ".py")
    java.nio.file.Files.writeString(f,
      """# ap_proto-style overrides
        |config.FOV_deg = 1.76
        |config.detector_region_padding = 26.0
        |config.transient_per_visit = 50
        |config.forced_cutoff_days = 15
        |config.replica_chunk_keep_days = 7
        |clientNaming = true
        |""".stripMargin)
    val cfg = ApdbConfigIO.fromFile(f.toString,
      ApdbConfig(warehouseDir = "/tmp/x"))
    assert(cfg.fovDeg == 1.76)
    assert(cfg.regionPaddingArcsec == 26.0)
    assert(cfg.transientPerVisit == 50.0)
    assert(cfg.forcedCutoffDays == 15)
    assert(cfg.replicaChunkKeepDays == 7)
    assert(cfg.clientNaming)
    // unknown keys fail loudly
    intercept[IllegalArgumentException] {
      ApdbConfigIO.fromLines(Seq("no_such_knob = 1"), cfg)
    }
  }

  test("pixelization scheme is pluggable: htm visits match mq3c results") {
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 42)
      .localCheckpoint(true)
    val t0 = Timestamp.valueOf("2026-01-01 01:00:00")
    val visits = VisitPipeline.visitTimes(t0, 2)
    def run(mode: String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"apdb_$mode").toString
      val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
        pixMode = mode, transientPerVisit = 10, falsePerVisit = 90))
      apdb.makeSchema(drop = true)
      visits.map { case (id, ts) =>
        VisitPipeline.visit(apdb, catalog, id, ts, pointing)
      }
    }
    val mq3c = run("mq3c")
    val htm = run("htm")
    // same detections, same exact-filtered reads and stores; only the
    // envelope SUPERSET (nObjectsRead) may differ between schemes
    mq3c.zip(htm).foreach { case (a, b) =>
      assert(a.nObjectsFiltered == b.nObjectsFiltered)
      assert(a.nSources == b.nSources)
      assert(a.nForcedSources == b.nForcedSources)
      assert(a.nTransients == b.nTransients)
      assert(a.historySources == b.historySources)
      assert(a.historyForced == b.historyForced)
    }
    // the superset property still holds for htm
    htm.foreach(s => assert(s.nObjectsRead >= s.nObjectsFiltered))
  }

  test("source-read duty cycle skips history reads on schedule") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_duty").toString
    // period 2, duty 0.5: reads iff visit % 2 < 1, i.e. even visits only
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      srcReadPeriod = 2, srcReadDutyCycle = 0.5,
      transientPerVisit = 10, falsePerVisit = 90))
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 42)
      .localCheckpoint(true)
    val t0 = Timestamp.valueOf("2026-01-01 01:00:00")
    val stats = VisitPipeline.visitTimes(t0, 4).map { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing)
    }
    // odd visits (1, 3) skip history reads entirely
    assert(stats(0).historySources == 0 && stats(0).historyForced == 0)
    assert(stats(2).historySources == 0 && stats(2).historyForced == 0)
    // visit 4 revisits a populated store and does read history
    assert(stats(3).historySources > 0)
  }

  test("fill_empty_fields widens partial client catalogs; pixelId derived") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_fill").toString
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      fillEmptyFields = true))
    apdb.makeSchema(drop = true)
    import spark.implicits._
    val ts = Timestamp.valueOf("2026-01-01 01:00:00")
    // partial DiaObject catalog: science columns only — no pixelId, no
    // nDiaSources/lastNonForcedSource
    val objs = Seq((1L, 10.0, -45.0), (2L, 10.2, -45.1))
      .toDF("diaObjectId", "ra", "dec")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.diaSource)
    val emptyF = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.diaForcedSource)
    apdb.store(ts, objs, empty, emptyF)
    val stored = apdb.objectsLast.collect()
    assert(stored.length == 2)
    stored.foreach { r =>
      // db-owned index computed from ra/dec
      val expected = apdb.config.skyPix.index(
        Vec3.fromRaDec(r.getDouble(r.fieldIndex("ra")),
          r.getDouble(r.fieldIndex("dec"))))
      assert(r.getLong(r.fieldIndex("pixelId")) == expected)
      // random-filled missing columns are present and typed
      assert(!r.isNullAt(r.fieldIndex("nDiaSources")))
      assert(!r.isNullAt(r.fieldIndex("lastNonForcedSource")))
    }
  }

  test("resume: state survives restart and IDs continue") {
    val apdb = freshApdb("resume")
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 9)
      .localCheckpoint(true)
    val t0 = Timestamp.valueOf("2026-03-01 01:00:00")
    val vs = VisitPipeline.visitTimes(t0, 2)
    VisitPipeline.visit(apdb, catalog, vs(0)._1, vs(0)._2, pointing)
    val st1 = VisitPipeline.VisitStateStore.read(apdb.config.warehouseDir).get
    // "restart": new facade over the same warehouse
    val apdb2 = new ApdbSpark(spark, apdb.config)
    VisitPipeline.visit(apdb2, catalog, vs(1)._1, vs(1)._2, pointing)
    val st2 = VisitPipeline.VisitStateStore.read(apdb.config.warehouseDir).get
    assert(st2.visitId == 2)
    assert(st2.lastObjectId >= st1.lastObjectId)
    // no transient ID collisions across the restart
    val ids = apdb2.sources.where(col("diaObjectId") >= Schemas.TransientStartId)
      .groupBy("diaObjectId")
      .agg(countDistinct("visit").as("nv"), count(lit(1)).as("n"))
    // each transient id appears in exactly one visit
    assert(ids.where(col("nv") > 1).isEmpty)
  }

  test("resume refuses a state persisted under an older TransientStartId") {
    val apdb = freshApdb("resume_old_const")
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 9)
      .localCheckpoint(true)
    // a warehouse written under the reference's 1e9 constant: its
    // counter sits far below the current TransientStartId, so resuming
    // would allocate still-colliding ids and misclassify old transients
    VisitPipeline.VisitStateStore.write(apdb.config.warehouseDir,
      VisitPipeline.VisitState(3, 0L, 1000000005L, 3000000L))
    val t = Timestamp.valueOf("2026-03-01 01:00:00")
    val e = intercept[IllegalArgumentException] {
      VisitPipeline.visit(apdb, catalog, 4, t, pointing)
    }
    assert(e.getMessage.contains("TransientStartId"),
      s"guard must name the id-space constant: ${e.getMessage}")
  }

  test("T8 retention drops expired replica chunks and times the delete") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_t8").toString
    val cfg = ApdbConfig(warehouseDir = dir,
      replicaChunkSeconds = 600L, replicaChunkKeepDays = 1)
    val apdb = new ApdbSpark(spark, cfg)
    apdb.makeSchema(drop = true)
    import spark.implicits._
    def objsAt(id: Long, ts: Timestamp) =
      Seq((id, 10.0, -45.0)).toDF("diaObjectId", "ra", "dec")
        .withColumn("nDiaSources", lit(1))
        .withColumn("lastNonForcedSource", lit(ts))
        .withColumn("pixelId", SparkGeo.pixelIndexRaDec(
          cfg.pix, col("ra"), col("dec")))
    def empty(t: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t)
    val metrics = new MetricsLog(dir)
    val ts1 = Timestamp.valueOf("2026-01-01 01:00:00")
    val ts2 = Timestamp.valueOf("2026-01-03 01:00:00") // keep window passed
    apdb.attachMetrics(metrics, 1, ts1)
    apdb.store(ts1, objsAt(1L, ts1),
      empty(Schemas.diaSource), empty(Schemas.diaForcedSource))
    apdb.detachMetrics()
    val chunkDir = new java.io.File(s"$dir/obj_chunks")
    val chunk1 = ts1.getTime / 1000 / cfg.replicaChunkSeconds
    assert(chunkDir.listFiles()
      .exists(_.getName == s"apdb_replica_chunk=$chunk1"))
    apdb.attachMetrics(metrics, 2, ts2)
    apdb.store(ts2, objsAt(2L, ts2),
      empty(Schemas.diaSource), empty(Schemas.diaForcedSource))
    apdb.detachMetrics()
    val partIds = chunkDir.listFiles()
      .filter(_.getName.startsWith("apdb_replica_chunk="))
      .map(_.getName.stripPrefix("apdb_replica_chunk=").toLong)
    assert(!partIds.contains(chunk1), "expired chunk must be dropped")
    assert(partIds.nonEmpty, "the live chunk must survive")
    val log = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metrics.log"))
    assert(log.contains("\"name\": \"delete_time\""))
    assert(log.contains("chunks_dropped"))
  }
}
