package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** Crash-safety of the round-15 compaction commit protocol (ADVICE r14
  * medium): the former dynamic-partition-overwrite compaction could
  * permanently EMPTY partitions when the driver died inside commitJob —
  * maintenance wrote no intent and nothing repaired it. Both verbs now
  * stage to a side dir and commit per partition with metadata ops
  * behind an atomic maintenance intent. This spec kills the commit at
  * every protocol instant via the maintCrashHook seam and requires the
  * warehouse to converge — via the next maintenance entry AND via the
  * visit fence — with contents bit-identical to the pre-crash state. */
class MaintenanceIntentSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val pointing = Vec3(0.1, -0.2, -0.97).normalized

  private lazy val catalog = DiaSim
    .genCatalog(spark, 50000L, hemi = -1, seed = 42)
    .localCheckpoint(true)

  private val t0 = Timestamp.valueOf("2026-01-01 01:00:00")

  private def freshWarehouse(tag: String, nVisits: Int): ApdbSpark = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"apdb_maint_$tag").toString
    val apdb = new ApdbSpark(spark,
      ApdbConfig(warehouseDir = dir, transientPerVisit = 10,
        falsePerVisit = 90))
    apdb.makeSchema(drop = true)
    VisitPipeline.visitTimes(t0, nVisits).foreach { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing): Unit
    }
    apdb
  }

  /** Content fingerprint of the four compacted tables (layout-free). */
  private def contentHash(apdb: ApdbSpark): Seq[(Long, Long)] = Seq(
    apdb.objectsLast.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(diaObjectId, nDiaSources))"), lit(0L))),
    apdb.getDiaObjectsHistory.drop("validityEnd").agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(diaObjectId, validityStart))"), lit(0L))),
    apdb.sources.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(diaSourceId, diaObjectId, visit))"), lit(0L))),
    apdb.forcedSources.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(diaObjectId, visit))"), lit(0L))))
    .map { df => val r = df.head(); (r.getLong(0), r.getLong(1)) }

  private def noDebris(apdb: ApdbSpark): Unit = {
    val stray = graft.EstateFs.listNames(apdb.config.warehouseDir)
      .filter(n => n.startsWith("maint_intent_") ||
        n.startsWith(".compact_") || n.startsWith(".ctier_"))
    assert(stray.isEmpty, s"maintenance debris left behind: $stray")
  }

  private def nightCrashCase(instant: String): Unit = {
    val apdb = freshWarehouse(s"night_$instant", 3)
    val pre = contentHash(apdb)
    apdb.maintCrashHook =
      s => if (s == instant) throw new RuntimeException(s"boom:$s")
    val e = intercept[RuntimeException] { apdb.consolidateNight() }
    assert(e.getMessage == s"boom:$instant")
    apdb.maintCrashHook = _ => ()
    // the rerun recovers the crashed commit first, then finishes the job
    apdb.consolidateNight()
    assert(contentHash(apdb) === pre,
      s"consolidation crash at '$instant' + rerun changed table contents")
    noDebris(apdb)
    // every partition now holds exactly one data file
    apdb.fileCounts.foreach { case (t, n) =>
      val parts = graft.EstateFs
        .listDirNames(s"${apdb.config.warehouseDir}/$t").count(_.contains("="))
      assert(n == parts, s"$t: $n files over $parts partitions after rerun")
    }
  }

  test("consolidateNight crash after the intent write: recovery converges") {
    nightCrashCase("intent:obj_last")
  }

  test("consolidateNight crash mid-move (adds in, deletes not run): recovery converges") {
    // the duplicate window: new files moved in, replaced ones not yet
    // deleted — recovery must finish the deletes, never keep both
    nightCrashCase("moved:objects")
  }

  test("consolidateNight crash after the deletes: recovery converges") {
    nightCrashCase("deleted:sources")
  }

  test("a VISIT repairs a crashed compaction before reading (fence recovery)") {
    val apdb = freshWarehouse("fence", 2)
    val pre = contentHash(apdb)
    apdb.maintCrashHook =
      s => if (s == "moved:sources") throw new RuntimeException("boom")
    intercept[RuntimeException] { apdb.consolidateNight() }
    apdb.maintCrashHook = _ => ()
    // next pipeline visit — not a maintenance call — must repair first
    // (a half-committed sources partition would otherwise feed its
    // history read duplicate rows)
    val ts3 = VisitPipeline.visitTimes(t0, 3).last._2
    val s3 = VisitPipeline.visit(apdb, catalog, 3, ts3, pointing)
    assert(s3.nSources > 0)
    noDebris(apdb)
    // pre-crash contents are intact underneath visit 3's own appends
    assert(apdb.sources.where(col("visit") < 3).count() === pre(2)._1)
    assert(apdb.sources.where(col("visit") < 3)
      .agg(coalesce(expr("bit_xor(xxhash64(diaSourceId, diaObjectId, visit))"),
        lit(0L))).head().getLong(0) === pre(2)._2)
    assert(apdb.sources.groupBy("diaSourceId").count()
      .where(col("count") > 1).isEmpty, "duplicate rows after fence repair")
  }

  private def tierCrashCase(instant: String): Unit = {
    val apdb = freshWarehouse(s"tier_$instant", 3)
    val pre = contentHash(apdb)
    apdb.maintCrashHook =
      s => if (s == instant) throw new RuntimeException(s"boom:$s")
    intercept[RuntimeException] {
      apdb.compactFragmented(maxFilesPerPartition = 1)
    }
    apdb.maintCrashHook = _ => ()
    apdb.compactFragmented(maxFilesPerPartition = 1): Unit
    assert(contentHash(apdb) === pre,
      s"tier compaction crash at '$instant' + rerun changed table contents")
    noDebris(apdb)
    assert(apdb.sources.groupBy("diaSourceId").count()
      .where(col("count") > 1).isEmpty,
      s"tier crash at '$instant' left duplicate source rows")
  }

  test("tiered compaction crash after the intent write: recovery aborts cleanly") {
    tierCrashCase("intent:obj_last")
  }

  test("tiered compaction crash mid-move: recovery finishes the commit") {
    tierCrashCase("moved:objects")
  }

  test("tiered compaction crash after the deletes: recovery converges") {
    tierCrashCase("deleted:sources")
  }

  test("tiered compaction merges only the small-file tier") {
    val apdb = freshWarehouse("tiergrad", 3)
    val pre = contentHash(apdb)
    val wh = apdb.config.warehouseDir
    // first pass collapses the fragments of each partition to one file
    apdb.compactFragmented(maxFilesPerPartition = 1): Unit
    val afterFirst = apdb.fileCounts("sources")
    // make the tier file a GRADUATE (pretend it crossed the size bound):
    // with tierFileBytes below its size, a rerun must leave it alone
    val srcPart = graft.EstateFs.listDirNames(s"$wh/sources")
      .find(_.startsWith("mjd_bucket=")).get
    val tierFile = graft.EstateFs.listNames(s"$wh/sources/$srcPart")
      .filter(_.endsWith(".parquet"))
    assert(tierFile.size == afterFirst)
    val done = apdb.compactFragmented(maxFilesPerPartition = 0,
      tierFileBytes = 1L)
    assert(done("sources") == 0,
      "a graduated (big) file must not be re-merged")
    assert(contentHash(apdb) === pre)
  }
}
