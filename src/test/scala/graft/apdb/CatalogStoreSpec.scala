package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** The persisted pixel-bucketed catalog (VERDICT r7 #1): the FOV-pruned
  * read must (a) actually prune bucket partitions in the plan, (b) be a
  * superset of the exact cone so the DIA cone filter sees the same rows
  * as a full-catalog scan, and (c) leave the visit pipeline's results
  * byte-identical to the in-memory-catalog path. */
class CatalogStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val pointing = Vec3(0.1, -0.2, -0.97).normalized

  private def freshWarehouse(tag: String): (String, ApdbConfig) = {
    val dir = java.nio.file.Files.createTempDirectory(s"catstore_$tag").toString
    (dir, ApdbConfig(warehouseDir = dir,
      transientPerVisit = 10, falsePerVisit = 90))
  }

  test("FOV read: pruned partitions, cone-equivalent rows, scheme guard") {
    val (dir, cfg) = freshWarehouse("fov")
    val catalog = DiaSim.genCatalog(spark, 200000L, hemi = -1, seed = 42)
      .localCheckpoint(true)
    val n = CatalogStore.write(spark, catalog, dir, cfg)
    assert(n == catalog.count())

    val region = Circle(pointing, cfg.fovRad / 2)
      .padded(math.toRadians(cfg.regionPaddingArcsec / 3600.0))
    val pruned = CatalogStore.readFov(spark, dir, region, cfg)

    // (a) the scan must carry a pix_bucket partition filter and open a
    // strict subset of the written bucket dirs
    val scans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata("PartitionFilters").contains("pix_bucket"),
      "catalog scan carries no pix_bucket partition filter")
    val total = new java.io.File(CatalogStore.dir(dir)).listFiles()
      .count(_.getName.startsWith("pix_bucket="))
    val opened = scans.head.selectedPartitions.partitionCount
    assert(opened < total,
      s"FOV read opened $opened of $total buckets — no pruning")

    // (b) cone-filtering the pruned superset == cone-filtering the full
    // catalog (the envelope is a true superset of the cone)
    val a = pointing
    val cosHalf = math.cos(cfg.fovRad / 2)
    def cone(df: org.apache.spark.sql.DataFrame) = df
      .where(col("x") * a.x + col("y") * a.y + col("z") * a.z >= cosHalf)
      .select("sourceIdx").collect().map(_.getLong(0)).sorted.toSeq
    assert(cone(pruned) == cone(catalog))
    assert(cone(pruned).nonEmpty)

    // (c) a mismatched pixel scheme must refuse, not silently misprune
    val wrong = cfg.copy(pixLevel = 7)
    intercept[IllegalArgumentException] {
      CatalogStore.readFov(spark, dir, region, wrong)
    }
  }

  test("shuffle-free write (coLocate=false) serves the same FOV rows") {
    val (dirA, cfgA) = freshWarehouse("shufA")
    val (dirB, cfgB) = freshWarehouse("shufB")
    val catalog = DiaSim
      .genCatalog(spark, 100000L, hemi = -1, seed = 7, slices = 8)
      .localCheckpoint(true)
    CatalogStore.write(spark, catalog, dirA, cfgA)
    CatalogStore.write(spark, catalog, dirB, cfgB, coLocate = false)
    val region = Circle(pointing, cfgA.fovRad / 2)
    def rows(d: String, c: ApdbConfig) =
      CatalogStore.readFov(spark, d, region, c)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(dirA, cfgA) == rows(dirB, cfgB))
    assert(rows(dirA, cfgA).nonEmpty)
  }

  test("visit pipeline over the pruned read matches the cached-catalog run") {
    val (dirA, cfgA) = freshWarehouse("mem")
    val (dirB, cfgB) = freshWarehouse("persist")
    val catalog = DiaSim.genCatalog(spark, 200000L, hemi = -1, seed = 42)
      .localCheckpoint(true)
    CatalogStore.write(spark, catalog, dirB, cfgB)
    val apdbA = new ApdbSpark(spark, cfgA); apdbA.makeSchema(drop = true)
    val apdbB = new ApdbSpark(spark, cfgB); apdbB.makeSchema(drop = false)
    val padRad = math.toRadians(cfgB.regionPaddingArcsec / 3600.0)
    val t0 = Timestamp.valueOf("2026-01-01 01:00:00")
    val visits = VisitPipeline.visitTimes(t0, 3)

    val statsA = visits.map { case (id, ts) =>
      VisitPipeline.visit(apdbA, catalog, id, ts, pointing)
    }
    val statsB = visits.map { case (id, ts) =>
      val fov = CatalogStore.readFov(spark, dirB,
        Circle(pointing, cfgB.fovRad / 2).padded(padRad), cfgB)
      VisitPipeline.visit(apdbB, fov, id, ts, pointing)
    }
    assert(statsA == statsB,
      "per-visit stats diverged between cached and persisted-pruned catalog")

    // the stored snapshots agree row-for-row
    def snap(apdb: ApdbSpark) = apdb.objectsLast
      .select("diaObjectId", "nDiaSources")
      .collect().map(_.toString).sorted.toSeq
    assert(snap(apdbA) == snap(apdbB))
  }
}
