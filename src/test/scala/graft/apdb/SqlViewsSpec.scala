package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.geom._
import graft.plans.GraftExtensions

/** Plain-SQL access to the engine tables: registerViews + the native
  * region function + automatic pixel pruning, over a real warehouse. */
class SqlViewsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** The registered view names are session-global; serialize with the
    * other suites that bind them (sbt runs suites in parallel). */
  private def viewTest(name: String)(body: => Unit): Unit =
    test(name)(SessionViews.synchronized(body))

  viewTest("SQL over warehouse views with region_contains and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_sql").toString
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      transientPerVisit = 5, falsePerVisit = 45))
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 41)
      .localCheckpoint(true)
    val pointing = Vec3(0.1, -0.2, -0.97).normalized
    val vs = VisitPipeline.visitTimes(Timestamp.valueOf("2026-06-01 01:00:00"), 2)
    vs.foreach { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing)
    }
    apdb.registerViews()

    // plain SQL sees the tables
    val nLast = spark.sql("SELECT count(*) FROM dia_object_last").head.getLong(0)
    assert(nLast > 0)
    assert(spark.sql("SELECT count(*) FROM dia_source").head.getLong(0) > 0)

    // latest-version uniqueness through SQL
    val dups = spark.sql(
      """SELECT diaObjectId FROM dia_object_last
        |GROUP BY diaObjectId HAVING count(*) > 1""".stripMargin).count()
    assert(dups == 0)

    // region query through SQL: the rule injects pixelId ranges and the
    // result matches the facade's two-phase read + exact filter
    val region = Circle(pointing, apdb.config.fovRad / 2)
    val lit = RegionCodec.encode(region)
    val sqlDf = spark.sql(
      s"SELECT count(*) AS n FROM dia_object_last WHERE region_contains('$lit', ra, dec)")
    assert(sqlDf.queryExecution.optimizedPlan.toString
      .matches("(?s).*pixelId#\\d+L? >=.*"), "rule should have injected ranges")
    val apiCount = apdb.getDiaObjects(region)
      .where(graft.plans.SpatialFunctions.region_contains(
        region, org.apache.spark.sql.functions.col("ra"),
        org.apache.spark.sql.functions.col("dec")))
      .count()
    assert(sqlDf.head.getLong(0) == apiCount)
    assert(apiCount > 0)
  }

  viewTest("SQL pruning over an htm-indexed warehouse uses htm envelopes") {
    // the scheme-mismatch trap: an htm pixelId pruned with mq3c ranges
    // would silently drop qualifying rows. The views label the column
    // with (level, mode) metadata; the rule must compute envelopes in
    // the column's own id space and return exactly the unpruned result.
    val dir = java.nio.file.Files.createTempDirectory("apdb_sql_htm").toString
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      pixMode = "htm", transientPerVisit = 5, falsePerVisit = 45))
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 43)
      .localCheckpoint(true)
    val pointing = Vec3(-0.3, 0.2, -0.93).normalized
    val vs = VisitPipeline.visitTimes(Timestamp.valueOf("2026-07-01 01:00:00"), 2)
    vs.foreach { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing)
    }
    apdb.registerViews()

    val region = Circle(pointing, apdb.config.fovRad / 2)
    val lit = RegionCodec.encode(region)
    val sqlDf = spark.sql(
      s"SELECT count(*) AS n FROM dia_object_last WHERE region_contains('$lit', ra, dec)")
    assert(sqlDf.queryExecution.optimizedPlan.toString
      .matches("(?s).*pixelId#\\d+L? >=.*"), "rule should inject htm ranges")
    // ground truth: exact region filter over the FULL snapshot via the
    // DataFrame API — no SQL, no optimizer rule, no envelope code
    val unpruned = apdb.objectsLast
      .where(SparkGeo.containsRaDec(region,
        org.apache.spark.sql.functions.col("ra"),
        org.apache.spark.sql.functions.col("dec")))
      .count()
    assert(sqlDf.head.getLong(0) == unpruned,
      "htm-labeled pruning changed the region result")
    assert(unpruned > 0)
  }
}
