package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apdb._
import graft.geom.Vec3

class VisitStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming visit loop processes ticks through the full pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_stream").toString
    val cfg = ApdbConfig(warehouseDir = dir,
      transientPerVisit = 5, falsePerVisit = 45)
    val apdb = new ApdbSpark(spark, cfg)
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 17)
      .localCheckpoint(true)

    val seen = new ConcurrentLinkedQueue[VisitPipeline.VisitStats]()
    val q = VisitStream.start(apdb, catalog,
      Timestamp.valueOf("2026-04-01 01:00:00"), rowsPerSecond = 2L,
      onVisit = seen.add(_))
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (seen.size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
    } finally q.stop()

    assert(seen.size >= 3, s"only ${seen.size} visits processed")
    val stats = seen.toArray(Array.empty[VisitPipeline.VisitStats]).sortBy(_.visitId)
    // visit ids strictly sequential from 1 (driven by persisted state)
    assert(stats.map(_.visitId).take(3).toSeq == Seq(1, 2, 3))
    stats.foreach(s => assert(s.nSources > 0))
    // state advanced on the 45 s event-time grid, night-time only
    val st = VisitPipeline.VisitStateStore.read(dir).get
    assert(st.visitId == stats.last.visitId)
    val h = (st.visitTimeMillis / 3600000L) % 24
    assert(h < 6 || h >= 20)
    // stored data consistent with processed visits
    assert(apdb.sources.select("visit").distinct().count() == stats.length)
  }
}
