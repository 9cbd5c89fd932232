import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.apdb._
import graft.geom._
spark.sparkContext.setLogLevel("WARN")
val width = spark.conf.get("spark.sql.shuffle.partitions")
val wh = s"/tmp/apdb_width$width"
def rmAll(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rmAll); f.delete() }
rmAll(new java.io.File(wh))
val cfg = ApdbConfig(warehouseDir = wh, detectionFraction = 0.9)
val apdb = new ApdbSpark(spark, cfg)
apdb.makeSchema(drop = true)
val written = new java.util.concurrent.atomic.AtomicLong()
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    written.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
})
def drain(): Unit = {
  val bus = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
  bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
}
val cat = DiaSim.genCatalog(spark, 430000000L, hemi = -1, seed = 42, slices = 0).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
cat.count()
val t0v = Timestamp.valueOf("2026-01-01 01:00:00")
val visits = VisitPipeline.visitTimes(t0v, 4, cfg.visitIntervalSec)
visits.foreach { case (offset, ts) =>
  val pointing = Generators.sphereXyz(1, hemi = -1, seed = 5000L + (offset % 3)).head
  drain()
  val w0 = written.get()
  val t0 = System.nanoTime()
  val stats = VisitPipeline.visit(apdb, cat, offset, ts, pointing, metrics = None)
  drain()
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"== visit $offset width=$width sec=$sec%.1f shuffleRecords=${written.get() - w0} objectsRead=${stats.nObjectsRead} sources=${stats.nSources} forced=${stats.nForcedSources} histSrc=${stats.historySources} histFsrc=${stats.historyForced}")
}
sys.exit(0)
