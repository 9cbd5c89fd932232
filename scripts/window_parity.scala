// Post-soak months-window parity check (VERDICT r9 #4's "result-parity
// spot-check"): on the soaked warehouse, verify that
//  (a) EARLY visit: when accumulated history is shorter than the
//      window, the windowed read equals the unbounded read row-for-row
//      (windowing loses nothing before it has anything to cut), and
//  (b) LATE visit: the windowed read equals the unbounded read
//      restricted to the window's cutoff — the window drops exactly
//      the out-of-window rows and nothing else.
// Run:
//   /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I scripts/window_parity.scala
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.apdb._
import graft.geom._
spark.sparkContext.setLogLevel("WARN")
val wh = sys.env.getOrElse("SOAK_WAREHOUSE", "/tmp/apdb_soak1000x")
val winCfg = ApdbConfigIO.fromFile("scripts/soak_windowed.cfg",
  ApdbConfig(warehouseDir = wh, detectionFraction = 0.9))
val unbCfg = winCfg.copy(readSourcesMonths = 12.0, readForcedSourcesMonths = 6.0)
val winApdb = new ApdbSpark(spark, winCfg)
val unbApdb = new ApdbSpark(spark, unbCfg)
val t0 = Timestamp.valueOf("2026-01-01 01:00:00")
val padRad = math.toRadians(winCfg.regionPaddingArcsec / 3600.0)
def check(visitId: Int): Unit = {
  val ts = new Timestamp(t0.getTime + visitId.toLong * winCfg.visitIntervalSec * 1000L)
  val pointing = Generators.sphereXyz(1, hemi = -1, seed = 5000L + (visitId % 3)).head
  val fov = Circle(pointing, winCfg.fovRad / 2).padded(padRad)
  val hist = fov.padded(padRad)
  val ids = winApdb.getDiaObjects(fov).select(col("diaObjectId")).localCheckpoint(true)
  val cutoff = unbApdb.mjd(ts) - winCfg.readSourcesMonths * 30.0
  val winRows = winApdb.getDiaSources(ids, ts, Some(hist)).collect().map(_.toString).sorted
  val unbAll = unbApdb.getDiaSources(ids, ts, Some(hist))
  val unbRows = unbAll.collect().map(_.toString).sorted
  val unbCut = unbAll.where(col("midpointMjdTai") >= cutoff).collect().map(_.toString).sorted
  val saturated = unbRows.length != unbCut.length
  println(s"@@visit $visitId: windowed=${winRows.length} unbounded=${unbRows.length} " +
    s"unbounded-cut=${unbCut.length} saturated=$saturated " +
    s"parity=${winRows.toSeq == unbCut.toSeq}" +
    (if (!saturated) s" early-parity=${winRows.toSeq == unbRows.toSeq}" else ""))
  assert(winRows.toSeq == unbCut.toSeq, s"visit $visitId: windowed != unbounded-restricted")
}
check(5)   // early: history < window -> windowed == unbounded
check(45)  // late: window saturated -> windowed == unbounded.where(cutoff)
println("@@window parity OK")
sys.exit(0)
