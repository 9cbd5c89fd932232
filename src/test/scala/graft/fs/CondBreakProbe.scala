package graft.fs

import org.apache.spark.sql.SparkSession

import graft.{EstateFs, WriterLease}

/** Cross-process probe for the conditional-create stale-lease break
  * (contention scenario G): two REAL JVMs race
  * [[graft.WriterLease.acquire]] against one planted stale lease on a
  * `faulty://` store in conditional-create mode with
  * `graft.fs.atomicRename=false` — the object-store posture the
  * round-13 break path targets. The in-JVM race (FaultyFsSpec "two
  * RACING breakers") proves the ticket arbitration between threads;
  * this probe proves it where it matters — the exclusive ticket's
  * CREATE_NEW landing arbitrated by the OS across process boundaries,
  * exactly how If-None-Match arbitrates independent writers on a real
  * object store.
  *
  * Lives in the test tree because the `faulty://` scheme is test-only;
  * `scripts/contention.sh` runs it with `target/scala-2.13/
  * test-classes` prepended to the probe classpath.
  *
  * Exit codes: 0 = acquired (prints the winning token), 3 = refused by
  * the arbitration (the designed loser outcome — either "another
  * breaker holds the break ticket" or "another writer re-acquired").
  * Any other failure exits 1.
  */
object CondBreakProbe {

  private def awaitBarrier(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    while (!java.nio.file.Files.exists(p)) Thread.sleep(100)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args(0) == "break",
      "usage: CondBreakProbe break <storeDir> <barrierFile>")
    val (dir, barrier) = (args(1), args(2))
    val pid = ProcessHandle.current().pid()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"condbreak-$pid")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(EstateFs.AtomicRenameKey, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    FaultyFileSystem.install(spark)
    FaultyFileSystem.conditionalCreate = true
    awaitBarrier(barrier)
    val fdir = s"faulty://$dir"
    try {
      val tok = WriterLease.acquire(spark, fdir,
        "contention scenario G (cross-JVM conditional-create break).")
      // deliberately NOT released: the scenario's post-checks read the
      // surviving lease file and must see the winner's token
      println(s"""{"mode":"condbreak","pid":$pid,"result":"won","token":"$tok"}""")
      spark.stop()
    } catch {
      case e: IllegalStateException =>
        val msg = Option(e.getMessage).getOrElse("")
          .replaceAll("[\"\\n]", " ").take(160)
        println(s"""{"mode":"condbreak","pid":$pid,"result":"refused","msg":"$msg"}""")
        spark.stop()
        sys.exit(3)
    }
  }
}
