package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** T7 tumbling metrics poll: samples accumulate on the trigger period,
  * files rotate by window, rows parse against the header. */
class MetricsMonSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("tumbling poll emits parseable samples") {
    val dir = Files.createTempDirectory("metrics_mon").toString
    val q = MetricsMon.start(spark, dir, periodSec = 1, rotateHours = 4)
    try {
      // wait for at least 2 trigger firings
      val deadline = System.currentTimeMillis() + 30000
      def lines(): Seq[String] = {
        val d = new java.io.File(dir)
        Option(d.listFiles()).getOrElse(Array.empty).toSeq
          .flatMap(f => Files.readAllLines(f.toPath).toArray.toSeq.map(_.toString))
      }
      while (lines().count(!_.startsWith("ts_millis")) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val all = lines()
      assert(all.head == MetricsMon.Header)
      val samples = all.filterNot(_.startsWith("ts_millis"))
      assert(samples.size >= 2, s"only ${samples.size} samples")
      samples.foreach { l =>
        val cols = l.split(",")
        assert(cols.length == MetricsMon.Header.split(",").length)
        assert(cols(1).toLong > 0) // heap_used
        assert(cols(4).toInt > 0) // threads
      }
    } finally q.stop()
  }

  test("rotation file keying: same window same file, next window new file") {
    val dir = "/tmp/unused_mon"
    val h4 = 4L * 3600 * 1000
    val t0 = 1770000000000L
    val inWindow = t0 / h4 * h4 + 1000
    val f1 = MetricsMon.rotatedFile(dir, inWindow, 4)
    val f2 = MetricsMon.rotatedFile(dir, inWindow + 60000, 4)
    val f3 = MetricsMon.rotatedFile(dir, inWindow + h4, 4)
    assert(f1 == f2)
    assert(f1 != f3)
  }
}
