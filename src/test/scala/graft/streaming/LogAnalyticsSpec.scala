package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md A7: ~200 log lines over 3 visits, two tables, shuffled
  * within a bounded disorder window, gzip + plain variants, terminated
  * by the stop sentinel. */
class LogAnalyticsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic fixture: 3 visits × 2 tables × timers + counters. */
  private def fixtureLines: Seq[String] = {
    val rng = new scala.util.Random(99)
    val lines = for {
      visit <- 1 to 3
      (table, ti) <- Seq("DiaObject", "DiaSource").zipWithIndex
      rec <- 0 until 30
    } yield {
      val totalSec = 45 * visit + rec % 20
      val minute = 40 + totalSec / 60
      val sec = totalSec % 60
      val ms = rec * 13 % 1000
      val ts = f"2026-02-10 18:$minute%02d:$sec%02d,$ms%03d"
      val name = if (rec % 3 == 0) "select_time"
        else if (rec % 3 == 1) "insert_time" else "store_counts"
      val values = if (name == "store_counts")
        s"""{"row_count": ${100 + rec}}"""
      else s"""{"real": ${0.01 * (rec + 1)}, "user": 0.001, "sys": 0.0}"""
      s"$ts [INFO] ap_proto: tile=0x$ti visit=$visit apdb_metrics: " +
        s"""{"name": "$name", "timestamp": ${1770000000 + sec}.$ms, """ +
        s""""tags": {"visit": "$visit", "table": "$table", "tile": "$ti"}, """ +
        s""""values": $values, "source": "ap_proto"}"""
    }
    // bounded shuffle (disorder within ±5 positions, log2influx.py:98-116)
    val arr = lines.toArray
    for (i <- arr.indices) {
      val j = math.min(arr.length - 1, math.max(0, i + rng.nextInt(11) - 5))
      val t = arr(i); arr(i) = arr(j); arr(j) = t
    }
    // colorize one line: the parser must strip real ANSI escapes (ESC [..m)
    arr(0) = "\u001b[32m" + arr(0) + "\u001b[0m"
    arr.toSeq ++
      Seq("2026-02-10 18:43:00,000 [INFO] ap_proto: noise line without metrics",
        s"2026-02-10 18:43:01,000 [INFO] ap_proto: ${LogAnalytics.StopPattern}")
  }

  private def writeFixture(dir: String): String = {
    // plain and gzip in separate dirs so each can be a streaming source
    Files.createDirectories(Paths.get(dir, "plain"))
    Files.createDirectories(Paths.get(dir, "gz"))
    val plain = Paths.get(dir, "plain", "run.log")
    Files.write(plain, String.join("\n", fixtureLines: _*).getBytes)
    // gzip variant (S8: transparent gzip read through the file source)
    val gz = Paths.get(dir, "gz", "run2.log.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(String.join("\n", fixtureLines: _*).getBytes)
    out.close()
    dir
  }

  test("batch parse + visit summary + rollup + influx lines") {
    val dir = writeFixture(Files.createTempDirectory("logs").toString)
    val lines = spark.read.text(s"$dir/plain/run.log")
    val metrics = LogAnalytics.parseMetrics(lines)
    assert(metrics.count() == 180) // 3 visits × 2 tables × 30, noise dropped
    assert(metrics.where(col("ts").isNull).count() == 0)
    assert(metrics.select("visit").distinct().count() == 3)

    val summary = LogAnalytics.visitSummary(metrics).collect()
    assert(summary.length == 3)
    summary.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_records")) == 60)
      assert(r.getDouble(r.fieldIndex("sum_select_real")) > 0)
      assert(!r.isNullAt(r.fieldIndex("rows_stored")))
    }

    val rollup = LogAnalytics.timerRollup(metrics)
    val names = rollup.select("name").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("select_time", "insert_time"))

    val influx = LogAnalytics.influxLines(rollup, 1770000000000000000L)
      .collect().map(_.getString(0))
    assert(influx.nonEmpty)
    assert(influx.forall(_.matches("^\\w+,table=\\w+ n=\\d+i,avg_real=.*,total_real=.* \\d+$")))
  }

  test("visit CSV matches the reference log2csv column list exactly") {
    // pinned from /root/reference/bin.src/log2csv.py:157-188 (_cols)
    val expected = Seq("visit",
      "obj_select_real", "obj_select_cpu",
      "obj_last_delete_real", "obj_last_insert_real",
      "obj_trunc_real", "obj_trunc_cpu",
      "obj_insert_real", "obj_repl_insert_real",
      "src_select_real", "src_select_cpu",
      "src_insert_real", "src_repl_insert_real",
      "fsrc_select_real", "fsrc_select_cpu",
      "fsrc_insert_real", "fsrc_repl_insert_real",
      "sum_select_real",
      "store_real", "store_cpu",
      "tile_visit_real", "tile_visit_cpu",
      "visit_proc_real", "visit_proc_cpu",
      "visit_real", "visit_cpu",
      "obj_selected", "src_selected", "fsrc_selected", "obj_in_fov")
    assert(LogAnalytics.visitCsvCols == expected)
    val dir = writeFixture(Files.createTempDirectory("loganalytics_csv").toString)
    val metrics = LogAnalytics.parseMetrics(
      spark.read.text(s"$dir/plain"))
    val csv = LogAnalytics.visitCsv(metrics)
    assert(csv.columns.toSeq == expected)
    val rows = csv.collect()
    assert(rows.length == 3) // one row per visit
    // fixture emits select_time for DiaObject+DiaSource: means populated,
    // and sum_select_real = their sum (fsrc absent → contributes 0)
    rows.foreach { r =>
      val objSel = r.getDouble(r.fieldIndex("obj_select_real"))
      val srcSel = r.getDouble(r.fieldIndex("src_select_real"))
      assert(objSel > 0 && srcSel > 0)
      assert(r.isNullAt(r.fieldIndex("fsrc_select_real")))
      assert(math.abs(r.getDouble(r.fieldIndex("sum_select_real")) -
        (objSel + srcSel)) < 1e-12)
      assert(r.isNullAt(r.fieldIndex("obj_trunc_real"))) // never emitted
    }
  }

  test("gzip source parses identically (S8)") {
    val dir = writeFixture(Files.createTempDirectory("logs_gz").toString)
    val plain = LogAnalytics.parseMetrics(spark.read.text(s"$dir/plain/run.log"))
    val gz = LogAnalytics.parseMetrics(spark.read.text(s"$dir/gz/run2.log.gz"))
    assert(plain.count() == gz.count())
  }

  test("stdin spool parses identically (log2csv stdin parity)") {
    val dir = writeFixture(Files.createTempDirectory("logs_stdin").toString)
    val plainPath = s"$dir/plain/run.log"
    val spooled = graft.LogTool.spoolStdin(Files.newInputStream(Paths.get(plainPath)))
    val plain = LogAnalytics.parseMetrics(spark.read.text(plainPath))
    val viaStdin = LogAnalytics.parseMetrics(spark.read.text(spooled))
    assert(plain.count() == viaStdin.count() && plain.count() > 0)
  }

  test("streaming: out-of-order lines aggregate per visit under watermark") {
    val dir = writeFixture(Files.createTempDirectory("logs_stream").toString)
    val lines = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("value", org.apache.spark.sql.types.StringType))
      .text(s"$dir/plain") // streaming file source requires a directory
    val agg = LogAnalytics.streamVisitSummary(lines)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("visit_summary")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode emits only windows below the final watermark; with
    // AvailableNow the watermark advances past visits 1-2 at least
    val out = spark.sql("SELECT * FROM visit_summary").collect()
    assert(out.nonEmpty, "no visit windows emitted")
    assert(out.forall(_.getLong(4) > 0)) // n_records
    // stop sentinel present in the raw stream (T9): detectable pattern
    val sentinelSeen = spark.read.text(s"$dir/plain/run.log")
      .where(col("value").contains(LogAnalytics.StopPattern)).count()
    assert(sentinelSeen == 1)
  }

  test("stop pattern halts a follow-mode streaming query (T9)") {
    val dir = Files.createTempDirectory("logs_stop").toString
    Files.createDirectories(Paths.get(dir, "follow"))
    // initial lines without the sentinel: the query keeps following
    Files.write(Paths.get(dir, "follow", "a.log"),
      fixtureLines.filterNot(_.contains(LogAnalytics.StopPattern))
        .mkString("\n").getBytes)
    def lines = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("value", org.apache.spark.sql.types.StringType))
      .text(s"$dir/follow")
    val target = LogAnalytics.streamVisitSummary(lines)
      .writeStream.outputMode("append")
      .format("memory").queryName("follow_summary")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    val watcher = LogAnalytics.stopOnPattern(lines, target)
    try {
      // still running after the sentinel-free batch
      assert(!target.awaitTermination(3000))
      // append the stop line: the watcher must stop the target
      Files.write(Paths.get(dir, "follow", "b.log"),
        s"2026-02-10 18:44:00,000 [INFO] ap_proto: ${LogAnalytics.StopPattern}\n".getBytes)
      assert(target.awaitTermination(60000), "target did not stop on sentinel")
    } finally {
      if (target.isActive) target.stop()
      watcher.stop()
    }
  }
}
