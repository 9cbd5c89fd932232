package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.LogAnalytics

/** `log2csv` analog (`/root/reference/bin.src/log2csv.py`): parse
  * apdb_metrics records from log files (plain or .gz) and write the
  * per-visit summary CSV + per-timer rollup.
  *
  * Usage: runMain graft.LogTool <logPathOrDir|-> <outDir>
  *
  * `-` reads the log from stdin (`log2csv.py:307-319` parity): lines are
  * spooled to a temp file first — stdin is inherently single-reader, the
  * spool makes the parse/aggregate phase distributed like any file run.
  */
object LogTool {
  /** Spool stdin to a temp file Spark can read in parallel. */
  private[graft] def spoolStdin(in: java.io.InputStream): String = {
    val tmp = java.nio.file.Files.createTempFile("logtool_stdin", ".log")
    java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LogTool <logPathOrDir|-> <outDir>")
    val Array(rawPath, outDir) = args.take(2)
    val logPath = if (rawPath == "-") spoolStdin(System.in) else rawPath
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // parse once: four downstream actions would otherwise re-read and
    // re-parse (regex + from_json) the whole log per action
    val metrics = LogAnalytics.parseMetrics(spark.read.text(logPath))
      .localCheckpoint(true)
    val rollup = LogAnalytics.timerRollup(metrics).localCheckpoint(true)
    // visits/: the reference's exact log2csv column set; visits_compact/:
    // the engine's shorter summary (log2csv -s analog)
    LogAnalytics.writeCsv(LogAnalytics.visitCsv(metrics), s"$outDir/visits")
    LogAnalytics.writeCsv(LogAnalytics.visitSummary(metrics), s"$outDir/visits_compact")
    LogAnalytics.writeCsv(LogAnalytics.queryCounters(metrics), s"$outDir/query_counters")
    LogAnalytics.writeCsv(rollup, s"$outDir/timers")
    val influx = LogAnalytics.influxLines(
      rollup, System.currentTimeMillis() * 1000000L)
    influx.coalesce(1).write.mode("overwrite").text(s"$outDir/influx")
    println(s"""{"metrics":${metrics.count()},"out":"$outDir"}""")
    spark.stop()
  }
}
