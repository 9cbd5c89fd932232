package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.LogAnalytics

/** `log2csv` analog (`/root/reference/bin.src/log2csv.py`): parse
  * apdb_metrics records from log files (plain or .gz) and write the
  * per-visit summary CSV + per-timer rollup.
  *
  * Usage: runMain graft.LogTool <logPathOrDir> <outDir>
  */
object LogTool {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LogTool <logPathOrDir> <outDir>")
    val Array(logPath, outDir) = args.take(2)
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
