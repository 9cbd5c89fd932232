package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Log-analytics pipelines — capability match for the reference's
  * `bin.src/log2csv.py` / `bin.src/log2influx.py` (SURVEY §3.3): parse
  * `apdb_metrics:` JSON records out of log lines, roll them up per
  * visit / per (timer, table), and emit CSV or influx line protocol.
  *
  * Batch and streaming share one lexer/parser (`parseMetrics`); the
  * streaming variant replaces the reference's bounded out-of-order
  * buffer (`log2influx.py:98-116`) with an event-time watermark, and its
  * ">2 open visits" eviction (`log2csv.py:334-338`) with append-mode
  * windowed aggregation.
  */
object LogAnalytics {

  /** Marker splitting the log prefix from the JSON payload
    * (`log2csv.py:322-328`). */
  val MetricsMarker = " apdb_metrics: "
  /** Stream stop sentinel (`log2csv.py:231`). */
  val StopPattern = "Stopping MPI tile processes"

  /** Metric record schema (`log2csv.py:49-60`): tags are strings,
    * values are doubles. */
  val metricSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("timestamp", DoubleType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("values", MapType(StringType, DoubleType)),
    StructField("source", StringType)))

  /** Lines → parsed metric records. Works on batch and streaming inputs.
    * Columns: ts (event time), level, name, visit, table, tile, metric
    * values map, source. ANSI-escape sequences stripped
    * (`log2csv.py:221-225`); log timestamp format
    * `2020-02-10 18:40:00,148` (C8, `log2influx.py:119-127`). */
  def parseMetrics(lines: DataFrame): DataFrame = {
    val clean = lines
      .withColumn("line", regexp_replace(col("value"), "\\u001B\\[[0-9;]*m", ""))
      .where(col("line").contains(MetricsMarker))
    clean
      .withColumn("ts_str", regexp_extract(col("line"),
        "^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3})", 1))
      .withColumn("ts",
        to_timestamp(regexp_replace(col("ts_str"), ",", "."),
          "yyyy-MM-dd HH:mm:ss.SSS"))
      .withColumn("level", regexp_extract(col("line"), "\\[(\\w+)\\]", 1))
      .withColumn("payload",
        substring_index(col("line"), MetricsMarker, -1))
      .withColumn("rec", from_json(col("payload"), metricSchema))
      .where(col("rec.name").isNotNull)
      .select(
        col("ts"), col("level"),
        col("rec.name").as("name"),
        col("rec.timestamp").as("metric_ts"),
        col("rec.tags.visit").cast("int").as("visit"),
        col("rec.tags.table").as("table"),
        col("rec.tags.tile").cast("int").as("tile"),
        col("rec.values").as("values"),
        col("rec.source").as("source"))
  }

  /** Per-visit pivot (A5/A6, `log2csv.py:94-203`): one row per visit with
    * avg real-time per named timer and summed counters, plus the derived
    * `sum_select_real`. Metric/table vocabulary per `metrics.md`. */
  def visitSummary(metrics: DataFrame): DataFrame = {
    val selectTimers = Seq("select_time")
    val real = metrics
      .withColumn("real", col("values.real"))
      .withColumn("row_count", col("values.row_count"))
    val agg = real.groupBy(col("visit"))
      .agg(
        avg(when(col("name") === "select_time" && col("table") === "DiaObject",
          col("real"))).as("obj_select_real"),
        avg(when(col("name") === "select_time" && col("table") === "DiaSource",
          col("real"))).as("src_select_real"),
        avg(when(col("name") === "select_time" && col("table") === "DiaForcedSource",
          col("real"))).as("fsrc_select_real"),
        avg(when(col("name") === "insert_time", col("real"))).as("insert_real"),
        sum(when(col("name") === "read_counts", col("row_count"))).as("rows_read"),
        sum(when(col("name") === "store_counts", col("row_count"))).as("rows_stored"),
        count(lit(1)).as("n_records"))
    agg.withColumn("sum_select_real",
        coalesce(col("obj_select_real"), lit(0.0)) +
          coalesce(col("src_select_real"), lit(0.0)) +
          coalesce(col("fsrc_select_real"), lit(0.0)))
      .orderBy(col("visit"))
  }

  /** Per-(timer, table) rollup for influx emission (A10,
    * `log2influx.py:92-95,187-294`). */
  def timerRollup(metrics: DataFrame): DataFrame = {
    metrics
      .withColumn("real", col("values.real"))
      .where(col("real").isNotNull)
      .groupBy(col("name"), col("table"))
      .agg(count(lit(1)).as("n"), sum(col("real")).as("total_real"),
        avg(col("real")).as("avg_real"), max(col("real")).as("max_real"))
      .orderBy(col("name"), col("table"))
  }

  /** Influx line-protocol formatting (S10, `log2influx.py:306-320`):
    * `measurement,table=T avg=...,n=... <ns-timestamp>`. */
  def influxLines(rollup: DataFrame, tsNanos: Long): DataFrame = {
    rollup.select(concat(
      col("name"),
      when(col("table").isNotNull, concat(lit(",table="), col("table")))
        .otherwise(lit("")),
      lit(" "),
      lit("n="), col("n"), lit("i"),
      lit(",avg_real="), col("avg_real"),
      lit(",total_real="), col("total_real"),
      lit(" "), lit(tsNanos)).as("line"))
  }

  /** Streaming per-visit aggregation: watermark tolerates out-of-order
    * lines (W4/T5 analog of the 100-line disorder buffer); append mode
    * emits a visit's row once its event-time window passes the watermark
    * (T6 analog of the >2-open-visits eviction). */
  def streamVisitSummary(lines: DataFrame, disorderTolerance: String = "30 seconds"): DataFrame = {
    parseMetrics(lines)
      .withWatermark("ts", disorderTolerance)
      .groupBy(window(col("ts"), "45 seconds").as("visit_window"), col("visit"))
      .agg(
        avg(when(col("name") === "select_time", col("values.real"))).as("select_real"),
        sum(when(col("name") === "store_counts", col("values.row_count"))).as("rows_stored"),
        count(lit(1)).as("n_records"))
      .select(col("visit_window.start").as("window_start"), col("visit"),
        col("select_real"), col("rows_stored"), col("n_records"))
  }

  /** CSV sink with once-only header (S9, `log2csv.py:206-217`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
