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

  /** The reference's full visit-CSV column list, in order
    * (`log2csv.py:157-188` `_cols`). */
  val visitCsvCols: Seq[String] = Seq(
    "visit",
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

  /** Schema-compatible per-visit pivot of `log2csv.py`: exactly
    * [[visitCsvCols]], with the reference's semantics — per-column mean
    * over the visit's records (`_Stat`), `sum_select_real` as the sum of
    * the non-null select means, NULL where a backend never emitted the
    * metric. Column → (metric, table) mapping per `_parse_timers`'
    * table_map/metrics_map; counters per `_parse_select_count`. */
  def visitCsv(metrics: DataFrame): DataFrame = {
    val real = col("values")("real")
    val cpu = col("values")("user") + col("values")("sys")
    // (column prefix, metric name, table tag or null = any, both real+cpu?)
    val timers: Seq[(String, String, String, Boolean)] = Seq(
      ("obj_select", "select_time", "DiaObject", true),
      ("obj_last_delete", "delete_time", "DiaObjectLast", false),
      ("obj_last_insert", "insert_time", "DiaObjectLast", false),
      ("obj_trunc", "truncate_time", "DiaObject", true),
      ("obj_insert", "insert_time", "DiaObject", false),
      ("obj_repl_insert", "insert_time", "DiaObjectChunks", false),
      ("src_select", "select_time", "DiaSource", true),
      ("src_insert", "insert_time", "DiaSource", false),
      ("src_repl_insert", "insert_time", "DiaSourceChunks", false),
      ("fsrc_select", "select_time", "DiaForcedSource", true),
      ("fsrc_insert", "insert_time", "DiaForcedSource", false),
      ("fsrc_repl_insert", "insert_time", "DiaForcedSourceChunks", false),
      ("store", "tile_store_time", null, true),
      ("tile_visit", "tile_visit_time", null, true),
      ("visit_proc", "visit_processing_time", null, true),
      ("visit", "total_visit_time", null, true))
    def matches(name: String, table: String) =
      if (table == null) col("name") === name
      else col("name") === name && col("table") === table
    val timerAggs = timers.flatMap { case (prefix, name, table, withCpu) =>
      val r = avg(when(matches(name, table), real)).as(s"${prefix}_real")
      if (withCpu) Seq(r, avg(when(matches(name, table), cpu)).as(s"${prefix}_cpu"))
      else Seq(r)
    }
    val counterAggs = Seq(
      ("obj_selected", "objects"), ("src_selected", "sources"),
      ("fsrc_selected", "forcedsources"), ("obj_in_fov", "objects_filtered")
    ).map { case (out, key) =>
      avg(when(col("name") === "read_counts", col("values")(key))).as(out)
    }
    val aggs = timerAggs ++ counterAggs
    metrics.groupBy(col("visit"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("sum_select_real",
        when(col("obj_select_real").isNull && col("src_select_real").isNull &&
          col("fsrc_select_real").isNull, lit(null))
          .otherwise(coalesce(col("obj_select_real"), lit(0.0)) +
            coalesce(col("src_select_real"), lit(0.0)) +
            coalesce(col("fsrc_select_real"), lit(0.0))))
      .select(visitCsvCols.map(col): _*)
      .orderBy(col("visit"))
  }

  /** Query fan-out counters (`metrics.md:43-45` select_query_stats;
    * log2influx's num_queries / num_sp_part counters) rolled up per
    * visit. */
  def queryCounters(metrics: DataFrame): DataFrame = {
    metrics.where(col("name") === "select_query_stats")
      .groupBy(col("visit"), col("table"))
      .agg(sum(col("values")("num_queries")).cast("long").as("num_queries"),
        sum(col("values")("num_sp_part")).cast("long").as("num_sp_part"))
      .orderBy(col("visit"), col("table"))
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

  /** Tail-follow stop semantics (T9, `log2csv.py:231,259-262`): the
    * reference's follow loop exits once a line matches the stop
    * sentinel. Here a lightweight watcher stream scans the same raw
    * lines and calls `stop()` on the target query when the sentinel
    * appears (after the in-flight batch completes, matching the
    * reference's "stop after reading remaining lines"). The caller
    * stops the returned watcher after the target terminates. */
  def stopOnPattern(lines: DataFrame,
      target: => org.apache.spark.sql.streaming.StreamingQuery,
      pattern: String = StopPattern): org.apache.spark.sql.streaming.StreamingQuery = {
    lines.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.where(col("value").contains(pattern)).isEmpty) {
          // stop() from the watcher thread; the target finishes its
          // current micro-batch then terminates (graceful stop)
          new Thread(() => target.stop()).start()
        }
      }
      .queryName("stop_watcher")
      .start()
  }
}
