package graft.apdb

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp

/** Per-visit metric emission in the reference's log format
  * (`_logging.py:47-49` line shape + `metrics.md` vocabulary): lines of
  * `<ts> [INFO] ap_proto: apdb_metrics: {json}` appended to
  * `<warehouse>/metrics.log`, so the engine's own LogTool / LogAnalytics
  * pipeline consumes the engine's own runs — closing the reference's
  * produce→scrape→aggregate loop.
  */
final class MetricsLog(dir: String) {
  private val path = Paths.get(dir, "metrics.log")
  Files.createDirectories(path.getParent)

  private def fmtTs(t: Timestamp): String = {
    val ms = t.getTime
    val base = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    base.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f"${base.format(new java.util.Date(ms))},${ms % 1000}%03d"
  }

  private def emit(visitTime: Timestamp, name: String, visit: Int,
      table: String, values: String): Unit = {
    val line =
      s"${fmtTs(visitTime)} [INFO] ap_proto: apdb_metrics: " +
        s"""{"name": "$name", "timestamp": ${"%.3f".formatLocal(java.util.Locale.US, visitTime.getTime / 1000.0)}, """ +
        s""""tags": {"visit": "$visit", "table": "$table", "tile": "0"}, """ +
        s""""values": $values, "source": "ap_proto"}""" + "\n"
    Files.writeString(path, line, StandardOpenOption.CREATE,
      StandardOpenOption.APPEND)
  }

  def timer(visitTime: Timestamp, name: String, visit: Int, table: String,
      realSec: Double): Unit =
    emit(visitTime, name, visit, table,
      s"""{"real": $realSec, "user": 0.0, "sys": 0.0}""")

  def counts(visitTime: Timestamp, name: String, visit: Int, table: String,
      rows: Long): Unit =
    emit(visitTime, name, visit, table, s"""{"row_count": $rows}""")

  /** Generic value-map record (the reference's read_counts /
    * store_counts / select_query_stats shapes, `metrics.md:15-45`). */
  def record(visitTime: Timestamp, name: String, visit: Int, table: String,
      kv: Seq[(String, Double)]): Unit =
    emit(visitTime, name, visit, table,
      kv.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
}
