package graft.streaming

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Runtime-metrics monitor — the `cassandra_jmx_mon` analog (T7,
  * `/root/reference/bin.src/cassandra_jmx_mon.py`): poll JVM + executor
  * gauges on a tumbling period and append CSV rows to an output file
  * that rotates every N hours.
  *
  * Spark-first restatement: the tumbling poll is a Structured Streaming
  * rate source with `Trigger.ProcessingTime(period)`; each micro-batch
  * samples the driver-visible gauges (JMX memory/threads/GC — the same
  * beans the reference polls over JMX — plus the Spark status tracker)
  * and appends one line; rotation is a window-keyed file name, the
  * streaming analog of the reference's rotate-hours argument.
  */
object MetricsMon {

  val Header = "ts_millis,heap_used,heap_max,nonheap_used,threads,gc_count,gc_millis,executors,active_stages"

  /** One CSV sample line from the JVM/Spark gauges. */
  def sample(spark: SparkSession, nowMillis: Long): String = {
    val mem = ManagementFactory.getMemoryMXBean
    val heap = mem.getHeapMemoryUsage
    val nonheap = mem.getNonHeapMemoryUsage
    val threads = ManagementFactory.getThreadMXBean.getThreadCount
    val gcs = ManagementFactory.getGarbageCollectorMXBeans
    var gcCount = 0L; var gcMillis = 0L
    gcs.forEach { gc =>
      if (gc.getCollectionCount > 0) gcCount += gc.getCollectionCount
      if (gc.getCollectionTime > 0) gcMillis += gc.getCollectionTime
    }
    val tracker = spark.sparkContext.statusTracker
    val nExec = tracker.getExecutorInfos.length
    val nStages = tracker.getActiveStageIds.length
    s"$nowMillis,${heap.getUsed},${heap.getMax},${nonheap.getUsed}," +
      s"$threads,$gcCount,$gcMillis,$nExec,$nStages"
  }

  /** Rotation-window file for a timestamp: `metrics_<windowStart>.csv`. */
  def rotatedFile(outDir: String, nowMillis: Long, rotateHours: Int): java.nio.file.Path = {
    val windowMs = rotateHours.toLong * 3600 * 1000
    val start = nowMillis / windowMs * windowMs
    Paths.get(outDir, s"metrics_$start.csv")
  }

  /** Append one sample (creating the rotated file with a header). */
  def poll(spark: SparkSession, outDir: String, rotateHours: Int,
      nowMillis: Long = System.currentTimeMillis()): Unit = {
    val f = rotatedFile(outDir, nowMillis, rotateHours)
    Files.createDirectories(f.getParent)
    val line = sample(spark, nowMillis)
    if (!Files.exists(f))
      Files.writeString(f, Header + "\n" + line + "\n", StandardOpenOption.CREATE)
    else
      Files.writeString(f, line + "\n", StandardOpenOption.APPEND)
  }

  /** Start the tumbling poller; caller stops the returned query. */
  def start(spark: SparkSession, outDir: String, periodSec: Int = 10,
      rotateHours: Int = 4): StreamingQuery = {
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$periodSec seconds"))
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        poll(spark, outDir, rotateHours)
      }
      .queryName("metrics_mon")
      .start()
  }
}
