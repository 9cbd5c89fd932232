package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.apdb._
import graft.geom._

/** The unbounded visit loop as Structured Streaming (T1, SURVEY §2.8):
  * a rate source ticks one row per visit; `foreachBatch` runs the full
  * §3.1 pipeline for each tick. State (the APDB tables + visit
  * checkpoint) lives in the warehouse — the deliberate design of T4:
  * per-key streaming state stays in queryable tables rather than opaque
  * `mapGroupsWithState` state (the reference's `DiaObjectLast` pattern).
  *
  * The reference's 45 s real-time cadence maps to the rate-source
  * `rowsPerSecond`; tests compress time by ticking faster than 1/45 Hz
  * while keeping event-time arithmetic on the 45 s grid.
  */
object VisitStream {

  /** Start the visit stream. Each micro-batch may carry several ticks
    * (e.g. on catch-up); they are processed sequentially in visit order,
    * exactly like the reference's resume-after-downtime loop. */
  def start(apdb: ApdbSpark, catalog: org.apache.spark.sql.DataFrame,
      startTime: Timestamp, rowsPerSecond: Long = 1L,
      onVisit: VisitPipeline.VisitStats => Unit = _ => ()): StreamingQuery = {
    val spark = apdb.spark
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load() // columns: timestamp, value (0-based tick counter)

    ticks.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // Ticks arrive on the driver; each advances the visit clock by
        // one. IDEMPOTENCE on micro-batch retries: a marker records
        // (batchId, visit counter before the batch); a re-delivered
        // batchId reuses that base, so already-persisted visits are not
        // run again — only the missing tail of the batch executes.
        val n = batch.count().toInt
        if (n > 0) {
          val dir = apdb.config.warehouseDir
          def stateVisit: Int =
            VisitPipeline.VisitStateStore.read(dir).map(_.visitId).getOrElse(0)
          val markerFile = s"$dir/stream_batch.json"
          val base: Int = {
            val existing =
              if (graft.EstateFs.exists(markerFile))
                Some(graft.EstateFs.readString(markerFile).split(","))
              else None
            existing match {
              case Some(Array(bid, b)) if bid.toLong == batchId => b.toInt
              case _ =>
                val b = stateVisit
                graft.EstateFs.mkdirs(dir)
                graft.EstateFs.writeStringAtomic(markerFile, s"$batchId,$b")
                b
            }
          }
          val target = base + n
          while (stateVisit < target) {
            val resumed = VisitPipeline.VisitStateStore.read(dir)
            val visitId = resumed.map(_.visitId).getOrElse(0) + 1
            // event time advances on the 45 s visit grid regardless of
            // wall-clock tick speed; night-time filter (F8) applies
            val eventTime = nextNightTime(resumed
              .map(s => new Timestamp(s.visitTimeMillis + 45000L))
              .getOrElse(startTime))
            val pointing = Generators.sphereXyz(1, hemi = -1,
              seed = 5000L + (visitId % 3)).head
            val stats = VisitPipeline.visit(apdb, catalog, visitId, eventTime,
              pointing)
            onVisit(stats)
          }
        }
        ()
      }
      .start()
  }

  /** Skip day-time slots (06:00–20:00 UTC), the F8/T2 semantics. */
  def nextNightTime(t: Timestamp): Timestamp = {
    var ms = t.getTime
    while ({ val h = (ms / 3600000L) % 24; h >= 6 && h < 20 }) ms += 45000L
    new Timestamp(ms)
  }
}
