package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.VectorIndex
import graft.queries.{DedupQueries, Tables}

/** Streaming IVF-PQ index maintenance: codes streamed in micro-batches
  * must serve IDENTICALLY to a one-shot batch build, stay exactly-once
  * across kill-and-resume, and keep replayed batches idempotent. */
class VectorIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("streamed index == batch-built index; restart exactly-once; replay idempotent") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val base = emb.where(col("vec_id") < 250)
    val feed = emb.where(col("vec_id") >= 250)

    val grown = Files.createTempDirectory("vingest").toString
    val full = Files.createTempDirectory("vfull2").toString
    VectorIndex.buildIvfPq(spark, grown, base)
    VectorIndex.buildIvfPq(spark, full, emb)

    // the feed arrives as parquet files; AvailableNow + checkpoint give
    // the kill-and-resume shape (IngestDedup's restart pattern)
    val inDir = s"$grown/in"; Files.createDirectories(Paths.get(inDir))
    val chk = s"$grown/chk"
    // the file stream source lists FILES under the path — stage each
    // feed file flat (write a one-part dir, move the part file in)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("vstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      Files.move(Paths.get(part), Paths.get(inDir, name))
    }
    stage(feed.where(col("vec_id") < 375), "f1.parquet")
    def runOnce(): Unit = {
      val q = VectorIngest.ingest(spark, grown,
        spark.readStream.schema(feed.schema).parquet(inDir), chk)
      // AvailableNow is set by the source being bounded? No — use the
      // query's processAllAvailable against the file source
      q.processAllAvailable()
      q.stop()
    }
    runOnce() // run 1, then the "kill"
    stage(feed.where(col("vec_id") >= 375), "f2.parquet")
    runOnce() // resume from the SAME checkpoint: f1 must not re-ingest

    val streamed = spark.read.parquet(s"$grown/ivf_codes_stream")
    val feedIds = feed.select(col("vec_id")).as[Long].collect().toSet
    val gotIds = streamed.select(col("cand_id")).as[Long].collect()
    assert(gotIds.length == gotIds.distinct.length,
      "restart re-ingested a batch — exactly-once broken")
    assert(gotIds.toSet == feedIds, "streamed ids != feed ids")

    // replayed micro-batch (same batchId) is idempotent by layout
    val before = streamed.count()
    val replay = feed.where(col("vec_id") < 375)
    VectorIngest.appendBatch(spark, grown, replay, batchId = 0L)
    assert(spark.read.parquet(s"$grown/ivf_codes_stream").count() == before,
      "replaying batch 0 duplicated its codes")

    // serve parity: identical codes ⇒ identical ADC ranking
    val queries = emb.orderBy(col("vec_id"))
      .limit(DedupQueries.GraphQueryCount)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val a = VectorIndex.searchIvfPq(spark, grown, queries, k = 5)
      .collect().map(_.toString).toSeq
    val b = VectorIndex.searchIvfPq(spark, full, queries, k = 5)
      .collect().map(_.toString).toSeq
    assert(a == b, "streamed-grown index diverged from batch-built")

    // an at-least-once feed re-delivering BASE vectors must not let a
    // duplicated candidate occupy two top-k slots
    VectorIngest.appendBatch(spark, grown,
      emb.where(col("vec_id") < 50), batchId = 99L)
    val dup = VectorIndex.searchIvfPq(spark, grown, queries, k = 5).collect()
    dup.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cands = rs.map(_.getLong(2))
      assert(cands.distinct.length == cands.length,
        s"query $q top-k repeats a candidate: ${cands.toSeq}")
    }
  }
}
