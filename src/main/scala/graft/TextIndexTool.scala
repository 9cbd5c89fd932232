package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational CLI for the [[TextIndex]] lifecycle — build a persisted
  * BM25 postings index from a documents parquet, then serve query
  * batches against it ([[VectorIndexTool]]'s lexical sibling).
  *
  * Usage:
  *   runMain graft.TextIndexTool build <indexDir> <docsParquet>
  *   runMain graft.TextIndexTool append <indexDir> <docsParquet> <batchId>
  *   runMain graft.TextIndexTool compact <indexDir>
  *   runMain graft.TextIndexTool search <indexDir> <queryParquet> <outParquet> [k]
  *
  * `docsParquet` needs (doc_id, text); `queryParquet` is a flat
  * (query_id, term) relation — one row per query term. Results land at
  * `outParquet` as (query_id, rank, doc_id, score_s). */
object TextIndexTool {
  private val usage =
    "usage: TextIndexTool build <indexDir> <docsParquet> | " +
      "append <indexDir> <docsParquet> <batchId> | " +
      "compact <indexDir> | " +
      "search <indexDir> <queryParquet> <outParquet> [k]"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** The tool body, session-injected (tests drive this directly). */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 2, usage)
    val (mode, dir) = (args(0), args(1))
    mode match {
      case "compact" =>
        val folded = TextIndex.compact(spark, dir)
        println(s"""{"compacted":"bm25","dir":"$dir","folded_batches":$folded}""")
      case "build" =>
        require(args.length >= 3, usage)
        TextIndex.build(spark, dir,
          spark.read.parquet(args(2)).select(col("doc_id"), col("text")))
        println(s"""{"built":"bm25","dir":"$dir"}""")
      case "append" =>
        require(args.length >= 4, usage)
        TextIndex.append(spark, dir,
          spark.read.parquet(args(2)).select(col("doc_id"), col("text")),
          batchId = args(3).toLong)
        println(s"""{"appended":"bm25","dir":"$dir","batch":${args(3)}}""")
      case "search" =>
        require(args.length >= 4, usage)
        val k = if (args.length > 4) args(4).toInt else TextIndex.DefaultK
        // bounded collect: a query batch is small by contract (the
        // corpus side of the search never collects)
        val batch = spark.read.parquet(args(2))
          .select(col("query_id").cast("long"), col("term"))
          .collect()
          .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
          .map { case (q, rows) => (q, rows.map(_.getString(1)).toSeq) }
        val out = TextIndex.search(spark, dir, batch, k)
        out.write.mode("overwrite").parquet(args(3))
        println(s"""{"searched":"bm25","queries":${batch.size},"k":$k,"out":"${args(3)}"}""")
      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' — $usage")
    }
  }
}
