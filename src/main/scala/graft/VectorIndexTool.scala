package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational CLI for the [[VectorIndex]] lifecycle — build a
  * persisted ANN index from an embedding parquet, then serve query
  * batches against it (the `write_index` / batch-search utility pair a
  * vector-search deployment actually operates with).
  *
  * Usage:
  *   runMain graft.VectorIndexTool build <graph|hier|pq|ivfpq|bin> <indexDir> <embParquet>
  *   runMain graft.VectorIndexTool search <graph|hier|pq|ivfpq|bin> <indexDir> <queryParquet> <outParquet> [k]
  *
  * `embParquet` needs (vec_id, embedding); `queryParquet` needs
  * (query_id, embedding) — or (vec_id, embedding), renamed on read.
  * Results land at `outParquet` as (query_id, rank, cand_id, score).
  */
object VectorIndexTool {
  private val usage =
    "usage: VectorIndexTool build <graph|hier|pq|ivfpq|bin> <indexDir> <embParquet> | " +
      "search <graph|hier|pq|ivfpq|bin> <indexDir> <queryParquet> <outParquet> [k] [excludeSelf] " +
      "(excludeSelf=true drops cand_id==query_id matches — bin family only; " +
      "without it a query that is also an index member returns itself at rank 1) | " +
      "drift ivfpq <indexDir> | maintain ivfpq <indexDir> [bound] | " +
      "insert <graph|hier> <indexDir> <embParquet>"

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
    require(args.length >= 3, usage)
    val (mode, family, dir) = (args(0), args(1), args(2))
    require(Set("graph", "hier", "pq", "ivfpq", "bin").contains(family),
      s"unknown index family '$family' — $usage")
    mode match {
      case "build" =>
        require(args.length >= 4, usage)
        val emb = spark.read.parquet(args(3))
          .select(col("vec_id"), col("embedding"))
        family match {
          case "graph" => VectorIndex.build(spark, dir, emb)
          case "hier" => VectorIndex.buildHier(spark, dir, emb)
          case "pq" => VectorIndex.buildPq(spark, dir, emb)
          case "ivfpq" => VectorIndex.buildIvfPq(spark, dir, emb)
          case "bin" => VectorIndex.buildBinary(spark, dir, emb)
        }
        println(s"""{"built":"$family","dir":"$dir"}""")
      case "search" =>
        require(args.length >= 5, usage)
        val k = if (args.length > 5) args(5).toInt else 5
        val excludeSelf = args.length > 6 && args(6).toBoolean
        require(!excludeSelf || family == "bin",
          s"excludeSelf is only supported by the bin family — $usage")
        val qRaw = spark.read.parquet(args(3))
        val queries = (if (qRaw.columns.contains("query_id")) qRaw
          else qRaw.withColumnRenamed("vec_id", "query_id"))
          .select(col("query_id"), col("embedding"))
        val out = family match {
          case "graph" => VectorIndex.search(spark, dir, queries, k)
          case "hier" => VectorIndex.searchHier(spark, dir, queries, k)
          case "pq" => VectorIndex.searchPq(spark, dir, queries, k)
          case "ivfpq" => VectorIndex.searchIvfPq(spark, dir, queries, k)
          case "bin" => VectorIndex.searchBinary(spark, dir, queries, k,
            excludeSelf = excludeSelf)
        }
        out.write.mode("overwrite").parquet(args(4))
        println(s"""{"searched":"$family","queries":${queries.count()},"k":$k,"out":"${args(4)}"}""")
      case "insert" =>
        require(args.length >= 4, usage)
        require(family == "graph" || family == "hier",
          s"insert applies to graph/hier — $usage")
        VectorIndex.insert(spark, dir, spark.read.parquet(args(3))
          .select(col("vec_id"), col("embedding")))
        println(s"""{"inserted":"$family","dir":"$dir"}""")
      case "drift" =>
        require(family == "ivfpq", s"drift applies to ivfpq — $usage")
        println(s"""{"drift":${VectorIndex.ivfDrift(spark, dir)},"dir":"$dir"}""")
      case "maintain" =>
        require(family == "ivfpq", s"maintain applies to ivfpq — $usage")
        val bound = if (args.length > 3) args(3).toDouble else 0.2
        val ran = VectorIndex.maintainIvf(spark, dir, bound)
        println(s"""{"rebalanced":$ran,"bound":$bound,"drift":${
          VectorIndex.ivfDrift(spark, dir)},"dir":"$dir"}""")
      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' — $usage")
    }
  }
}
