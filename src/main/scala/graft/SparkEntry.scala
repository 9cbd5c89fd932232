package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query key from the per-area
  * registries (graft.queries.*). Each key has a matching DuckDB oracle in
  * [[oracleSql]] unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's defining query shape (README.md:26-28): latest-version
    * snapshot join of new detections against known objects. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    queries("j1_s2o_match")(spark, d)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.GeoQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.MiningQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.GeoQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.MiningQueries.oracleSql
}
