package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver testdata (TESTDATA.md).
  *
  * Mirrors the reference's notion of named catalogs handed between pipeline
  * stages (`/root/reference/python/lsst/l1dbproto/_executors.py:64-68`), but
  * as lazily-planned Spark scans so Catalyst prunes columns/predicates.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** events.parquet's `ts` column has changed physical type across
    * driver data generations: INT64 TIMESTAMP(NANOS) (which Spark's
    * reader rejects by default — read nanos as long, truncate to micros,
    * exactly DuckDB's NANOS coercion) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ).
    * Normalize BOTH to TimestampType under the session's UTC zone so
    * every downstream plan — and every oracle comparison — sees one
    * schema regardless of the writer's vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // cast(NTZ -> timestamp) interprets the wall-clock in the
        // SESSION zone; every graft session pins UTC, and a non-UTC
        // caller would silently shift every event by its zone offset
        // (the nanos branch has no such dependence) — fail loudly
        // instead of corrupting
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events: TIMESTAMP_NTZ data requires " +
            "spark.sql.session.timeZone=UTC (got '" +
            s.conf.get("spark.sql.session.timeZone") + "')")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
