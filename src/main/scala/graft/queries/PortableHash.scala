package graft.queries

/** THE portable 60-bit hash of the engine: first 15 hex chars of md5 as
  * an integer. md5 is bit-identical in Spark and DuckDB, so — unlike
  * xxhash64 — every bucketing built on it is oracle-expressible. One
  * definition; every operator (MinHash shingles, SimHash tokens, gram
  * joins, sampling keys) and every oracle must use these two forms so
  * the recipe can never silently diverge between engines.
  */
object PortableHash {
  /** Spark SQL form. */
  def hex60(sqlStr: String): String =
    s"CAST(conv(substr(md5($sqlStr), 1, 15), 16, 10) AS BIGINT)"
  /** DuckDB form (same value). */
  def duckHex60(sqlStr: String): String =
    s"CAST('0x' || substr(md5($sqlStr), 1, 15) AS BIGINT)"
}
