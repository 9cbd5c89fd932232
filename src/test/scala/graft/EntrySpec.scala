package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001, and
  * every oracleSql key has a matching queries entry. */
class EntrySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; keys are well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o -- q}")
    assert(q.forall(_.matches("[a-z]\\d+_[a-z0-9_]+")))
    assert(q.size >= 96)
    // since round 4 every key is fully oracle-checked — a new key
    // without an oracle would silently downgrade to a rows-only check
    assert(q == o, s"queries without oracles (rows-only): ${q -- o}")
  }
}
