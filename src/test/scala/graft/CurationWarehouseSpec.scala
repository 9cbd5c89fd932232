package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Persistent incremental curation: the warehouse indexes carry dedup
  * state across ingest rounds. */
class CurationWarehouseSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDF(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, text) =>
      (id, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("two ingest rounds: indexes reject exact and near dups across rounds") {
    val dir = java.nio.file.Files.createTempDirectory("warehouse").toString
    val base = "the quick brown fox jumps over the lazy dog again and again"
    CurationWarehouse.init(spark, dir,
      CorpusPipeline.splitAssign(docsDF(
        0L -> base,
        1L -> "stars and galaxies drift apart in the expanding universe")))

    // round 1: exact dup of doc 0, near dup of doc 0, fresh doc
    val r1 = CurationWarehouse.ingest(spark, dir, docsDF(
      10L -> "The QUICK brown fox jumps over the lazy dog! Again... and again",
      11L -> base.replace("lazy", "sleepy"),
      12L -> "entirely novel content about rivers meandering through valleys"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(r1 == Seq(12L), r1)

    // round 2: dup of ROUND-1's survivor must now be rejected (the
    // indexes were appended), plus one fresh doc
    val r2 = CurationWarehouse.ingest(spark, dir, docsDF(
      20L -> "Entirely novel content about rivers; meandering through valleys",
      21L -> "mountains rise slowly where tectonic plates keep colliding"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(r2 == Seq(21L), r2)

    // warehouse docs = 2 initial + 1 + 1
    val all = CurationWarehouse.docs(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all == Seq(0L, 1L, 12L, 21L), all)
    // index tables track the docs table exactly
    assert(CurationWarehouse.fingerprints(spark, dir).count() == 4)
    assert(CurationWarehouse.signatures(spark, dir).count() == 4)
  }

  test("uncommitted slice is invisible: crash between writes leaves no mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("warehouse").toString
    CurationWarehouse.init(spark, dir,
      CorpusPipeline.splitAssign(docsDF(
        0L -> "stars and galaxies drift apart in the expanding universe")))

    // simulate a crashed ingest: slice dir written, marker never created
    val orphan = s"$dir/slices/1/docs"
    CorpusPipeline.splitAssign(docsDF(
      99L -> "orphaned half-ingested document that must stay invisible"))
      .write.parquet(orphan)

    val all = CurationWarehouse.docs(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all == Seq(0L), all)

    // a retried ingest of the same slice overwrites the orphan and
    // commits cleanly — doc admitted exactly once, indexes in step
    val r = CurationWarehouse.ingest(spark, dir, docsDF(
      99L -> "orphaned half-ingested document that must stay invisible"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(99L), r)
    assert(CurationWarehouse.docs(spark, dir).count() == 2)
    assert(CurationWarehouse.fingerprints(spark, dir).count() == 2)
    assert(CurationWarehouse.signatures(spark, dir).count() == 2)
  }
}
