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

  test("single-writer lease: second writer fails fast; a crashed writer's stale lease is broken") {
    val dir = java.nio.file.Files.createTempDirectory("warehouse").toString
    CurationWarehouse.init(spark, dir,
      CorpusPipeline.splitAssign(docsDF(
        0L -> "stars and galaxies drift apart in the expanding universe")))

    // an interleaved second ingest is exactly "the lease file exists
    // while mine starts" — create it as the concurrent writer would
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")
    java.nio.file.Files.createFile(lease)
    val e = intercept[IllegalStateException] {
      CurationWarehouse.ingest(spark, dir, docsDF(
        5L -> "fresh content about oceans circulating heat around the globe"))
    }
    assert(e.getMessage.contains("lease"))
    // mutual exclusion held: nothing was admitted, indexes untouched
    assert(CurationWarehouse.docs(spark, dir).count() == 1)
    assert(CurationWarehouse.fingerprints(spark, dir).count() == 1)

    // a CRASHED writer's lease (older than the TTL) must not brick the
    // warehouse: the next ingest breaks it atomically and proceeds
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - CurationWarehouse.LeaseTtlMs - 60000L))
    val r = CurationWarehouse.ingest(spark, dir, docsDF(
      5L -> "fresh content about oceans circulating heat around the globe"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(5L), r)
    // the break left an audit file and the new lease was released
    assert(!java.nio.file.Files.exists(lease))
    val broken = new java.io.File(s"$dir/claims").list()
      .count(_.startsWith("LEASE.broken."))
    assert(broken == 1)
  }

  test("init refuses an already-initialized warehouse BEFORE writing — even pre-claims-protocol") {
    val dir = java.nio.file.Files.createTempDirectory("warehouse").toString
    CurationWarehouse.init(spark, dir,
      CorpusPipeline.splitAssign(docsDF(0L -> "original corpus document zero")))
    // simulate a warehouse created before the claims protocol: commits
    // exist, claims/ absent (the old claims-only guard overwrote
    // slice 0 in this state before the marker create could throw)
    new scala.reflect.io.Directory(new java.io.File(s"$dir/claims"))
      .deleteRecursively()
    intercept[IllegalArgumentException] {
      CurationWarehouse.init(spark, dir,
        CorpusPipeline.splitAssign(docsDF(9L -> "clobbering corpus that must never land")))
    }
    val all = CurationWarehouse.docs(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(all == Seq(0L), s"slice 0 was clobbered: $all")
  }

  test("a crashed init (claim 0 held, nothing committed) is retryable, not bricked") {
    val dir = java.nio.file.Files.createTempDirectory("warehouse").toString
    // simulate the crash: claim 0 exists, no tables, no commit marker
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "claims"))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(dir, "claims", "0"))
    CurationWarehouse.init(spark, dir,
      CorpusPipeline.splitAssign(docsDF(0L -> "document zero lands on the retried init")))
    val all = CurationWarehouse.docs(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(all == Seq(0L), all)
  }
}
