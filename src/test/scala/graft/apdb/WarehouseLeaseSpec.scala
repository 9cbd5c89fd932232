package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** The APDB warehouse single-writer lease (VERDICT r14 missing #2):
  * the reference's DB backends tolerate concurrent writer processes by
  * primary-key upsert; the parquet store does not, so every mutator
  * entry point runs under [[graft.WriterLease]] and a second writer
  * gets the designed refusal. The cross-PROCESS race is contention
  * scenario H; this spec pins the in-process semantics (refusal text,
  * release, reentrancy, makeSchema/lease interplay) plus the
  * documented duplicate-on-move snapshot caveat (ADVICE r14). */
class WarehouseLeaseSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val pointing = Vec3(0.1, -0.2, -0.97).normalized
  private val t0 = Timestamp.valueOf("2026-01-01 01:00:00")

  private lazy val catalog = DiaSim
    .genCatalog(spark, 20000L, hemi = -1, seed = 42)
    .localCheckpoint(true)

  private def cfgAt(dir: String) = ApdbConfig(warehouseDir = dir,
    transientPerVisit = 10, falsePerVisit = 90)

  test("a second engine instance is refused while the lease is held, proceeds after release") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_lease").toString
    val holder = new ApdbSpark(spark, cfgAt(dir))
    holder.makeSchema(drop = true)
    holder.acquireWriter()
    assert(graft.EstateFs.exists(s"$dir/claims/LEASE"))

    val rival = new ApdbSpark(spark, cfgAt(dir))
    val times = VisitPipeline.visitTimes(t0, 2)
    val e = intercept[IllegalStateException] {
      VisitPipeline.visit(rival, catalog, 1, times(0)._2, pointing)
    }
    assert(e.getMessage.contains("single-writer"),
      s"refusal must name the protocol, got: ${e.getMessage}")
    // maintenance entry points refuse the same way
    intercept[IllegalStateException] { rival.consolidateNight() }
    intercept[IllegalStateException] { rival.dropExpiredChunks(t0) }

    // the holder itself is reentrant (visit under a run-scoped lease)
    val s1 = VisitPipeline.visit(holder, catalog, 1, times(0)._2, pointing)
    assert(s1.nSources > 0)

    holder.releaseWriter()
    assert(!graft.EstateFs.exists(s"$dir/claims/LEASE"))
    // the rival proceeds once the run lease is gone (per-call scope)
    val s2 = VisitPipeline.visit(rival, catalog, 2, times(1)._2, pointing)
    assert(s2.nSources > 0)
    assert(!graft.EstateFs.exists(s"$dir/claims/LEASE"),
      "a per-call scope must release on exit")
  }

  test("a failed visit releases its per-call lease (retry is not self-blocked)") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_leasefail").toString
    val apdb = new ApdbSpark(spark, cfgAt(dir))
    apdb.makeSchema(drop = true)
    apdb.storeCrashHook =
      p => if (p == "objects") throw new RuntimeException("boom")
    val ts = VisitPipeline.visitTimes(t0, 1).head._2
    intercept[RuntimeException] {
      VisitPipeline.visit(apdb, catalog, 1, ts, pointing)
    }
    apdb.storeCrashHook = _ => ()
    assert(!graft.EstateFs.exists(s"$dir/claims/LEASE"),
      "a crashed visit stranded the warehouse lease")
    // the retry acquires cleanly and converges
    val s = VisitPipeline.visit(apdb, catalog, 1, ts, pointing)
    assert(s.nSources > 0)
  }

  test("makeSchema(drop) preserves the claims dir (the holder's own lease)") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_leasedrop").toString
    val apdb = new ApdbSpark(spark, cfgAt(dir))
    apdb.makeSchema(drop = true)
    apdb.acquireWriter()
    apdb.makeSchema(drop = true)
    assert(graft.EstateFs.exists(s"$dir/claims/LEASE"),
      "drop deleted the holder's own run lease")
    apdb.releaseWriter()
  }

  test("duplicate-on-move caveat: a bucket-crossing object keeps its old bucket's row (reference parity)") {
    // DiaObjectLast's upsert key is (spatial partition, id) — exactly
    // the reference's Cassandra primary key, where the old partition's
    // row is never deleted. Pinned so the caveat stays documented
    // behavior, not an accident.
    val dir = java.nio.file.Files.createTempDirectory("apdb_move").toString
    val apdb = new ApdbSpark(spark, cfgAt(dir))
    apdb.makeSchema(drop = true)
    val shift = apdb.config.pixBucketShift
    def objAt(pix: Long, ts: Timestamp) = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(42L, 10.0, -45.0, 1, ts, ts, pix))),
      Schemas.diaObject)
    val empty = (s: org.apache.spark.sql.types.StructType) =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    val times = VisitPipeline.visitTimes(t0, 2)
    apdb.store(times(0)._2, objAt(1L << shift, times(0)._2),
      empty(Schemas.diaSource), empty(Schemas.diaForcedSource))
    apdb.store(times(1)._2, objAt(2L << shift, times(1)._2),
      empty(Schemas.diaSource), empty(Schemas.diaForcedSource))
    val rows = apdb.objectsLast.where(col("diaObjectId") === 42L).count()
    assert(rows === 2L,
      s"expected the reference's per-partition upsert semantics " +
        s"(one row per bucket the object lived in), got $rows")
    // clients that need one-row-per-id semantics dedupe by latest
    // validityStart — the documented client-side move
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("diaObjectId")).orderBy(col("validityStart").desc)
    val deduped = apdb.objectsLast
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    assert(deduped.where(col("diaObjectId") === 42L).count() === 1L)
  }
}
