package graft.apdb

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Vec3
import graft.operators.SaltedJoin

/** Scale-mechanics checks: nightly compaction, bucketed co-located
  * joins, and skew salting. */
class ScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("nightly consolidation compacts per-visit file fragments") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_compact").toString
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      transientPerVisit = 5, falsePerVisit = 45))
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 31)
      .localCheckpoint(true)
    val pointing = Vec3(0.1, -0.2, -0.97).normalized
    val vs = VisitPipeline.visitTimes(Timestamp.valueOf("2026-05-01 01:00:00"), 3)
    vs.foreach { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointing)
    }

    val before = apdb.fileCounts
    val rowsBefore = (apdb.objectsLast.count(), apdb.sources.count(),
      apdb.getDiaObjectsHistory.count())
    apdb.consolidateNight()
    val after = apdb.fileCounts
    val rowsAfter = (apdb.objectsLast.count(), apdb.sources.count(),
      apdb.getDiaObjectsHistory.count())

    assert(rowsBefore == rowsAfter, "compaction must preserve contents")
    // three visits appended three file sets; compaction leaves one file
    // per partition directory
    assert(after("objects") < before("objects"),
      s"objects: ${before("objects")} -> ${after("objects")}")
    assert(after("sources") < before("sources"),
      s"sources: ${before("sources")} -> ${after("sources")}")
  }

  test("region-pruned history reads are result-identical to the ids-only contract") {
    // multi-pointing workload so the sources table holds history OUTSIDE
    // any one visit's FOV — the case the bucket prune must not clip
    val dir = java.nio.file.Files.createTempDirectory("apdb_histprune").toString
    val cfg = ApdbConfig(warehouseDir = dir,
      transientPerVisit = 5, falsePerVisit = 45)
    val apdb = new ApdbSpark(spark, cfg)
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 17)
      .localCheckpoint(true)
    val pointings = (0 until 3).map(i =>
      graft.geom.Generators.sphereXyz(1, hemi = -1, seed = 5000L + i).head)
    val vs = VisitPipeline.visitTimes(
      Timestamp.valueOf("2026-05-01 01:00:00"), 6)
    vs.foreach { case (id, ts) =>
      VisitPipeline.visit(apdb, catalog, id, ts, pointings(id % 3))
    }
    // revisit pointing 0's FOV: its matched ids and padded region
    val ts = Timestamp.valueOf("2026-05-01 01:10:00")
    val padRad = math.toRadians(cfg.regionPaddingArcsec / 3600.0)
    val padded = graft.geom.Circle(pointings(0), cfg.fovRad / 2)
      .padded(padRad)
    // history prune takes the DOUBLY-padded region (object offset +
    // source scatter — the getDiaSources contract, as VisitPipeline)
    val histRegion = padded.padded(padRad)
    val ids = apdb.getDiaObjects(padded).select(col("diaObjectId"))
      .localCheckpoint(true)
    assert(ids.count() > 0, "fixture: revisit must match objects")
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(sortedRows(apdb.getDiaSources(ids, ts, Some(histRegion))) ==
      sortedRows(apdb.getDiaSources(ids, ts)),
      "bucket-pruned DiaSource history differs from the ids-only read")
    assert(sortedRows(apdb.getDiaForcedSources(ids, ts, Some(histRegion))) ==
      sortedRows(apdb.getDiaForcedSources(ids, ts)),
      "bucket-pruned DiaForcedSource history differs from ids-only read")
    // and the prune actually restricts the scan: other pointings' rows
    // exist in buckets the padded FOV never touches
    val allBuckets = spark.read.parquet(s"$dir/sources")
      .select("pix_bucket").distinct().count()
    val fovRead = apdb.getDiaSources(ids, ts, Some(histRegion))
    assert(allBuckets > 1, "fixture must span multiple pixel buckets")
    assert(fovRead.count() ==
      apdb.getDiaSources(ids, ts).count())
  }

  test("incremental compaction rewrites only fragmented partitions, preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("apdb_inc").toString
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      transientPerVisit = 5, falsePerVisit = 45))
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 50000L, hemi = -1, seed = 13)
      .localCheckpoint(true)
    val pointing = Vec3(0.1, -0.2, -0.97).normalized
    VisitPipeline.visitTimes(Timestamp.valueOf("2026-07-01 01:00:00"), 4)
      .foreach { case (id, ts) =>
        VisitPipeline.visit(apdb, catalog, id, ts, pointing)
      }
    val rowsBefore = (apdb.sources.count(), apdb.objectsLast.count())
    val before = apdb.fileCounts
    // threshold above current fragment counts: nothing must be touched
    assert(apdb.compactFragmented(maxFilesPerPartition = 10000)
      .values.sum == 0, "high threshold must be a no-op")
    assert(apdb.fileCounts == before)
    // threshold of 1 file/partition: every fragmented partition rewrites
    val done = apdb.compactFragmented(maxFilesPerPartition = 1)
    assert(done.values.sum > 0, s"nothing compacted: $done")
    val after = apdb.fileCounts
    assert(after("sources") < before("sources"),
      s"sources: ${before("sources")} -> ${after("sources")}")
    assert((apdb.sources.count(), apdb.objectsLast.count()) == rowsBefore,
      "incremental compaction must preserve contents")
  }

  test("per-visit cost stays flat as history accumulates") {
    // the scale property the 45 s/visit contract depends on: the
    // snapshot merge touches only this visit's buckets and history
    // reads are time-bucket-pruned, so visit N costs what visit 3 cost.
    // (The 43 M × 50-visit soak pins the same property at 10× reference
    // scale — README "Numbers"; this is its CI-sized guard.)
    val dir = java.nio.file.Files.createTempDirectory("apdb_flat").toString
    val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = dir,
      transientPerVisit = 5, falsePerVisit = 45))
    apdb.makeSchema(drop = true)
    val catalog = DiaSim.genCatalog(spark, 200000L, hemi = -1, seed = 7)
      .localCheckpoint(true)
    val pointing = Vec3(0.1, -0.2, -0.97).normalized
    val vs = VisitPipeline.visitTimes(Timestamp.valueOf("2026-06-01 01:00:00"), 12)
    val secs = vs.map { case (id, ts) =>
      val t0 = System.nanoTime()
      VisitPipeline.visit(apdb, catalog, id, ts, pointing)
      (System.nanoTime() - t0) / 1e9
    }
    // drop the JIT-heavy first visits; compare MEDIANS of the early
    // steady-state vs the tail window with generous slack — a single GC
    // pause / co-tenant spike can inflate a 3-sample mean, but not a
    // 4-sample median (this guards against LINEAR growth, not noise)
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(secs.slice(3, 7))
    val late = median(secs.slice(8, 12))
    assert(late < early * 2.5,
      f"per-visit cost grew with history: early=$early%.2f late=$late%.2f " +
        s"(all: ${secs.map(s => f"$s%.1f").mkString(", ")})")
    // storage-leak guard: each visit localCheckpoints several frames;
    // without the explicit release they strand until a driver GC and
    // the eviction storms spike visit latency at scale (round-5 100×
    // soak, visits 22-26). 12 visits × ~4 checkpoints must NOT be
    // lingering — only the shared catalog (plus at most a couple of
    // in-flight blocks) may hold storage.
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted <= 6,
      s"$persisted RDDs still persisted after 12 visits — checkpoint leak")
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.range(10000).select(col("id").as("k"),
        (col("id") % 97).as("v"))
      val dim = spark.range(2000).select(col("id").as("k"),
        (col("id") % 7).as("w"))
      facts.write.mode("overwrite").bucketBy(8, "k")
        .sortBy("k").saveAsTable("facts_bkt")
      dim.write.mode("overwrite").bucketBy(8, "k")
        .sortBy("k").saveAsTable("dim_bkt")
      val joined = spark.table("facts_bkt")
        .join(spark.table("dim_bkt"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() == 2000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS facts_bkt")
      spark.sql("DROP TABLE IF EXISTS dim_bkt")
    }
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = spark.range(20000).select(
      when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).as("dim"))
    val expected = skewed.join(small, Seq("k")).agg(
      count(lit(1)).as("n"), sum(col("payload") + col("dim")).as("s"))
      .head()
    val got = SaltedJoin.join(skewed, small, "k", salts = 8).agg(
      count(lit(1)).as("n"), sum(col("payload") + col("dim")).as("s"))
      .head()
    assert(got == expected)
  }

  test("adaptive per-key salted join equals plain join on skewed data") {
    import spark.implicits._
    val skewed = spark.range(20000).select(
      when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).as("dim"))
    val expected = skewed.join(small, Seq("k")).agg(
      count(lit(1)).as("n"), sum(col("payload") + col("dim")).as("s"))
      .head()
    val got = graft.operators.SaltedJoin
      .adaptive(skewed, small, Seq("k"), threshold = 100)
      .agg(count(lit(1)).as("n"), sum(col("payload") + col("dim")).as("s"))
      .head()
    assert(got == expected)
    // right-replicating salting is unsound for right-preserving joins
    intercept[IllegalArgumentException] {
      graft.operators.SaltedJoin.adaptive(skewed, small, Seq("k"),
        threshold = 100, joinType = "full_outer")
    }
  }

  test("dedup skew guard: hot LSH bucket triggers salting, same pairs, bounded shards") {
    import spark.implicits._
    import graft.queries.DedupQueries
    // 120 byte-identical docs land in ONE bucket of every band (the
    // boilerplate-duplication skew shape); 80 distinct docs spread out
    val rng = new scala.util.Random(5)
    val docs = ((0 until 120).map(i =>
      (i.toLong, "the exact same boilerplate sentence repeated across mirrors")) ++
      (120 until 200).map(i =>
        (i.toLong, Seq.fill(6)(s"tok${rng.nextInt(5000)}").mkString(" "))))
      .toDF("doc_id", "text")
    val sigs = DedupQueries.minhashSignatures(docs).localCheckpoint(true)
    val banded = DedupQueries.bandBuckets(sigs)
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairs(a.join(b, Seq("band", "bucket")))
    try {
      spark.conf.set("graft.dedup.skewThreshold", "16")
      // composing the guarded join must run ZERO Spark jobs (the
      // round-5 guard paid an eager measurement job per guarded join;
      // the adaptive guard decides inside the plan)
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      val guarded =
        try {
          val g = DedupQueries.bucketSelfJoin(spark, a, b,
            Seq("band", "bucket"))
          g.queryExecution.executedPlan // force planning too
          val bus = spark.sparkContext.getClass
            .getMethod("listenerBus").invoke(spark.sparkContext)
          bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
          g
        } finally spark.sparkContext.removeSparkListener(listener)
      assert(jobs.get() == 0,
        s"composing a guarded join ran ${jobs.get()} eager job(s)")
      // identical candidate pairs through the salted path
      assert(pairs(guarded) == plain)
      // the hot bucket's probe side actually spreads: max rows per
      // (bucket, shard) well under the unsalted 120 (bounded task time)
      val (sharded, _) = graft.operators.SaltedJoin.selfAdaptiveSides(
        a, b, Seq("band", "bucket"), threshold = 16, maxSalts = 32)
      val shardMax = sharded
        .groupBy(col("band"), col("bucket"), col("__shard")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(shardMax < 60, s"hot bucket not spread: max shard $shardMax")
      // cold buckets keep the plain join's shape: exactly one shard
      val coldShards = sharded.groupBy(col("band"), col("bucket"))
        .agg(countDistinct(col("__shard")).as("s"), count(lit(1)).as("n"))
        .where(col("n") <= 16).agg(max(col("s"))).head().getLong(0)
      assert(coldShards == 1, s"cold buckets sharded: $coldShards")
    } finally spark.conf.unset("graft.dedup.skewThreshold")
    // guard off (threshold <= 0): plain join, same pairs, no shard col
    try {
      spark.conf.set("graft.dedup.skewThreshold", "0")
      val off = DedupQueries.bucketSelfJoin(spark, a, b,
        Seq("band", "bucket"))
      assert(!off.queryExecution.executedPlan.toString.contains("__shard"))
      assert(pairs(off) == plain)
    } finally spark.conf.unset("graft.dedup.skewThreshold")
  }
}
