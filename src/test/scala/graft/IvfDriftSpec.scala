package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries
import graft.streaming.VectorIngest

/** IVF maintenance under drift (VERDICT r7 #4): a corpus that keeps
  * ingesting from a distribution the coarse centroids were never
  * trained on degrades probed recall; the drift metric must see it,
  * rebalanceIvf must recover it, and the exactly-once ingest contract
  * must survive the consolidation.
  *
  * The drifted feed is built to be the honest failure mode: clusters
  * whose spread is comparable to the stale centroids' dot gaps, so
  * members scatter across several stale lists while staying genuine
  * cosine neighbors — probes miss the lists beyond the probe budget.
  * After Lloyd re-training on the current corpus's true embeddings,
  * centroids move into the clusters and members co-locate again. */
class IvfDriftSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = 64

  private def unit(rng: scala.util.Random): Array[Double] = {
    val v = Array.fill(dims)(rng.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("drift degrades probed recall; rebalance detects and recovers it") {
    import spark.implicits._
    val rng = new scala.util.Random(2026)

    // base corpus: unit-shell gaussians (per-dim σ = 1/√64 — the scale
    // the fixed PQ codebooks quantize well, like the testdata table)
    val base = (0 until 300).map { i =>
      (i.toLong, Array.fill(dims)((rng.nextGaussian() / 8.0).toFloat))
    }
    // drifted feed: 12 unit-norm cosine clusters of k-sized membership
    // with per-dim spread σ = 1/16 — members stay genuine cosine
    // neighbors (cos ≈ 0.9 within a cluster vs ~0 across) while the
    // perturbation is comparable to the stale centroids' dot gaps, so
    // members straddle list boundaries under the stale layout; after
    // re-training, a centroid lands on each cluster and members
    // co-locate (12 clusters ≤ 16 lists). k-sized clusters make the
    // truth separable at cluster granularity — recall then measures the
    // COARSE layout, not the PQ code's in-cluster resolution (with big
    // clusters the metric saturates at the quantization ceiling and no
    // layout can move it; measured while building this spec).
    val centers = Array.fill(12)(unit(rng))
    val drifted = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 10).map { j =>
        (1000L + ci * 100L + j,
          c.zip(Array.fill(dims)(rng.nextGaussian() / 16.0))
            .map { case (a, b) => (a + b).toFloat })
      }
    }
    val baseDf = base.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    // PQ books TRAINED on the base corpus (the FAISS build lifecycle;
    // the fixed seeded books quantize too coarsely for recall to see
    // layout effects at all)
    val books = DedupQueries.trainPqCodebooks(
      base.take(256).map(_._2.map(f =>
        DedupQueries.scale1e6(f.toDouble))).toArray)
    VectorIndex.buildIvfPq(spark, dir, baseDf, books)
    val driftBefore = VectorIndex.ivfDrift(spark, dir)
    assert(driftBefore < 0.05,
      s"freshly built index already reports drift $driftBefore")

    // ingest the drifted feed in two batches
    drifted.grouped(60).zipWithIndex.foreach { case (b, i) =>
      VectorIngest.appendBatch(spark, dir,
        b.toSeq.toDF("vec_id", "embedding"), batchId = i.toLong, books)
    }
    // 120 drifted rows against 300 base move ~8 points of mass; the
    // spec gates at 0.05 (the bound is a caller knob — 0.2 default
    // suits production batch/corpus ratios)
    val driftAfterIngest = VectorIndex.ivfDrift(spark, dir)
    assert(driftAfterIngest > 0.05,
      s"drifted ingest only moved the metric to $driftAfterIngest")

    // recall of probed serving vs exact cosine truth, on drifted queries
    val all = (base ++ drifted).map { case (id, e) =>
      (id, e.map(_.toDouble))
    }
    val queries = drifted.zipWithIndex.collect {
      case ((id, e), i) if i % 10 == 0 => (id, e) // one per cluster
    }
    val k = 10
    def truthOf(qe: Array[Float]): Set[Long] = {
      val qd = qe.map(_.toDouble)
      val qn = math.sqrt(DedupQueries.dotScaled(qd, qd).toDouble)
      all.map { case (cid, ce) =>
        val cn = math.sqrt(DedupQueries.dotScaled(ce, ce).toDouble)
        (cid, DedupQueries.dotScaled(qd, ce) / (qn * cn))
      }.sortBy { case (cid, cos) => (-cos, cid) }.take(k).map(_._1).toSet
    }
    val truth = queries.map { case (id, e) => id -> truthOf(e) }.toMap
    def recall(): Double = {
      // probes = 2 (of 16): tight probe budget makes the layout the
      // binding term — exactly the regime maintenance exists for
      val served = VectorIndex.searchIvfPq(spark, dir,
        queries.toSeq.toDF("query_id", "embedding"), k = k, probes = 2)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      queries.map { case (q, _) =>
        (served.getOrElse(q, Set.empty) & truth(q)).size.toDouble / k
      }.sum / queries.length
    }
    val recallStale = recall()

    // maintenance gate fires, re-trains, consolidates the stream
    assert(VectorIndex.maintainIvf(spark, dir, bound = 0.05),
      "maintainIvf did not trigger on a drifted layout")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "ivf_codes_stream")),
      "rebalance left the stream table unconsolidated")
    val driftAfterRebalance = VectorIndex.ivfDrift(spark, dir)
    assert(driftAfterRebalance < 0.02,
      s"rebalance did not reset the trained layout ($driftAfterRebalance)")
    assert(!VectorIndex.maintainIvf(spark, dir, bound = 0.05),
      "maintainIvf re-triggered immediately after a rebalance")

    val recallRetrained = recall()
    assert(recallRetrained >= recallStale + 0.1,
      s"recall did not recover: stale $recallStale → retrained $recallRetrained")

    // nothing lost in the consolidation: every id serves from the base
    // table exactly once
    val codes = spark.read.parquet(s"$dir/ivf_codes")
    assert(codes.count() == all.length)
    assert(codes.select("cand_id").distinct().count() == all.length)

    // exactly-once across the fold-in: replaying an ALREADY-CONSOLIDATED
    // batch re-lands it in the stream table, and serving still never
    // repeats a candidate in one top-k
    VectorIngest.appendBatch(spark, dir,
      drifted.take(60).toSeq.toDF("vec_id", "embedding"), batchId = 0L)
    val served = VectorIndex.searchIvfPq(spark, dir,
      queries.toSeq.toDF("query_id", "embedding"), k = k).collect()
    served.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cands = rs.map(_.getLong(2))
      assert(cands.distinct.length == cands.length,
        s"query $q repeats a candidate after replay")
    }
    // and a NEW batch after the rebalance lands under the new layout
    val fresh = (0 until 20).map { j =>
      (5000L + j, centers(0).map(v => (v + rng.nextGaussian()).toFloat))
    }
    VectorIngest.appendBatch(spark, dir,
      fresh.toDF("vec_id", "embedding"), batchId = 50L)
    val postIds = VectorIndex.searchIvfPq(spark, dir,
      fresh.take(3).toDF("vec_id", "embedding")
        .withColumnRenamed("vec_id", "query_id"), k = 3)
      .select("cand_id").as[Long].collect().toSet
    assert(postIds.nonEmpty)

    // a batch whose vectors payload is missing (killed between the two
    // stream writes) must make rebalance REFUSE, not silently drop the
    // orphaned codes during the fold-in
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(java.nio.file.Paths.get(dir, "ivf_vectors_stream", "ingest_batch=50")
      .toFile)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.rebalanceIvf(spark, dir)
    }
    assert(e.getMessage.contains("half-written"))
    // replaying the batch repairs it and rebalance proceeds
    VectorIngest.appendBatch(spark, dir,
      fresh.toDF("vec_id", "embedding"), batchId = 50L)
    VectorIndex.rebalanceIvf(spark, dir)
    assert(spark.read.parquet(s"$dir/ivf_codes").count() ==
      all.length + fresh.length)
  }

  test("crashed-rebalance self-heal and mid-rebalance ingest survival") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = (0 until 200).map { i =>
      (i.toLong, Array.fill(dims)((rng.nextGaussian() / 8.0).toFloat))
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfcrash").toString
    val books = DedupQueries.trainPqCodebooks(
      base.take(128).map(_._2.map(f =>
        DedupQueries.scale1e6(f.toDouble))).toArray)
    VectorIndex.buildIvfPq(spark, dir, base.toDF("vec_id", "embedding"),
      books)

    // Simulate a kill mid ivf_codes overwrite: meta_ivf.json is already
    // dropped (the marker-first protocol) and some list partitions of
    // the codes table never made it to disk — their vectors survive
    // only in ivf_vectors.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "meta_ivf.json"))
    val listDirs = java.nio.file.Paths.get(dir, "ivf_codes").toFile
      .listFiles().filter(_.getName.startsWith("list="))
    assert(listDirs.length > 2, "fixture needs several list partitions")
    val lost = spark.read.parquet(listDirs.take(2).map(_.toString): _*)
      .select("cand_id").as[Long].collect().toSet
    assert(lost.nonEmpty)
    listDirs.take(2).foreach(rm)

    // The rerun must re-encode the lost codes from ivf_vectors with the
    // persisted books — not consolidate the vectors away.
    VectorIndex.rebalanceIvf(spark, dir)
    val healedIds = spark.read.parquet(s"$dir/ivf_codes")
      .select("cand_id").as[Long].collect()
    assert(healedIds.length == base.length, "self-heal lost rows")
    assert(healedIds.toSet == base.map(_._1).toSet,
      "self-heal did not restore the lost cand_ids")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_ivf.json")))
    // healed codes still serve: a lost id queried against itself comes
    // back as its own top candidate
    val probe = lost.head
    val probeEmb = base.find(_._1 == probe).get._2
    val top = VectorIndex.searchIvfPq(spark, dir,
      Seq((probe, probeEmb)).toDF("query_id", "embedding"), k = 1,
      probes = DedupQueries.IvfClusters)
      .select("cand_id").as[Long].collect()
    assert(top.headOption.contains(probe),
      s"healed id $probe does not serve itself (got ${top.toSeq})")

    // A batch landing AFTER rebalance snapshots the stream dirs must
    // never be deleted-without-fold-in: it either survives on disk for
    // the next run or is consolidated — its rows always serve.
    val late = (0 until 15).map { j =>
      (9000L + j, Array.fill(dims)((rng.nextGaussian() / 8.0).toFloat))
    }
    VectorIndex.postEnumerateHook = () =>
      VectorIngest.appendBatch(spark, dir,
        late.toDF("vec_id", "embedding"), batchId = 77L, books)
    try VectorIndex.rebalanceIvf(spark, dir)
    finally VectorIndex.postEnumerateHook = () => ()
    val lateCodesDir = java.nio.file.Paths.get(dir,
      "ivf_codes_stream", "ingest_batch=77")
    val lateVecsDir = java.nio.file.Paths.get(dir,
      "ivf_vectors_stream", "ingest_batch=77")
    assert(java.nio.file.Files.exists(lateCodesDir) &&
      java.nio.file.Files.exists(lateVecsDir),
      "mid-rebalance batch was deleted before a fold-in it missed")
    val lateProbe = VectorIndex.searchIvfPq(spark, dir,
      Seq((9000L, late.head._2)).toDF("query_id", "embedding"), k = 1,
      probes = DedupQueries.IvfClusters)
      .select("cand_id").as[Long].collect()
    assert(lateProbe.headOption.contains(9000L),
      "mid-rebalance batch does not serve")
    // the NEXT rebalance folds it in exactly once
    VectorIndex.rebalanceIvf(spark, dir)
    assert(!java.nio.file.Files.exists(lateCodesDir) &&
      !java.nio.file.Files.exists(lateVecsDir))
    val finalCodes = spark.read.parquet(s"$dir/ivf_codes")
    assert(finalCodes.count() == base.length + late.length)
    assert(finalCodes.select("cand_id").distinct().count() ==
      base.length + late.length,
      "fold-in duplicated a mid-rebalance batch's rows")
  }
}
