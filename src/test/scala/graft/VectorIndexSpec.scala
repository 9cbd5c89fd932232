package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, Tables}

/** The persisted graph-ANN index lifecycle: build once, serve many —
  * and the serve path must agree exactly with x47's inline form. */
class VectorIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("persisted index serves x47's exact results without a build stage") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val label0 = Tables.embeddings(spark, sf).where(col("label") === 0)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.build(spark, dir, label0)

    // x47's query convention: the GraphQueryCount lowest tenant ids
    val qIds = label0.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(DedupQueries.GraphQueryCount).as[Long].collect().toSet
    val queries = label0.where(col("vec_id").isin(qIds.toSeq: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))

    val served = VectorIndex.search(spark, dir, queries, excludeSelf = true)
    // no build stage in the serve plan: the kNN kernel's groupByKey
    // would show as MapGroups; serving is scans + joins + mapPartitions
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("MapGroups"),
      "serve plan contains the graph-build kernel — index not persisted")

    val inline = DedupQueries.x47AnnGraphSearch(spark, sf)
    val a = served.collect().map(_.toString).toSeq
    val b = inline.collect().map(_.toString).toSeq
    assert(a == b, "persisted-index serving diverged from x47's inline form")

    // serve-many: a second search is deterministic
    val again = VectorIndex.search(spark, dir, queries, excludeSelf = true)
      .collect().map(_.toString).toSeq
    assert(again == a)

    // a fresh query (not in the head batch) gets k results from the
    // persisted graph alone
    val other = label0.orderBy(col("vec_id").desc).limit(1)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val r = VectorIndex.search(spark, dir, other, k = 3)
    assert(r.count() == 3)
  }

  test("persisted PQ index serves x44's exact results from stored codes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildPq(spark, dir, emb)

    // x44's query convention: vec_id < 10 over the full table
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val served = VectorIndex.searchPq(spark, dir, queries, excludeSelf = true)
    // serving must not re-encode the corpus: the scan side reads the
    // codes column (8 bytes/vector), never the embedding array
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "PQ serve plan scans the raw embeddings table")

    val inline = DedupQueries.x44AnnPqServe(spark, sf)
    assert(served.collect().map(_.toString).toSeq ==
      inline.collect().map(_.toString).toSeq,
      "persisted-PQ serving diverged from x44's inline form")
  }

  test("persisted IVF-PQ index prunes unprobed list partitions and matches x39") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildIvfPq(spark, dir, emb)

    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val served = VectorIndex.searchIvfPq(spark, dir, queries, excludeSelf = true)

    // the list partition column must actually prune the codes scan:
    // 10 queries x 3 probes touch at most 16 (and here fewer) of the
    // list=... partitions — the scan's selected partitions must be a
    // strict subset of the clusters
    // sparkPlan, not executedPlan: AQE wraps the executed tree in an
    // AdaptiveSparkPlanExec whose query stages are leaf nodes, so a
    // collect over it never sees the scans
    val scans = served.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val codesScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("ivf_codes"))).get
    assert(codesScan.metadata("PartitionFilters").contains("list"),
      "codes scan carries no list partition filter")
    val selected = codesScan.selectedPartitions.partitionCount
    assert(selected < DedupQueries.IvfClusters,
      s"scan opened $selected of ${DedupQueries.IvfClusters} lists — no pruning")

    val inline = DedupQueries.x39AnnIvfPq(spark, sf)
    assert(served.collect().map(_.toString).toSeq ==
      inline.collect().map(_.toString).toSeq,
      "persisted IVF-PQ serving diverged from x39's inline form")
  }

  test("binary index: exact with a full shortlist, rescore beats raw hamming") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("binidx").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildBinary(spark, dir, emb)
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))

    // serving reads the 8-byte codes table, never the raw embeddings
    // (queries excepted — they arrive as a collected batch)
    val served = VectorIndex.searchBinary(spark, dir, queries, k = 10,
      shortlist = 100, excludeSelf = true)
    assert(!served.queryExecution.executedPlan.toString
      .contains("embeddings.parquet"),
      "binary serve plan scans the raw embeddings table")

    // ground truth: exact cosine top-10, x3's arithmetic and tiebreak
    val all = emb.as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e.map(_.toDouble)) }
    def norm(e: Array[Double]) = math.sqrt(DedupQueries.normScaled(e).toDouble)
    val truth = all.filter(_._1 < 10).sortBy(_._1).map { case (qid, qe) =>
      qid -> all.filter(_._1 != qid)
        .map { case (cid, ce) =>
          (cid, DedupQueries.dotScaled(qe, ce) / (norm(qe) * norm(ce)))
        }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(10).map(_._1).toSeq
    }.toMap

    // shortlist >= corpus: the rescore sees everything => exact top-k
    val full = VectorIndex.searchBinary(spark, dir, queries, k = 10,
      shortlist = all.length, excludeSelf = true)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(full == truth, "full-shortlist binary search is not exact")

    // bounded shortlist: rescoring the hamming shortlist must recall at
    // least as much as ranking BY hamming (the raw x88 order) does
    def recallOf(m: Map[Long, Seq[Long]]): Double =
      truth.map { case (q, t) =>
        m(q).toSet.intersect(t.toSet).size.toDouble / 10
      }.sum / truth.size
    val servedTop = served.collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val x88Top = graft.queries.MiningQueries.x88AnnBinary(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val (rServed, rRaw) = (recallOf(servedTop), recallOf(x88Top))
    info(f"binary index recall@10: rescored(100)=$rServed%.2f raw-hamming=$rRaw%.2f")
    assert(rServed >= rRaw,
      f"rescore $rServed%.2f under raw hamming $rRaw%.2f")
  }

  test("VectorIndexTool round-trips build + search through parquet on disk") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vtool").toString
    val embSrc = "/root/testdata/sf0.001/embeddings.parquet"
    // a 3-query batch written the way an operator would hand it over
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .write.parquet(s"$root/queries.parquet")
    VectorIndexTool.run(spark, Array("build", "pq", s"$root/idx", embSrc))
    VectorIndexTool.run(spark, Array("search", "pq", s"$root/idx",
      s"$root/queries.parquet", s"$root/out.parquet", "4"))
    val out = spark.read.parquet(s"$root/out.parquet")
    assert(out.count() == 3 * 4)
    assert(out.columns.sorted.toSeq ==
      Seq("cand_id", "cosine", "query_id", "rank"))
    // ranks are 1..k per query and scores weakly decrease with rank
    val rows = out.orderBy(col("query_id"), col("rank"))
      .collect().groupBy(_.getLong(out.columns.indexOf("query_id")))
    rows.values.foreach { g =>
      val byRank = g.sortBy(_.getInt(out.columns.indexOf("rank")))
      assert(byRank.map(_.getInt(out.columns.indexOf("rank"))).toSeq ==
        (1 to 4))
      val scores = byRank.map(_.getDouble(out.columns.indexOf("cosine")))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // the hierarchical family round-trips through the same CLI
    VectorIndexTool.run(spark, Array("build", "hier", s"$root/hidx", embSrc))
    VectorIndexTool.run(spark, Array("search", "hier", s"$root/hidx",
      s"$root/queries.parquet", s"$root/hout.parquet", "3"))
    assert(spark.read.parquet(s"$root/hout.parquet").count() == 3 * 3)
    // and the binary family
    VectorIndexTool.run(spark, Array("build", "bin", s"$root/bidx", embSrc))
    VectorIndexTool.run(spark, Array("search", "bin", s"$root/bidx",
      s"$root/queries.parquet", s"$root/bout.parquet", "3"))
    assert(spark.read.parquet(s"$root/bout.parquet").count() == 3 * 3)
    intercept[IllegalArgumentException] {
      VectorIndexTool.run(spark, Array("build", "hnsw", s"$root/idx", embSrc))
    }
    // the insert verb grows an existing graph index from the CLI
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") >= 480)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .write.parquet(s"$root/grow.parquet")
    VectorIndexTool.run(spark,
      Array("insert", "hier", s"$root/hidx", s"$root/grow.parquet"))
    VectorIndexTool.run(spark, Array("search", "hier", s"$root/hidx",
      s"$root/queries.parquet", s"$root/hout2.parquet", "3"))
    assert(spark.read.parquet(s"$root/hout2.parquet").count() == 3 * 3)
    intercept[IllegalArgumentException] {
      VectorIndexTool.run(spark,
        Array("insert", "pq", s"$root/idx", s"$root/grow.parquet"))
    }
  }

  test("serve default keeps coincidental id collisions (fresh-id batches)") {
    // a fresh query batch numbered 0..n-1 can collide with corpus ids;
    // by default NO candidate is dropped for sharing the query's id, so
    // a query that happens to equal corpus vector 0 still finds it
    // (cosine 1.0 at rank 1). excludeSelf=true is the opt-in for
    // batches whose ids ARE corpus ids (the registry convention above).
    val d001 = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("collidx").toString
    val emb = Tables.embeddings(spark, d001)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildPq(spark, dir, emb)
    val q = emb.where(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = VectorIndex.searchPq(spark, dir, q, k = 1).collect().head
    assert(top.getLong(top.fieldIndex("cand_id")) == 0L)
    assert(top.getDouble(top.fieldIndex("cosine")) == 1.0)
    // the corpus-convention opt-in excludes it again
    val top2 = VectorIndex.searchPq(spark, dir, q, k = 1,
      excludeSelf = true).collect().head
    assert(top2.getLong(top2.fieldIndex("cand_id")) != 0L)
  }

  test("hierarchical index: geometric layers, deterministic serving, recall") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vecidxh").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildHier(spark, dir, emb)

    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json"))
    val levels = """"levels":(\d+)""".r.findFirstMatchIn(txt).get
      .group(1).toInt
    assert(levels >= 1, s"expected at least one upper layer, meta=$txt")
    // layer populations decay (geometric p=1/4 in expectation)
    var prev = spark.read.parquet(s"$dir/graph")
      .select(col("src_id")).distinct.count()
    for (l <- 1 to levels) {
      val nl = spark.read.parquet(s"$dir/graph_l$l")
        .select(col("src_id")).distinct.count()
      assert(nl < prev, s"layer $l has $nl nodes, layer ${l - 1} $prev")
      prev = nl
    }

    val queries = emb.orderBy(col("vec_id"))
      .limit(DedupQueries.GraphQueryCount)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val k = 10
    // a serving-grade budget (the defaults are the x47 oracle's tiny
    // deterministic walk): beam 8 × 6 rounds over the degree-4 graph
    val (bw, rr) = (8, 6)
    val hier = VectorIndex.searchHier(spark, dir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    val qids = hier.map(_.getLong(0)).distinct
    assert(qids.length == DedupQueries.GraphQueryCount)
    qids.foreach { q =>
      val ranks = hier.filter(_.getLong(0) == q)
        .map(_.getInt(1).toLong).sorted
      assert(ranks.toSeq == (1L to k).toSeq, s"query $q ranks $ranks")
    }
    // serve-many determinism
    val again = VectorIndex.searchHier(spark, dir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    assert(again.map(_.toString).toSeq == hier.map(_.toString).toSeq)

    // recall vs exact brute force, flat search as the baseline at the
    // same layer-0 budget
    val all = emb.as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = qids.map { q =>
      val qe = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (c, ce) => (c, cosine(qe, ce)) }
        .sortBy { case (c, cs) => (-cs, c) }.take(k).map(_._1).toSet
    }.toMap
    val flat = VectorIndex.search(spark, dir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      qids.map { q =>
        val got = rows.filter(_.getLong(0) == q).map(r => r.getLong(2)).toSet
        got.intersect(truth(q)).size.toDouble / k
      }.sum / qids.length
    val hr = recallOf(hier)
    val fr = recallOf(flat)
    // the corpus table is ISOTROPIC (within-label mean cos 0.004 ≈
    // across 0.002), so graph navigation cannot systematically beat
    // diverse fixed entries here — only sanity-bound the gap; the
    // navigation claim is tested on planted clusters below
    info(f"recall@10 (isotropic corpus): hier $hr%.3f vs flat $fr%.3f " +
      f"(levels=$levels)")
    assert(hr >= fr * 0.5, f"hier recall $hr%.3f collapsed vs flat $fr%.3f")
  }

  test("hierarchical descent beats flat entries on clustered data") {
    import spark.implicits._
    // planted structure: 16 well-separated clusters — the regime the
    // HNSW hierarchy exists for (entry descends to the right cluster
    // instead of walking from a fixed low-id entry that sits in
    // cluster 0). Deterministic: noise from a per-id seeded Random.
    val dim = 64
    val clusters = 16
    val perCluster = 40
    val pts = (0 until clusters * perCluster).map { id =>
      val c = id / perCluster
      val rnd = new scala.util.Random(1000L + id)
      val e = Array.tabulate(dim)(j =>
        (if (j == c * 4 % dim) 4.0 else 0.0) + 0.3 * rnd.nextGaussian())
      (id.toLong, e.map(_.toFloat))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("vecidxc").toString
    // degree 8: a degree-4 graph fragments 40-point clusters into
    // pockets the beam cannot leave (visited plateaus near recall 0.5)
    VectorIndex.buildHier(spark, dir, emb, degree = 8)

    // queries: one point from each of 10 different clusters (never
    // cluster 0, where the flat entries live)
    val qids = (1 to 10).map(c => (c * perCluster + 7).toLong)
    val queries = emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val k = 10
    val (bw, rr) = (8, 4)
    val hier = VectorIndex.searchHier(spark, dir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    val flat = VectorIndex.search(spark, dir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()

    val all = pts.map { case (id, e) => id -> e.map(_.toDouble) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = qids.map { q =>
      val qe = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (c, ce) => (c, cosine(qe, ce)) }
        .sortBy { case (c, cs) => (-cs, c) }.take(k).map(_._1).toSet
    }.toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      qids.map { q =>
        val got = rows.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
        got.intersect(truth(q)).size.toDouble / k
      }.sum / qids.length
    val hr = recallOf(hier)
    val fr = recallOf(flat)
    info(f"recall@10 (16 planted clusters): hier $hr%.3f vs flat $fr%.3f")
    assert(hr > fr, f"descent $hr%.3f did not beat fixed entries $fr%.3f")
    assert(hr >= 0.8, f"hier recall $hr%.3f under 0.8 on separable clusters")
  }

  test("incremental insert: grown index serves on par with batch-built") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val even = emb.where(col("vec_id") % 2 === 0)
    val odd = emb.where(col("vec_id") % 2 === 1)
    val grownDir = java.nio.file.Files.createTempDirectory("vgrow").toString
    val fullDir = java.nio.file.Files.createTempDirectory("vfull").toString
    VectorIndex.build(spark, grownDir, even)
    VectorIndex.insert(spark, grownDir, odd)
    VectorIndex.build(spark, fullDir, emb)

    val n = emb.count()
    assert(spark.read.parquet(s"$grownDir/vectors").count() == n)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(grownDir, "meta.json")).contains(s""""vectors":$n"""))
    // adjacency invariants: every node capped at degree, every
    // inserted node fully linked
    val g = spark.read.parquet(s"$grownDir/graph")
    val degs = g.groupBy(col("src_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degs.values.max <= DedupQueries.GraphDegree)
    val oddIds = odd.select(col("vec_id")).as[Long].collect()
    oddIds.foreach(id => assert(degs.getOrElse(id, 0L) > 0,
      s"inserted $id has no out-edges"))

    val queries = emb.orderBy(col("vec_id"))
      .limit(DedupQueries.GraphQueryCount)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (k, bw, rr) = (10, 8, 6)
    val servedG = VectorIndex.search(spark, grownDir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    val servedF = VectorIndex.search(spark, fullDir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    val all = emb.as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val qids = servedG.map(_.getLong(0)).distinct
    val truth = qids.map { q =>
      val qe = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (c, ce) => (c, cosine(qe, ce)) }
        .sortBy { case (c, cs) => (-cs, c) }.take(k).map(_._1).toSet
    }.toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      qids.map { q =>
        val got = rows.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
        got.intersect(truth(q)).size.toDouble / k
      }.sum / qids.length
    val (rg, rf) = (recallOf(servedG), recallOf(servedF))
    info(f"recall@10: grown $rg%.3f vs batch-built $rf%.3f")
    assert(rg >= rf - 0.1,
      f"incrementally-grown recall $rg%.3f collapsed vs batch $rf%.3f")

  }

  test("hier insert: grown layers serve within 0.1 of from-scratch build") {
    import spark.implicits._
    // the planted-cluster corpus from the descent test — the regime
    // where the hierarchy (and therefore correct per-layer linkage of
    // inserted nodes) actually carries the recall
    val dim = 64
    val clusters = 16
    val perCluster = 40
    val pts = (0 until clusters * perCluster).map { id =>
      val c = id / perCluster
      val rnd = new scala.util.Random(1000L + id)
      val e = Array.tabulate(dim)(j =>
        (if (j == c * 4 % dim) 4.0 else 0.0) + 0.3 * rnd.nextGaussian())
      (id.toLong, e.map(_.toFloat))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val even = emb.where(col("vec_id") % 2 === 0)
    val odd = emb.where(col("vec_id") % 2 === 1)
    val grownDir = java.nio.file.Files.createTempDirectory("vgrowh").toString
    val fullDir = java.nio.file.Files.createTempDirectory("vfullh").toString
    VectorIndex.buildHier(spark, grownDir, even, degree = 8)
    VectorIndex.insert(spark, grownDir, odd)
    VectorIndex.buildHier(spark, fullDir, emb, degree = 8)

    // the grown index's layer membership must match the deterministic
    // hash draw: every inserted id of level ≥ ℓ has out-edges in
    // graph_lℓ
    val metaTxt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(grownDir, "meta.json"))
    val levels = """"levels":(\d+)""".r
      .findFirstMatchIn(metaTxt).get.group(1).toInt
    val maxLevel = """"maxLevel":(\d+)""".r
      .findFirstMatchIn(metaTxt).get.group(1).toInt
    assert(levels >= 1, s"planted corpus built no upper layers: $metaTxt")
    val oddIds = odd.select(col("vec_id")).as[Long].collect()
    (1 to levels).foreach { l =>
      val srcs = spark.read.parquet(s"$grownDir/graph_l$l")
        .select(col("src_id")).as[Long].collect().toSet
      oddIds.filter(id => VectorIndex.hierLevel(id, maxLevel) >= l)
        .foreach(id => assert(srcs.contains(id),
          s"inserted $id (level ≥ $l) missing from graph_l$l"))
    }

    val qids = (1 to 10).map(c => (c * perCluster + 7).toLong)
    val queries = emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val k = 10
    val (bw, rr) = (8, 4)
    val grown = VectorIndex.searchHier(spark, grownDir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    val full = VectorIndex.searchHier(spark, fullDir, queries, k = k,
      beamWidth = bw, rounds = rr, excludeSelf = true).collect()
    val all = pts.map { case (id, e) => id -> e.map(_.toDouble) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = qids.map { q =>
      val qe = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (c, ce) => (c, cosine(qe, ce)) }
        .sortBy { case (c, cs) => (-cs, c) }.take(k).map(_._1).toSet
    }.toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      qids.map { q =>
        val got = rows.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
        got.intersect(truth(q)).size.toDouble / k
      }.sum / qids.length
    val (rg, rf) = (recallOf(grown), recallOf(full))
    info(f"hier recall@10: grown $rg%.3f vs from-scratch $rf%.3f")
    assert(rg >= rf - 0.1,
      f"grown-hier recall $rg%.3f collapsed vs from-scratch $rf%.3f")
  }

  test("hier insert promotes new top layers; promoted layer == from-scratch") {
    import spark.implicits._
    val dim = 64
    val clusters = 16
    val perCluster = 40
    val pts = (0 until clusters * perCluster).map { id =>
      val c = id / perCluster
      val rnd = new scala.util.Random(3000L + id)
      val e = Array.tabulate(dim)(j =>
        (if (j == c * 4 % dim) 4.0 else 0.0) + 0.3 * rnd.nextGaussian())
      (id.toLong, e.map(_.toFloat))
    }
    val maxLevel = 6
    val ids = pts.map(_._1)
    val lvl = ids.map(id => id -> VectorIndex.hierLevel(id, maxLevel)).toMap
    // engineer a base whose level-3 population is exactly ONE member, so
    // buildHier stops below 3; the insert batch then restores the rest
    // and the grown corpus deserves the layer the base never built
    val high = ids.filter(lvl(_) >= 3)
    assert(high.size >= 2,
      s"fixture needs ≥ 2 level-3 draws among ${ids.size} ids, got ${high.size}")
    val holdOut = high.drop(1).toSet
    val emb = pts.toDF("vec_id", "embedding")
    val base = emb.where(!col("vec_id").isin(holdOut.toSeq: _*))
    val batch = emb.where(col("vec_id").isin(holdOut.toSeq: _*))
    val grownDir = java.nio.file.Files.createTempDirectory("vpromo").toString
    val fullDir = java.nio.file.Files.createTempDirectory("vpromof").toString
    VectorIndex.buildHier(spark, grownDir, base, degree = 8)
    val levelsBase = """"levels":(\d+)""".r.findFirstMatchIn(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(grownDir, "meta.json"))).get.group(1).toInt
    assert(levelsBase < 3,
      s"base unexpectedly built level 3 with one member ($levelsBase)")

    VectorIndex.insert(spark, grownDir, batch)
    val metaTxt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(grownDir, "meta.json"))
    val levelsGrown = """"levels":(\d+)""".r
      .findFirstMatchIn(metaTxt).get.group(1).toInt
    assert(levelsGrown >= 3,
      s"insert did not promote the hierarchy past $levelsBase: $metaTxt")

    // every PROMOTED layer is built by buildHier's exact rule over the
    // deterministic level subset, so it must equal the from-scratch
    // build's layer row-for-row
    VectorIndex.buildHier(spark, fullDir, emb, degree = 8)
    val levelsFull = """"levels":(\d+)""".r.findFirstMatchIn(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(fullDir, "meta.json"))).get.group(1).toInt
    assert(levelsGrown == levelsFull,
      s"grown levels $levelsGrown != from-scratch $levelsFull")
    ((levelsBase + 1) to levelsGrown).foreach { l =>
      def rows(d: String) = spark.read.parquet(s"$d/graph_l$l")
        .select(col("src_id"), col("rank"), col("nbr_id"))
        .collect().map(_.toString).toSet
      assert(rows(grownDir) == rows(fullDir),
        s"promoted graph_l$l differs from the from-scratch layer")
    }

    // recall parity with the from-scratch build (the #7 done-bar)
    val qids = (1 to 10).map(c => (c * perCluster + 7).toLong)
    val queries = emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val k = 10
    val grown = VectorIndex.searchHier(spark, grownDir, queries, k = k,
      beamWidth = 8, rounds = 4, excludeSelf = true).collect()
    val full = VectorIndex.searchHier(spark, fullDir, queries, k = k,
      beamWidth = 8, rounds = 4, excludeSelf = true).collect()
    val all = pts.map { case (id, e) => id -> e.map(_.toDouble) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = qids.map { q =>
      val qe = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (c, ce) => (c, cosine(qe, ce)) }
        .sortBy { case (c, cs) => (-cs, c) }.take(k).map(_._1).toSet
    }.toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      qids.map { q =>
        val got = rows.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
        got.intersect(truth(q)).size.toDouble / k
      }.sum / qids.length
    val (rg, rf) = (recallOf(grown), recallOf(full))
    info(f"promotion recall@10: grown $rg%.3f vs from-scratch $rf%.3f")
    assert(rg >= rf - 0.1,
      f"grown-with-promotion recall $rg%.3f collapsed vs from-scratch $rf%.3f")
  }

  test("meta guards: a non-index dir fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("notidx").toString
    import spark.implicits._
    val q = Seq((0L, Array(1.0f))).toDF("query_id", "embedding")
    intercept[Exception] { VectorIndex.search(spark, dir, q) }
  }

  test("rebalanceIvf holds the single-writer lease (round 10 parity)") {
    // the lease is acquired BEFORE any index read, so refusal and
    // release-on-failure are pinnable on a bare dir
    val dir = java.nio.file.Files.createTempDirectory("ivflease").toString
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")
    java.nio.file.Files.createDirectories(lease.getParent)
    java.nio.file.Files.write(lease, "other-writer".getBytes)
    val e = intercept[IllegalStateException] {
      VectorIndex.rebalanceIvf(spark, dir)
    }
    assert(e.getMessage.contains("lease"))
    assert(java.nio.file.Files.readString(lease) == "other-writer",
      "refused rebalance must not delete the holder's lease")
    // holder gone → the verb acquires, fails on the empty dir, and
    // must still release its own lease on the way out
    java.nio.file.Files.delete(lease)
    intercept[Exception] { VectorIndex.rebalanceIvf(spark, dir) }
    assert(!java.nio.file.Files.exists(lease),
      "a failed rebalance must still release its lease")
  }

  test("insert holds the single-writer lease (r11: graph rewrites are in-place)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("vinslease").toString
    VectorIndex.build(spark, dir, emb.where(col("vec_id") < 400))
    val before = spark.read.parquet(s"$dir/graph").count()

    // a concurrent holder's live lease → insert refuses fast, graph and
    // meta untouched, lease NOT stolen
    val lease = java.nio.file.Paths.get(dir, "claims", "LEASE")
    java.nio.file.Files.createDirectories(lease.getParent)
    java.nio.file.Files.write(lease, "other-writer".getBytes)
    val e = intercept[IllegalStateException] {
      VectorIndex.insert(spark, dir, emb.where(col("vec_id") >= 400))
    }
    assert(e.getMessage.contains("lease"))
    assert(spark.read.parquet(s"$dir/graph").count() == before,
      "lease-refused insert mutated the graph")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json")).contains(""""vectors":400"""))
    assert(java.nio.file.Files.readString(lease) == "other-writer")

    // holder releases → insert runs and releases its own lease after
    java.nio.file.Files.delete(lease)
    VectorIndex.insert(spark, dir, emb.where(col("vec_id") >= 400))
    assert(!java.nio.file.Files.exists(lease),
      "insert must release its lease")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json"))
      .contains(s""""vectors":${emb.count()}"""))
  }
}
