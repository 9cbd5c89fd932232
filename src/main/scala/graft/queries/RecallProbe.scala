package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall ladders at a NON-TOY vector count (VERDICT r10 missing #2):
  * every published recall figure (x46 SQ8 0.83, x92 binary+rescore
  * 0.58, x102 ensemble 0.81, x108's k-ladder 0.848/0.650/0.571 at
  * k=16/64/128) was pinned on the sf0.1 embeddings table — 2 000
  * isotropic vectors. This main re-measures the same ladders, through
  * the operators' OWN kernels (the AnnRecallSpec discipline), on a
  * seeded 50 000-vector fixture with PLANTED cluster structure
  * (reference analog: part_sim's MC study sweeps pixel levels,
  * `bin.src/part_sim.py:63-66` — one more scale point to show the
  * trade curves hold as cells/buckets get dense).
  *
  * Fixture: C=240 unit-sphere centers (seeded gaussian), vector i =
  * normalize(8·center(i % C) + gauss) — same-cluster cosine ≈ 0.5
  * (straddling x108's 0.4 near-dup threshold, so the dedup ladder has
  * real edges), cross-cluster ≈ ±0.06. Clustered data is the
  * complementary regime to sf0.1's isotropy: cells/buckets go DENSE,
  * which is exactly what the k≈√n rule is supposed to survive.
  *
  * Run: `sbt "runMain graft.queries.RecallProbe [nVectors]"`,
  * grep `[recall50k]`. ~6 min at 50 000 on local[32].
  */
object RecallProbe {

  private val Dims = 64
  private val Centers = 240
  private val K = 10

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    // arm filter: "all" (default), "ladders" (the original kernel
    // ladders incl. the expensive x108 exact arms), or "serve" (the
    // round-15 persisted-estate serving ladders only — graph beams +
    // binary capFactor — for re-measuring the recall-vs-latency knobs
    // without paying the 25-min 200k exact pair scans again)
    val arms = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // the probe's edge-set compares join ~10^8-row pair tables against
      // each other — at 200k vectors the planner picked a broadcast for
      // an 8.9 GiB side and died on the 8 GiB hard cap. Every join in
      // this MAIN is huge-by-huge by construction (the serving kernels'
      // centroid/book broadcasts are explicit sc.broadcast variables,
      // unaffected), so auto-broadcast is off for the probe session.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def log(s: String): Unit = println(s"[recall50k] $s")

    // ---- seeded fixture with planted clusters --------------------------
    val rnd = new scala.util.Random(424242L)
    def gauss(): Double = rnd.nextGaussian()
    val centers = Array.fill(Centers) {
      val c = Array.fill(Dims)(gauss())
      val norm = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / norm)
    }
    // last 10% are PLANTED NEAR-DUPS (jittered copies of the first ids,
    // cosine ≈ 0.95) — the ground truth for the production-threshold
    // (0.9) dedup ladder; everything else relates at the cluster level
    // (≈ 0.5 in-cluster) or below
    val nDup = n / 10
    val baseRaw: Array[Array[Double]] = Array.tabulate(n - nDup) { i =>
      val c = centers(i % Centers)
      Array.tabulate(Dims)(j => 8.0 * c(j) + gauss())
    }
    val vecs: Array[(Long, Array[Double])] = Array.tabulate(n) { i =>
      val raw =
        if (i < n - nDup) baseRaw(i)
        else baseRaw(i - (n - nDup)).map(_ + 0.45 * gauss())
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / norm))
    }
    val emb = vecs.toSeq
      .map { case (id, e) => (id, e.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
      .repartition(32).localCheckpoint(true)
    log(s"""{"fixture":{"n":$n,"dims":$Dims,"centers":$Centers,"seed":424242}}""")

    val queries = vecs.take(10) // ids 0..9 = clusters 0..9, all distinct
    val norms: Array[Double] =
      vecs.map { case (_, e) => math.sqrt(DedupQueries.normScaled(e).toDouble) }
    def cos(q: (Long, Array[Double]), cid: Long): Double =
      DedupQueries.dotScaled(q._2, vecs(cid.toInt)._2) /
        (norms(q._1.toInt) * norms(cid.toInt))

    val trueTop: Map[Long, Set[Long]] = queries.map { q =>
      q._1 -> vecs.iterator.filter(_._1 != q._1)
        .map(c => (c._1, cos(q, c._1)))
        .toArray.sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSet
    }.toMap
    def recallOf(retrieved: Long => Seq[Long]): Double =
      queries.map { q =>
        retrieved(q._1).toSet.intersect(trueTop(q._1)).size.toDouble / K
      }.sum / queries.length

    // ---- round-15 serving ladders (VERDICT r14 next #6) ----------------
    // Recall AND latency through the PERSISTED estate kernels (not the
    // local emulations below): the x47/x103 graph serve across a beam
    // ladder, and the x92 binary serve across the capFactor ladder.
    if (arms == "all" || arms == "serve" || arms == "serve-bin") {
      val queriesDf = queries
        .map { case (id, e) => (id, e.map(_.toFloat)) }.toSeq
        .toDF("query_id", "embedding")
      def recallOfDf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select(col("query_id"), col("cand_id"))
          .as[(Long, Long)].collect().groupBy(_._1)
        queries.map { q =>
          got.getOrElse(q._1, Array.empty).map(_._2).toSet
            .intersect(trueTop(q._1)).size.toDouble / K
        }.sum / queries.length
      }
      def timedMin[T](f: => T): (T, Double) = {
        // min of two runs: the first pays scan warm-up the steady
        // serving path doesn't
        val t0 = System.nanoTime(); f
        val t1 = System.nanoTime(); val out = f
        val t2 = System.nanoTime()
        (out, math.min(t1 - t0, t2 - t1) / 1e9)
      }

      if (arms != "serve-bin") graphServeArm()
      def graphServeArm(): Unit = {
      // graph estate: the exact kNN graph per hier layer, constructed
      // at the driver with a thread pool. The edges are the SAME exact
      // top-degree-by-cosine edges VectorIndex.build/buildHier compute
      // with their O(n^2) block-scan kernels (construction is fixture
      // prep; the measurement below flows through the real persisted-
      // estate serve kernels) — brute force over the in-memory fixture
      // is ~20x faster than the shuffle kernel at 200k, which keeps the
      // probe rerunnable.
      val gdir = java.nio.file.Files
        .createTempDirectory("recall_graph").toString
      // degree is the graph BUILD knob (VectorIndex.build's parameter;
      // x45's default is 4): dense-cluster corpora need more out-edges
      // per node for the beam to climb inside an ~n/240-member cluster
      val degree = if (args.length > 2) args(2).toInt
        else 2 * DedupQueries.GraphDegree
      val maxLevel = 6
      val levelOf = Array.tabulate(n)(i =>
        graft.VectorIndex.hierLevel(i.toLong, maxLevel))
      def exactKnn(member: Int => Boolean): Seq[(Long, Int, Long)] = {
        val ids = (0 until n).filter(member).toArray
        val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Long)]
        val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
        try {
          val tasks = ids.grouped(math.max(1, ids.length / 128)).map { chunk =>
            (() => {
              chunk.foreach { src =>
                val se = vecs(src)._2
                // top-degree by (cosine desc, nbr_id asc) — build()'s order
                val heap = scala.collection.mutable.PriorityQueue
                  .empty[(Double, Long)](Ordering.by(t => (-t._1, t._2)))
                ids.foreach { c =>
                  if (c != src) {
                    val ce = vecs(c)._2
                    var d = 0.0; var j = 0
                    while (j < Dims) { d += se(j) * ce(j); j += 1 }
                    heap.enqueue((d, c.toLong))
                    if (heap.size > degree) heap.dequeue(): Unit
                  }
                }
                heap.toArray.sortBy(t => (-t._1, t._2)).zipWithIndex
                  .foreach { case ((_, nbr), r) =>
                    out.add((src.toLong, r + 1, nbr))
                  }
              }
              ()
            }): java.util.concurrent.Callable[Unit]
          }.toSeq
          import scala.jdk.CollectionConverters._
          pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
        } finally pool.shutdown()
        import scala.jdk.CollectionConverters._
        out.asScala.toSeq
      }
      val gBuild0 = System.nanoTime()
      exactKnn(_ => true).toDF("src_id", "rank", "nbr_id")
        .repartition(8).write.mode("overwrite").parquet(s"$gdir/graph")
      var levels = 0
      var l = 1
      while (l <= maxLevel &&
        (0 until n).count(i => levelOf(i) >= l) >= 2) {
        exactKnn(i => levelOf(i) >= l).toDF("src_id", "rank", "nbr_id")
          .coalesce(1).write.mode("overwrite").parquet(s"$gdir/graph_l$l")
        levels = l
        l += 1
      }
      emb.as[(Long, Array[Float])]
        .map { case (id, e) =>
          val ed = e.map(_.toDouble)
          (id, ed, DedupQueries.dotScaled(ed, ed))
        }.toDF("cand_id", "cand_e", "cand_n")
        .repartition(8).write.mode("overwrite").parquet(s"$gdir/vectors")
      graft.EstateFs.writeStringAtomic(s"$gdir/meta.json",
        s"""{"degree":$degree,"vectors":$n,"levels":$levels,"maxLevel":$maxLevel}""")
      log(f"""{"graph_estate":{"degree":$degree,"levels":$levels,"build_sec":${(System.nanoTime() - gBuild0) / 1e9}%.1f}}""")

      // flat x47 (fixed low-id entries) — the honest number on clustered
      // data: an exact-kNN graph is near-disconnected across clusters,
      // so flat entry cannot navigate out (the README's documented 0.00
      // regime); the hier descent below is the configuration that works
      val (flatDf, flatSec) = timedMin(graft.VectorIndex.search(spark,
        gdir, queriesDf, k = K, excludeSelf = true)
        .localCheckpoint(true))
      log(f"""{"x47_graph_flat":{"beam":${DedupQueries.GraphBeamWidth},"recall":${recallOfDf(flatDf)}%.3f,"serve_sec":$flatSec%.2f}}""")
      // (32,8) measured 0.96 at 20k but 180 s serve — the beam joins
      // blow past the latency budget; (16,6) is the knee of the curve
      Seq((3, 2), (8, 4), (16, 6)).foreach { case (beam, rounds) =>
        val (df, sec) = timedMin(graft.VectorIndex.searchHier(spark,
          gdir, queriesDf, k = K, beamWidth = beam, rounds = rounds,
          excludeSelf = true).localCheckpoint(true))
        log(f"""{"x103_graph_hier":{"beam":$beam,"rounds":$rounds,"recall":${recallOfDf(df)}%.3f,"serve_sec":$sec%.2f}}""")
      }

      graft.EstateFs.deleteRecursive(gdir)
      }

      // binary estate: the x92 ladders through searchBinary. Two knobs,
      // measured separately: capFactor widens only the hK+1 tie SHELL
      // (inert once the shell is exhausted — the 200k curve saturates
      // at ~cap 4), while the BASE shortlist is the knob that keeps
      // buying recall, at exact-rescore cost linear in it.
      val bdir = java.nio.file.Files
        .createTempDirectory("recall_bin").toString
      graft.VectorIndex.buildBinary(spark, bdir, emb)
      Seq(2, 4, 8).foreach { cap =>
        val (df, sec) = timedMin(graft.VectorIndex.searchBinary(spark,
          bdir, queriesDf, k = K,
          shortlist = DedupQueries.RescoreShortlist,
          excludeSelf = true, capFactor = cap).localCheckpoint(true))
        log(f"""{"x92_binary_serve":{"cap_factor":$cap,"base":${DedupQueries.RescoreShortlist},"recall":${recallOfDf(df)}%.3f,"serve_sec":$sec%.2f}}""")
      }
      Seq(4 * DedupQueries.RescoreShortlist,
        16 * DedupQueries.RescoreShortlist).foreach { base =>
        val (df, sec) = timedMin(graft.VectorIndex.searchBinary(spark,
          bdir, queriesDf, k = K, shortlist = base,
          excludeSelf = true).localCheckpoint(true))
        log(f"""{"x92_binary_serve":{"cap_factor":2,"base":$base,"recall":${recallOfDf(df)}%.3f,"serve_sec":$sec%.2f}}""")
      }
      graft.EstateFs.deleteRecursive(bdir)
    }

    if (arms == "serve" || arms == "serve-bin") { spark.stop(); return }

    // ---- x46 SQ8 (8 bits/dim scalar quantization) ----------------------
    {
      val scaled = vecs.map { case (_, e) => e.map(DedupQueries.scale1e6) }
      val mins = Array.tabulate(Dims)(j => scaled.iterator.map(_(j)).min)
      val maxs = Array.tabulate(Dims)(j => scaled.iterator.map(_(j)).max)
      def enc(sv: Array[Long]): Array[Int] = Array.tabulate(Dims) { j =>
        val r = maxs(j) - mins(j)
        if (r == 0L) 0 else (((sv(j) - mins(j)) * 255L) / r).toInt
      }
      val codes = scaled.map(enc)
      val sq8 = recallOf { qid =>
        val qc = codes(qid.toInt)
        vecs.iterator.filter(_._1 != qid).map { c =>
          val cc = codes(c._1.toInt)
          var d2 = 0L; var j = 0
          while (j < Dims) { val t = (qc(j) - cc(j)).toLong; d2 += t * t; j += 1 }
          (c._1, d2)
        }.toArray.sortBy { case (id, d) => (d, id) }.take(K).map(_._1).toSeq
      }
      log(f"""{"x46_sq8_recall":$sq8%.3f}""")
    }

    // ---- x88/x92 binary sign codes: raw Hamming + rescore-100 ----------
    val binCodes = vecs.map { case (_, e) => graft.VectorIndex.signPack(e) }
    def hammingTop(qid: Long, depth: Int): Seq[Long] = {
      val (ql, qh) = binCodes(qid.toInt)
      vecs.iterator.filter(_._1 != qid).map { c =>
        val (cl, ch) = binCodes(c._1.toInt)
        (c._1, (java.lang.Long.bitCount(ql ^ cl)
          + java.lang.Long.bitCount(qh ^ ch)).toLong)
      }.toArray.sortBy { case (id, h) => (h, id) }.take(depth).map(_._1).toSeq
    }
    val binRaw = recallOf(hammingTop(_, K))
    val binRescore = recallOf { qid =>
      // exact rescore of the shortlist ≡ shortlist ∩ truth (rescore is
      // exact within it) — AnnRecallSpec's equivalence
      hammingTop(qid, DedupQueries.RescoreShortlist)
    }
    log(f"""{"x88_binary_raw_recall":$binRaw%.3f,"x92_binary_rescore100_recall":$binRescore%.3f}""")

    // saturation-adaptive shortlist (VERDICT r12 #4): base plus the
    // hK+1 Hamming shell, capped at 2× — the x92/searchBinary serving
    // rule, measured through the same local kernel
    {
      val base = DedupQueries.RescoreShortlist
      var widthSum = 0L
      def adaptiveTop(qid: Long): Seq[Long] = {
        val (ql, qh) = binCodes(qid.toInt)
        val scored = vecs.iterator.filter(_._1 != qid).map { c =>
          val (cl, ch) = binCodes(c._1.toInt)
          (c._1, (java.lang.Long.bitCount(ql ^ cl)
            + java.lang.Long.bitCount(qh ^ ch)).toLong)
        }.toArray.sortBy { case (id, h) => (h, id) }
        val hK = scored(math.min(base, scored.length) - 1)._2
        val w = math.min(2 * base,
          scored.indexWhere(_._2 > hK + 1) match {
            case -1 => scored.length
            case i  => math.max(base, i)
          })
        widthSum += w
        scored.take(w).map(_._1).toSeq
      }
      val adaptive = recallOf(adaptiveTop)
      log(f"""{"x92_adaptive_recall":$adaptive%.3f,"base":$base,"mean_width":${widthSum.toDouble / queries.length}%.1f}""")
    }

    // ---- x14 LSH multiprobe / x15 IVF probe curves ----------------------
    val bucketOf = vecs.map { case (_, e) => DedupQueries.lshBucketOf(e) }
    def lshRecall(radius: Int): Double = recallOf { qid =>
      val q = vecs(qid.toInt)
      val qb = bucketOf(qid.toInt)
      vecs.iterator.filter(c => c._1 != qid &&
        java.lang.Long.bitCount(bucketOf(c._1.toInt) ^ qb) <= radius)
        .map(c => (c._1, cos(q, c._1)))
        .toArray.sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSeq
    }
    val clusterRank = vecs.map { case (_, e) =>
      DedupQueries.ivfCentroids
        .map { case (ci, c) => (ci, DedupQueries.dotScaled(e, c)) }
        .sortBy { case (ci, dot) => (-dot, ci) }.map(_._1)
    }
    val memberOf = clusterRank.map(_.head)
    def ivfRecall(nprobe: Int): Double = recallOf { qid =>
      val q = vecs(qid.toInt)
      val probed = clusterRank(qid.toInt).take(nprobe).toSet
      vecs.iterator.filter(c => c._1 != qid && probed(memberOf(c._1.toInt)))
        .map(c => (c._1, cos(q, c._1)))
        .toArray.sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSeq
    }
    val lshCurve = (0 to 3).map(r => f"\"r$r\":${lshRecall(r)}%.3f").mkString(",")
    val ivfCurve = Seq(1, 2, 3, 8).map(p => f"\"p$p\":${ivfRecall(p)}%.3f").mkString(",")
    log(s"""{"x14_lsh_recall":{$lshCurve},"x15_ivf_recall":{$ivfCurve}}""")

    // ---- x102 ensemble: lsh r=1 ∪ ivf p=3 ∪ binary shortlist-100 --------
    {
      val ensemble = queries.map { q =>
        val qb = bucketOf(q._1.toInt)
        val lsh = vecs.iterator.filter(c => c._1 != q._1 &&
          java.lang.Long.bitCount(bucketOf(c._1.toInt) ^ qb) <= 1)
          .map(_._1).toSet
        val probed = clusterRank(q._1.toInt).take(DedupQueries.IvfProbes).toSet
        val ivf = vecs.iterator.filter(c => c._1 != q._1 &&
          probed(memberOf(c._1.toInt))).map(_._1).toSet
        val bin = hammingTop(q._1, DedupQueries.RescoreShortlist).toSet
        (lsh ++ ivf ++ bin).intersect(trueTop(q._1)).size.toDouble / K
      }.sum / queries.length
      log(f"""{"x102_ensemble_recall":$ensemble%.3f}""")
    }

    // ---- x108 k-ladder at k≈√n (cell-bounded SemDeDup vs exact arm) -----
    // Two thresholds: the ORACLE's aggressive 0.4 (dense regime — on
    // clustered data the in-cluster 0.5-cosine cliques percolate into
    // giant components, so DROP recall is trivially high and EDGE recall
    // is the discriminating number), and a PRODUCTION 0.9 where the
    // edges are exactly the planted jittered-copy pairs and drop recall
    // measures real dedup. False edges/drops are structurally zero
    // (cells only restrict the exact-cosine edge set) — verified, not
    // assumed.
    val ids = emb.select(col("vec_id"))
    val sqrtK = DedupQueries.semDedupCellCount(n)
    def pairsWith(k: Int, thr: Double): (org.apache.spark.sql.DataFrame, Double) = {
      val t0 = System.nanoTime()
      val p = DedupQueries.cellPairScan(spark, emb, k, thr)
        .localCheckpoint(true)
      val sec = (System.nanoTime() - t0) / 1e9
      (p, sec)
    }
    def dropsOf(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
      DedupQueries.semanticDedupDecision(spark, ids, pairs)
        .where(!col("kept")).select(col("vec_id")).as[Long].collect().toSet
    Seq(0.4, 0.9).foreach { thr =>
      // exact arm: ONE cell = the unrestricted block-nested scan (top-R
      // of a single cell is that cell) — x48's semantics at 50k scale
      val (exactPairs, exactSec) = pairsWith(1, thr)
      val nExact = exactPairs.count()
      val exactDrops = dropsOf(exactPairs)
      log(f"""{"x108_exact_arm":{"threshold":$thr%.1f,"edges":$nExact,"drops":${exactDrops.size},"sec":$exactSec%.1f}}""")
      Seq(16, 64, sqrtK, 512).distinct.foreach { k =>
        val (pairs, sec) = pairsWith(k, thr)
        val nK = pairs.count()
        val hit = pairs.join(exactPairs, Seq("vec_a", "vec_b"), "left_semi")
          .count()
        val falseEdges = nK - hit
        val drops = dropsOf(pairs)
        val dropRecall =
          if (exactDrops.isEmpty) 1.0
          else drops.intersect(exactDrops).size.toDouble / exactDrops.size
        val falseDrops = (drops -- exactDrops).size
        log(f"""{"x108_k":$k,"threshold":$thr%.1f,"sqrt_n_k":$sqrtK,"edge_recall":${hit.toDouble / math.max(1L, nExact)}%.3f,"false_edges":$falseEdges,"drop_recall":$dropRecall%.3f,"false_drops":$falseDrops,"drops":${drops.size},"sec":$sec%.1f}""")
        org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(pairs)
      }
      org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(exactPairs)
    }

    spark.stop()
  }
}
