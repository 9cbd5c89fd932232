package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN retrieval QUALITY audit (VERDICT r4 #4): the oracle keys prove
  * the x14/x15/x38/x39 kernels compute exactly what they claim, but at
  * test scale the probes cover nearly everything — this spec measures
  * recall@10 against x3-style brute-force ground truth on the full
  * sf0.1 embedding table (2000 × 64), sweeping the probe knobs, and
  * pins the operating points so a kernel change that silently degrades
  * retrieval fails here even while the hash-match keys stay green.
  * All math runs driver-side through the operators' own kernels
  * (`lshBucketOf`, `ivfCentroids` ranking, `pqEncode`/`pqDist2`), so
  * the audit cannot drift from what the operators execute. */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.1"
  private val K = 10

  private lazy val vecs: Array[(Long, Array[Double])] = {
    import spark.implicits._
    Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .collect().map { case (id, e) => (id, e.map(_.toDouble)) }
      .sortBy(_._1)
  }
  private lazy val queries = vecs.filter(_._1 < 10)
  private lazy val norms: Map[Long, Double] =
    vecs.map { case (id, e) =>
      id -> math.sqrt(DedupQueries.normScaled(e).toDouble)
    }.toMap

  private def cos(q: (Long, Array[Double]), c: (Long, Array[Double])): Double =
    DedupQueries.dotScaled(q._2, c._2) / (norms(q._1) * norms(c._1))

  /** x3-identical ground truth: exact cosine, (desc, id) tiebreak. */
  private lazy val trueTop: Map[Long, Set[Long]] =
    queries.map { q =>
      q._1 -> vecs.filter(_._1 != q._1)
        .map(c => (c._1, cos(q, c)))
        .sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSet
    }.toMap

  private def recallOf(retrieved: Long => Seq[Long]): Double =
    queries.map { q =>
      retrieved(q._1).toSet.intersect(trueTop(q._1)).size.toDouble / K
    }.sum / queries.length

  // ---- per-family retrieval through the operator kernels ----

  private lazy val bucketOf: Map[Long, Long] =
    vecs.map { case (id, e) => id -> DedupQueries.lshBucketOf(e) }.toMap

  /** x14 family: multiprobe radius r = buckets within hamming r. */
  private def lshRecall(radius: Int): Double = recallOf { qid =>
    val q = vecs(qid.toInt)
    val probes = (0L until (1L << DedupQueries.LshPlanes))
      .filter(b => java.lang.Long.bitCount(b ^ bucketOf(qid)) <= radius)
      .toSet
    vecs.filter(c => c._1 != qid && probes.contains(bucketOf(c._1)))
      .map(c => (c._1, cos(q, c)))
      .sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSeq
  }

  private lazy val clusterRank: Map[Long, Seq[Int]] =
    vecs.map { case (id, e) =>
      id -> DedupQueries.ivfCentroids
        .map { case (ci, c) => (ci, DedupQueries.dotScaled(e, c)) }
        .sortBy { case (ci, dot) => (-dot, ci) }.map(_._1).toSeq
    }.toMap
  private lazy val memberOf: Map[Long, Int] =
    vecs.map { case (id, _) => id -> clusterRank(id).head }.toMap

  /** x15 family: probe the nprobe nearest coarse lists. */
  private def ivfRecall(nprobe: Int): Double = recallOf { qid =>
    val q = vecs(qid.toInt)
    val probed = clusterRank(qid).take(nprobe).toSet
    vecs.filter(c => c._1 != qid && probed.contains(memberOf(c._1)))
      .map(c => (c._1, cos(q, c)))
      .sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSeq
  }

  private lazy val codeOf: Map[Long, Array[Int]] =
    vecs.map { case (id, e) =>
      id -> DedupQueries.pqEncode(e.map(DedupQueries.scale1e6),
        DedupQueries.pqCodebooks)
    }.toMap
  private lazy val lutOf: Map[Long, Array[Array[Long]]] =
    queries.map { case (qid, qe) =>
      val se = qe.map(DedupQueries.scale1e6)
      qid -> Array.tabulate(DedupQueries.PqSubspaces, DedupQueries.PqK) {
        (m, k) => DedupQueries.pqDist2(se, m * DedupQueries.PqSubDim,
          DedupQueries.pqCodebooks(m)(k))
      }
    }.toMap

  private def adc(qid: Long, cid: Long): Long = {
    val lut = lutOf(qid); val code = codeOf(cid)
    var s = 0L; var m = 0
    while (m < DedupQueries.PqSubspaces) { s += lut(m)(code(m)); m += 1 }
    s
  }

  /** x38: full scan, ADC ranking — recall loss is quantization only. */
  private def pqRecall: Double = recallOf { qid =>
    vecs.filter(_._1 != qid)
      .map(c => (c._1, adc(qid, c._1)))
      .sortBy { case (id, d) => (d, id) }.take(K).map(_._1).toSeq
  }

  /** x39: IVF lists bound the scan, ADC ranks it. */
  private def ivfPqRecall(nprobe: Int): Double = recallOf { qid =>
    val probed = clusterRank(qid).take(nprobe).toSet
    vecs.filter(c => c._1 != qid && probed.contains(memberOf(c._1)))
      .map(c => (c._1, adc(qid, c._1)))
      .sortBy { case (id, d) => (d, id) }.take(K).map(_._1).toSeq
  }

  /** Two-stage serving shape (what every production PQ deployment runs):
    * ADC shortlists `shortlist` candidates, exact cosine re-ranks them.
    * Quantization noise only has to keep true neighbors inside the
    * SHORTLIST, not rank them — far easier. */
  private def pqRescoreRecall(shortlist: Int): Double = recallOf { qid =>
    val q = vecs(qid.toInt)
    vecs.filter(_._1 != qid)
      .map(c => (c, adc(qid, c._1)))
      .sortBy { case (c, d) => (d, c._1) }.take(shortlist)
      .map { case (c, _) => (c._1, cos(q, c)) }
      .sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSeq
  }

  test("IVF assigns each vector to exactly one inverted list (x15/x39 heap exactness)") {
    // x15/x39 run their BoundedTopK heaps with NO post-hoc pair dedup:
    // exactness rests on each candidate living in exactly one list, so
    // (query, cand) appears at most once in the scored stream (ADVICE
    // r6 — a duplicate could occupy a heap slot and evict a genuine
    // top-k row). Guard the observable consequences on x15's output:
    // no duplicate pairs, and every query fills exactly k ranks.
    val out = graft.SparkEntry.queries("x15_ann_ivf")(
      spark, "/root/testdata/sf0.001")
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.distinct.length == out.length,
      "duplicate (query, cand) pairs in x15 output — a candidate was " +
        "emitted into more than one inverted list")
    val perQuery = out.groupBy(_._1).view.mapValues(_.length)
    assert(perQuery.values.forall(_ == 5),
      s"a query under-filled k (heap slot stolen by a duplicate?): " +
        perQuery.toMap)
  }

  // ---- x47 family: greedy beam search over a kNN graph ----

  /** Serving-scale graph: exact degree-G neighbors over the FULL table
    * (the key itself runs the tenant subset so its oracle stays cheap;
    * the audit runs the same semantics at serving parameters). */
  private val GraphG = 10
  private lazy val knnGraph: Map[Long, Seq[Long]] =
    vecs.map { case (id, e) =>
      id -> vecs.filter(_._1 != id)
        .map(c => (c._1, cos((id, e), c)))
        .sortBy { case (cid, sc) => (-sc, cid) }.take(GraphG).map(_._1).toSeq
    }.toMap

  /** x47's beam semantics exactly (monotone beam: frontier stays in the
    * candidate set), returning (top-K retrieved, exact-scoring budget =
    * |visited|). */
  private def graphSearch(qid: Long, entries: Seq[Long], beamW: Int,
      rounds: Int): (Seq[Long], Int) = {
    val q = vecs(qid.toInt)
    def score(ids: Seq[Long]) =
      ids.map(c => (c, cos(q, vecs(c.toInt))))
        .sortBy { case (id, sc) => (-sc, id) }
    val visited = scala.collection.mutable.Map.empty[Long, Double]
    var beam = score(entries.filter(_ != qid))
    beam.foreach { case (i, sc) => visited(i) = sc }
    for (_ <- 1 to rounds) {
      val front = beam.take(beamW).map(_._1)
      val cands = (front ++ front.flatMap(knnGraph(_)))
        .distinct.filter(_ != qid)
      beam = score(cands)
      beam.foreach { case (i, sc) => visited(i) = sc }
    }
    (visited.toSeq.sortBy { case (id, sc) => (-sc, id) }
      .take(K).map(_._1), visited.size)
  }

  test("x47 graph beam search beats x14/x15 recall at an equal exact-scoring budget") {
    // beam-width is the lever on this table (wider beams escape the
    // local maxima an unnavigable isotropic kNN graph creates); the
    // walk CONVERGES by R=8 (R=16 is byte-identical), so the budget is
    // self-limiting — a property bucket probing does not have
    val entries = Seq(10L, 11L, 12L)
    for { b <- Seq(8, 16); r <- Seq(4, 8) } {
      val res = queries.map(q => q._1 -> graphSearch(q._1, entries, b, r)).toMap
      info(f"beam B=$b%2d R=$r%2d: recall ${recallOf(qid => res(qid)._1)}%.3f " +
        f"budget ${res.values.map(_._2).sum.toDouble / res.size}%.0f")
    }
    val results = queries.map(q => q._1 -> graphSearch(q._1, entries, 16, 8)).toMap
    val graphRecall = recallOf(qid => results(qid)._1)
    val graphBudget = results.values.map(_._2).sum.toDouble / results.size
    // comparison budgets = candidates each method exact-scores per query
    val ivfBudget = queries.map { q =>
      val probed = clusterRank(q._1).take(DedupQueries.IvfProbes).toSet
      vecs.count(c => c._1 != q._1 && probed.contains(memberOf(c._1)))
    }.sum.toDouble / queries.length
    val lshBudget = queries.map { q =>
      val probes = (0L until (1L << DedupQueries.LshPlanes))
        .filter(b => java.lang.Long.bitCount(b ^ bucketOf(q._1)) <= 1).toSet
      vecs.count(c => c._1 != q._1 && probes.contains(bucketOf(c._1)))
    }.sum.toDouble / queries.length
    info(f"x47 graph beam (B=16, R=8, deg=$GraphG%d): recall ${graphRecall}%.3f at budget ${graphBudget}%.0f")
    info(f"x15 IVF p=3:  recall ${ivfRecall(3)}%.3f at budget ${ivfBudget}%.0f")
    info(f"x14 LSH r=1:  recall ${lshRecall(1)}%.3f at budget ${lshBudget}%.0f")
    // the graph walk must retrieve MORE while scoring FEWER candidates
    // than both bucket-probing families — adaptivity is the whole point
    assert(graphBudget <= ivfBudget,
      f"graph budget $graphBudget%.0f exceeds IVF p=3's $ivfBudget%.0f")
    assert(graphRecall > ivfRecall(DedupQueries.IvfProbes),
      f"graph $graphRecall%.3f <= IVF p=3 ${ivfRecall(3)}%.3f")
    assert(graphRecall > lshRecall(1),
      f"graph $graphRecall%.3f <= LSH r=1 ${lshRecall(1)}%.3f")
    // absolute floor, measured-minus-margin (0.530 at this point)
    assert(graphRecall >= 0.45, f"x47 serving point: $graphRecall%.3f")
  }

  test("recall@10 vs brute force: curves and operating points pinned") {
    val lshCurve = (0 to 3).map(r => r -> lshRecall(r))
    val ivfCurve = Seq(1, 2, 3, 4, 8, 16).map(p => p -> ivfRecall(p))
    val pq = pqRecall
    val ivfPqCurve = Seq(1, 2, 3, 4, 8, 16).map(p => p -> ivfPqRecall(p))
    val rescore = Seq(50, 100, 200).map(n => n -> pqRescoreRecall(n))

    info(f"x14 LSH multiprobe:  ${lshCurve.map { case (r, v) => f"r=$r%d ${v}%.3f" }.mkString("  ")}")
    info(f"x15 IVF:             ${ivfCurve.map { case (p, v) => f"p=$p%d ${v}%.3f" }.mkString("  ")}")
    info(f"x38 PQ full scan:    $pq%.3f")
    info(f"x38 PQ+rescore:      ${rescore.map { case (n, v) => f"n=$n%d ${v}%.3f" }.mkString("  ")}")
    info(f"x39 IVF-PQ:          ${ivfPqCurve.map { case (p, v) => f"p=$p%d ${v}%.3f" }.mkString("  ")}")

    // exactness sanity: probing everything recovers brute force exactly
    assert(ivfRecall(DedupQueries.IvfClusters) == 1.0)
    assert(lshRecall(DedupQueries.LshPlanes) == 1.0)

    // exact-rescore curves must not degrade as probes widen (candidate
    // sets are nested and ranking is exact — a kernel bug shows here).
    // ADC-ranked curves are NOT monotone by nature: more candidates =
    // more chances for quantization noise to outrank true neighbors.
    def monotone(c: Seq[(Int, Double)]) =
      c.sliding(2).forall(w => w.last._2 >= w.head._2 - 1e-9)
    assert(monotone(lshCurve), s"LSH curve not monotone: $lshCurve")
    assert(monotone(ivfCurve), s"IVF curve not monotone: $ivfCurve")

    // ADC internal consistency: probing every list IS the full PQ scan
    assert(math.abs(ivfPqRecall(DedupQueries.IvfClusters) - pq) < 1e-9)

    // Pinned operating points, measured on this table (see README "ANN
    // retrieval quality"). The synthetic embeddings are ISOTROPIC (the
    // label column carries no geometry: same-label mean cosine ~0.005),
    // the hardest regime for sublinear ANN: IVF recall tracks its probe
    // fraction (untrainable on isotropic data), while hyperplane LSH
    // beats its bucket fraction (r=2 covers 34%% of buckets but finds
    // 59%% of true neighbors) — genuine cosine locality. Thresholds are
    // measured-minus-margin so degradation fails, noise does not.
    assert(lshRecall(1) >= 0.15, f"x14 r=1: ${lshRecall(1)}%.3f")
    assert(lshRecall(2) >= 0.45, f"x14 r=2: ${lshRecall(2)}%.3f")
    assert(lshRecall(3) >= 0.75, f"x14 r=3: ${lshRecall(3)}%.3f")
    // LSH locality: recall must BEAT the probed-bucket fraction
    assert(lshRecall(2) > 22.0 / 64, "hyperplane LSH no better than random buckets")
    assert(ivfRecall(DedupQueries.IvfProbes) >= 0.30,
      f"x15 p=3: ${ivfRecall(DedupQueries.IvfProbes)}%.3f")
    assert(ivfRecall(8) >= 0.60, f"x15 p=8: ${ivfRecall(8)}%.3f")
    // raw ADC ranking is quantization-limited on isotropic data (0.5
    // bits/dim, 16 random cells per 8-dim subspace) — pinned well above
    // the random-retrieval floor K/N = 0.005, and the two-stage path
    // below is the shape that buys recall back at scale
    assert(pq >= 0.03, f"x38 ADC-only: $pq%.3f")
    assert(pqRescoreRecall(100) >= 0.25,
      f"x38 shortlist-100 + exact rescore: ${pqRescoreRecall(100)}%.3f")
    assert(pqRescoreRecall(200) > pqRescoreRecall(50),
      "wider shortlist must buy recall back")
    assert(ivfPqRecall(DedupQueries.IvfProbes) >= 0.03,
      f"x39 p=3: ${ivfPqRecall(DedupQueries.IvfProbes)}%.3f")
  }

  // ---- x43: k-means-trained codebooks vs the seeded floor ----

  private lazy val trainedCb: Array[Array[Array[Long]]] =
    DedupQueries.trainPqCodebooks(
      vecs.filter(_._1 < DedupQueries.PqTrainN)
        .map(_._2.map(DedupQueries.scale1e6)))

  private def adcWith(cb: Array[Array[Array[Long]]])(
      qid: Long, cid: Long, codes: Map[Long, Array[Int]],
      luts: Map[Long, Array[Array[Long]]]): Long = {
    val lut = luts(qid); val code = codes(cid)
    var s = 0L; var m = 0
    while (m < DedupQueries.PqSubspaces) { s += lut(m)(code(m)); m += 1 }
    s
  }

  private def pqRecallWith(cb: Array[Array[Array[Long]]]): Double = {
    val codes = vecs.map { case (id, e) =>
      id -> DedupQueries.pqEncode(e.map(DedupQueries.scale1e6), cb)
    }.toMap
    val luts = queries.map { case (qid, qe) =>
      val se = qe.map(DedupQueries.scale1e6)
      qid -> Array.tabulate(DedupQueries.PqSubspaces, DedupQueries.PqK) {
        (m, k) => DedupQueries.pqDist2(se, m * DedupQueries.PqSubDim, cb(m)(k))
      }
    }.toMap
    recallOf { qid =>
      vecs.filter(_._1 != qid)
        .map(c => (c._1, adcWith(cb)(qid, c._1, codes, luts)))
        .sortBy { case (id, d) => (d, id) }.take(K).map(_._1).toSeq
    }
  }

  /** Mean squared quantization error (reconstruction d2) of a codebook
    * over the full table — the quantity Lloyd descends. */
  private def quantError(cb: Array[Array[Array[Long]]]): Double =
    vecs.map { case (_, e) =>
      val se = e.map(DedupQueries.scale1e6)
      val code = DedupQueries.pqEncode(se, cb)
      (0 until DedupQueries.PqSubspaces).map { m =>
        DedupQueries.pqDist2(se, m * DedupQueries.PqSubDim,
          cb(m)(code(m))).toDouble
      }.sum
    }.sum / vecs.length

  /** Two-stage rescore (x42/x44 shape) under an arbitrary codebook. */
  private def rescoreRecallWith(cb: Array[Array[Array[Long]]],
      shortlist: Int): Double = {
    val codes = vecs.map { case (id, e) =>
      id -> DedupQueries.pqEncode(e.map(DedupQueries.scale1e6), cb)
    }.toMap
    val luts = queries.map { case (qid, qe) =>
      val se = qe.map(DedupQueries.scale1e6)
      qid -> Array.tabulate(DedupQueries.PqSubspaces, DedupQueries.PqK) {
        (m, k) => DedupQueries.pqDist2(se, m * DedupQueries.PqSubDim, cb(m)(k))
      }
    }.toMap
    recallOf { qid =>
      val q = vecs(qid.toInt)
      vecs.filter(_._1 != qid)
        .map(c => (c, adcWith(cb)(qid, c._1, codes, luts)))
        .sortBy { case (c, d) => (d, c._1) }.take(shortlist)
        .map { case (c, _) => (c._1, cos(q, c)) }
        .sortBy { case (id, s) => (-s, id) }.take(K).map(_._1).toSeq
    }
  }

  test("x44 full serving stack: trained shortlist + rescore beats both halves") {
    val seededRescore = rescoreRecallWith(DedupQueries.pqCodebooks, 100)
    val trainedRescore = rescoreRecallWith(trainedCb, 100)
    val trainedAdcOnly = pqRecallWith(trainedCb)
    info(f"rescore@100: seeded books $seededRescore%.3f -> trained books $trainedRescore%.3f")
    // the composition must beat each half alone: trained ADC without
    // rescore, and rescore without training
    assert(trainedRescore > trainedAdcOnly,
      f"rescore adds nothing over trained ADC: $trainedRescore%.3f vs $trainedAdcOnly%.3f")
    assert(trainedRescore > seededRescore,
      f"training adds nothing under rescore: $trainedRescore%.3f vs $seededRescore%.3f")
    assert(trainedRescore >= 0.55,
      f"x44 recall $trainedRescore%.3f below pin")
  }

  test("x46 SQ8: 8-bit scalar quantization holds high recall") {
    // the operator's own arithmetic: corpus min/max, floor-division
    // codes, symmetric integer L2
    val scaled = vecs.map { case (id, e) =>
      (id, e.map(DedupQueries.scale1e6))
    }
    val dims = scaled.head._2.length
    val mins = Array.tabulate(dims)(j => scaled.map(_._2(j)).min)
    val maxs = Array.tabulate(dims)(j => scaled.map(_._2(j)).max)
    def enc(sv: Array[Long]): Array[Int] = Array.tabulate(dims) { j =>
      val r = maxs(j) - mins(j)
      if (r == 0L) 0 else (((sv(j) - mins(j)) * 255L) / r).toInt
    }
    val codes = scaled.map { case (id, sv) => id -> enc(sv) }.toMap
    val sq8 = recallOf { qid =>
      val qc = codes(qid)
      vecs.filter(_._1 != qid).map { c =>
        val cc = codes(c._1)
        var d2 = 0L; var j = 0
        while (j < dims) { val t = (qc(j) - cc(j)).toLong; d2 += t * t; j += 1 }
        (c._1, d2)
      }.sortBy { case (id, d) => (d, id) }.take(K).map(_._1).toSeq
    }
    info(f"x46 SQ8 recall@10: $sq8%.3f (8 bits/dim vs PQ's 0.5)")
    // measured 0.83: the opposite end of the compression/recall trade
    // from PQ (ADC 0.07 on this table at 0.5 bits/dim). The residual
    // gap is partly METRIC (codes rank by L2, ground truth is cosine
    // on not-exactly-unit-norm vectors), partly quantization. Pinned
    // measured-minus-margin.
    assert(sq8 >= 0.78, f"SQ8 recall $sq8%.3f below pin")
  }

  test("x88 binary sign codes: 1 bit/dim Hamming recall") {
    // the operator's own packing: sign bit per dim, two 32-bit words
    val codes = vecs.map { case (id, e) =>
      var lo = 0L; var hi = 0L
      for (j <- 0 until 32) if (e(j) > 0) lo |= (1L << j)
      for (j <- 0 until 32) if (e(j + 32) > 0) hi |= (1L << j)
      id -> ((lo, hi))
    }.toMap
    val bin = recallOf { qid =>
      val (ql, qh) = codes(qid)
      vecs.filter(_._1 != qid).map { c =>
        val (cl, ch) = codes(c._1)
        (c._1, (java.lang.Long.bitCount(ql ^ cl)
          + java.lang.Long.bitCount(qh ^ ch)).toLong)
      }.sortBy { case (id, h) => (h, id) }.take(K).map(_._1).toSeq
    }
    info(f"x88 binary recall@10: $bin%.3f (1 bit/dim)")
    // sign-random-projection cosine estimate (Charikar 2002) at 64
    // bits: measured 0.14 on the isotropic table — 28× the K/N random
    // floor (0.005) from 8 BYTES/vector, and 2× PQ's raw ADC (0.07)
    // at the same code size. The isotropic table is the worst case:
    // top-10 neighbors sit at weak cosines, where the ±1-bit angle
    // estimator's ~1/√64 noise floor dominates — the 1-bit code is a
    // SHORTLIST stage (compose with exact rescore, as x42 does for
    // PQ), not a ranker. Pinned measured-minus-margin.
    assert(bin >= 0.10, f"x88 binary recall $bin%.3f below pin 0.10")

    // the x92 composition: exact rescore of the Hamming shortlist-100.
    // Rescore is exact within the shortlist, so recall@10 = fraction
    // of true neighbors the shortlist retains — measured 0.58 from a
    // 5% scan budget (vs 0.14 ranking BY hamming): the shortlist-stage
    // framing above, made operational.
    val rescored = recallOf { qid =>
      val (ql, qh) = codes(qid)
      vecs.filter(_._1 != qid).map { c =>
        val (cl, ch) = codes(c._1)
        (c._1, (java.lang.Long.bitCount(ql ^ cl)
          + java.lang.Long.bitCount(qh ^ ch)).toLong)
      }.sortBy { case (id, h) => (h, id) }
        .take(DedupQueries.RescoreShortlist).map(_._1).toSeq
      // recallOf intersects with trueTop: listing the shortlist is
      // equivalent to rescoring it exactly
    }
    info(f"x92 binary+rescore recall@10: $rescored%.3f (shortlist 100)")
    assert(rescored >= 0.45,
      f"x92 rescored recall $rescored%.3f below pin 0.45")
    assert(rescored > bin + 0.15,
      f"rescore $rescored%.3f does not clearly beat raw hamming $bin%.3f")

    // saturation-adaptive shortlist (VERDICT r12 #4, the x92 serving
    // rule since r13): base plus the hK+1 Hamming tie shell, capped at
    // 2× base. The adaptive set CONTAINS the fixed-base set by
    // construction, so recall is monotone ≥ fixed; the width must
    // respect the 2× budget. (The density-scaling payoff is pinned at
    // 50 k / 200 k by RecallProbe: 0.67→0.85 and 0.53→0.70.)
    val base = DedupQueries.RescoreShortlist
    var widthSum = 0L
    val adaptive = recallOf { qid =>
      val (ql, qh) = codes(qid)
      val scored = vecs.filter(_._1 != qid).map { c =>
        val (cl, ch) = codes(c._1)
        (c._1, (java.lang.Long.bitCount(ql ^ cl)
          + java.lang.Long.bitCount(qh ^ ch)).toLong)
      }.sortBy { case (id, h) => (h, id) }
      val hK = scored(math.min(base, scored.length) - 1)._2
      val w = math.min(2 * base,
        scored.indexWhere(_._2 > hK + 1) match {
          case -1 => scored.length
          case i  => math.max(base, i)
        })
      widthSum += w
      scored.take(w).map(_._1).toSeq
    }
    val meanW = widthSum.toDouble / 10
    info(f"x92 adaptive shortlist recall@10: $adaptive%.3f (mean width $meanW%.1f)")
    assert(adaptive >= rescored,
      f"adaptive $adaptive%.3f under fixed $rescored%.3f — superset rule broken")
    assert(meanW <= 2.0 * base, f"adaptive width $meanW%.1f exceeds the 2x budget")
  }

  test("x102 ensemble shortlist recall dominates every arm") {
    // candidate UNION computed through the operators' own kernels:
    // recall of union-then-exact-rescore = |union ∩ truth| / K
    val codes = vecs.map { case (id, e) =>
      id -> graft.VectorIndex.signPack(e)
    }.toMap
    def unionRecallOf(qid: Long): Set[Long] = {
      val q = vecs(qid.toInt)
      val probes = (0L until (1L << DedupQueries.LshPlanes))
        .filter(b => java.lang.Long.bitCount(b ^ bucketOf(qid)) <= 1).toSet
      val lsh = vecs.filter(c => c._1 != qid && probes.contains(bucketOf(c._1)))
        .map(_._1).toSet
      val probed = clusterRank(qid).take(3).toSet
      val ivf = vecs.filter(c => c._1 != qid && probed.contains(memberOf(c._1)))
        .map(_._1).toSet
      val (ql, qh) = codes(qid)
      val bin = vecs.filter(_._1 != qid).map { c =>
        val (cl, ch) = codes(c._1)
        (c._1, (java.lang.Long.bitCount(ql ^ cl)
          + java.lang.Long.bitCount(qh ^ ch)).toLong)
      }.sortBy { case (id, h) => (h, id) }.take(100).map(_._1).toSet
      lsh ++ ivf ++ bin
    }
    val ensemble = queries.map { q =>
      unionRecallOf(q._1).intersect(trueTop(q._1)).size.toDouble / K
    }.sum / queries.length
    val (lsh1, ivf3) = (lshRecall(1), ivfRecall(3))
    info(f"x102 ensemble recall@10: $ensemble%.3f " +
      f"(arms: lsh r=1 $lsh1%.3f, ivf p=3 $ivf3%.3f, binary+rescore 0.58)")
    // union of candidate sets + exact rescore can only add true
    // neighbors — dominance is structural, the measured point is the pin
    assert(ensemble >= lsh1 && ensemble >= ivf3 && ensemble >= 0.58 - 1e-9)
    // measured 0.80 on the isotropic table from three sublinear arms;
    // pinned measured-minus-margin
    assert(ensemble >= 0.70, f"ensemble recall $ensemble%.3f below pin")
  }

  test("x43 trained codebooks beat the seeded floor (recall and MSE)") {
    val seeded = pqRecallWith(DedupQueries.pqCodebooks)
    val trained = pqRecallWith(trainedCb)
    val (eSeed, eTrain) = (quantError(DedupQueries.pqCodebooks),
      quantError(trainedCb))
    info(f"ADC-only recall@10: seeded $seeded%.3f -> trained $trained%.3f")
    info(f"mean quantization d2: seeded $eSeed%.3g -> trained $eTrain%.3g")
    // Lloyd descends exactly this objective; measured on this table:
    // 7.68e11 -> 6.27e11 (-18%, 2 iterations, 256 training vectors
    // scored over all 2000 — isotropic data caps the gain). Threshold
    // is measured-minus-margin so degradation fails, noise does not.
    assert(eTrain < eSeed * 0.9,
      f"training did not reduce quantization error: $eSeed%.3g -> $eTrain%.3g")
    assert(trained > seeded,
      f"trained recall $trained%.3f not above seeded $seeded%.3f")
    assert(trained >= 0.10, f"trained ADC recall $trained%.3f below pin")
  }

  test("x40 filtered search is exact within its filter (recall 1.0)") {
    import spark.implicits._
    val labeled = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])]
      .collect().map { case (id, l, e) => (id, l, e.map(_.toDouble)) }
    val byId = labeled.map(r => r._1 -> r).toMap
    val got = DedupQueries.x40AnnFiltered(spark, sf)
      .select("query_id", "rank", "cand_id").collect()
      .groupBy(_.getLong(0))
    got.foreach { case (qid, rows) =>
      val (_, qLab, qe) = byId(qid)
      val expect = labeled
        .filter(c => c._1 != qid && c._2 == qLab)
        .map(c => (c._1, DedupQueries.dotScaled(qe, c._3) /
          (math.sqrt(DedupQueries.normScaled(qe).toDouble) *
            math.sqrt(DedupQueries.normScaled(c._3).toDouble))))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
      val gotIds = rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      assert(gotIds == expect, s"query $qid filtered top-5 diverges")
    }
  }
}
