package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the mining extensions (x69/x70/x72/x73):
  * candidate-generation completeness, projection quality, and the
  * reweighting invariant — the properties the DuckDB oracles cannot
  * state directly. */
class MiningSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // pure-Scala reference edit distance (classic Levenshtein DP)
  private def ed(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def delSigs(s: String): Set[String] =
    (0 to s.length).map {
      case 0 => s
      case i => s.substring(0, i - 1) + s.substring(i)
    }.toSet

  test("FastSS deletion signatures are COMPLETE for edit distance <= 1") {
    // exhaustive over a structured alphabet: every pair of short strings
    // within ED<=1 must share a deletion-1 signature — the property the
    // x69 join's exactness rests on
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(300)(
      (0 until (3 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString)
    for (a <- strs; b <- strs if a != b && ed(a, b) <= 1)
      assert(delSigs(a).intersect(delSigs(b)).nonEmpty,
        s"ED<=1 pair '$a'/'$b' shares no deletion signature")
  }

  test("x69 signature join reproduces the brute-force ED<=1 self-join") {
    val names = Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && math.abs(na.length - nb.length) <= 1 && ed(na, nb) <= 1
    } yield (ia, ib, ed(na, nb).toLong)).toSet
    val got = MiningQueries.x69FuzzyJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth,
      s"x69 mismatch: missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
  }

  test("x70 PMI ranks a planted collocation above an anti-collocation") {
    // invariant, not a value pin: a bigram whose observed count beats
    // its independence expectation has pmi > 0, one below has pmi < 0;
    // verify against counts recomputed independently
    val rows = MiningQueries.x70PmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTok = toks.values.sum.toDouble
    val nBig = rows.map(_.getLong(2)).sum // only >=5 rows; recompute full
    val fullBig = Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(expr("sequence(0, size(w) - 2)")).as("i"), col("w"))
      .count().toDouble
    assert(nBig <= fullBig)
    rows.foreach { r =>
      val (wa, wb, c, pmi) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      val expect = math.log(c * nTok * nTok / (fullBig * toks(wa) * toks(wb)))
      assert(math.abs(expect - pmi) < 1e-5,
        s"pmi($wa,$wb)=$pmi, recomputed $expect")
    }
  }

  test("x72 JL projection approximately preserves cosine similarity") {
    val full = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = MiningQueries.x72JlProjection(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2))
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = full.keys.toSeq.sorted.take(40)
    val errs = for (i <- ids; j <- ids if i < j) yield
      math.abs(cos(full(i), full(j)) - cos(proj(i), proj(j)))
    val mean = errs.sum / errs.size
    // JL with a ±1 matrix at k=16 dims carries per-pair distortion on
    // the order of 1/sqrt(k) = 0.25; the mean must sit at or inside
    // that, the tail within a few multiples (measured: mean ~0.21)
    assert(mean < 0.25, s"mean cosine distortion $mean")
    assert(errs.max < 0.85, s"max cosine distortion ${errs.max}")
  }

  test("x71 equals x2's pair set restricted to cross-parity pairs") {
    // the A-vs-B join must find exactly the self-join's answers that
    // straddle the slice boundary — no candidate lost to the split
    val self = DedupQueries.x2DedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossTruth = self.collect {
      case (a, b) if a % 2 != b % 2 =>
        if (a % 2 == 1) (a, b) else (b, a) // (new=odd, old=even)
    }
    val cross = DedupQueries.x71CrossCorpusDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == crossTruth,
      s"missing=${(crossTruth -- cross).take(5)} extra=${(cross -- crossTruth).take(5)}")
  }

  test("x74 pagerank: mass conserved up to integer floors, linked beats isolated") {
    val rows = DedupQueries.x74SourcePagerank(spark, sf).collect()
    val scale = 1e12
    val total = rows.map(_.getLong(1)).sum.toDouble / scale
    // undirected edges ⇒ no dangling leak; only integer-floor loss
    assert(total > 0.9 && total <= 1.0 + 1e-9, s"total rank mass $total")
    val base = rows.map(_.getLong(1)).min
    assert(rows.forall(_.getLong(1) >= base))
    // any source participating in cross-source dup pairs must outrank
    // the uniform floor a pair-free source sits at
    val linked = DedupQueries.x7Pairs(spark, sf)
      .join(Tables.documents(spark, sf)
        .select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(Tables.documents(spark, sf)
        .select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb"))
      .select(explode(array(col("sa"), col("sb"))).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    if (linked.nonEmpty && linked.size < rows.length) {
      val isolatedMax = rows.filter(r => !linked(r.getString(0)))
        .map(_.getLong(1)).max
      val linkedMin = rows.filter(r => linked(r.getString(0)))
        .map(_.getLong(1)).min
      assert(linkedMin > isolatedMax,
        s"linked min $linkedMin <= isolated max $isolatedMax")
    }
  }

  test("x76 DoReMi weights form a distribution and up-weight hard domains") {
    val rows = MiningQueries.x76DoremiWeights(spark, sf).collect()
    val total = rows.map(_.getDouble(5)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"weights sum to $total")
    // exact invariant: weight/token-share = exp(excess)·Σnb/Z is
    // strictly increasing in excess (the sign-vs-share form is NOT
    // guaranteed — Jensen moves the pivot off zero)
    val tokens = rows.map(_.getLong(2)).sum.toDouble
    val ratios = rows.map { r =>
      (r.getDouble(4), r.getDouble(5) / (r.getLong(2) / tokens))
    }.sortBy(_._1)
    ratios.sliding(2).foreach {
      case Array((e1, r1), (e2, r2)) =>
        if (e2 > e1 + 1e-6)
          assert(r2 > r1, s"boost not monotone in excess: " +
            s"($e1,$r1) vs ($e2,$r2)")
      case _ =>
    }
    // and the weighted mean excess is zero by construction
    val meanE = rows.map(r => r.getLong(2) * r.getDouble(4)).sum / tokens
    assert(math.abs(meanE) < 1e-4, s"weighted mean excess $meanE")
  }

  test("x77 calibration: percentiles span [0,1] and z-scores center per source") {
    val rows = MiningQueries.x77QualityQnorm(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val pcts = rs.map(_.getDouble(3))
      assert(pcts.forall(p => p >= 0.0 && p <= 1.0))
      assert(pcts.min == 0.0, s"$src min pct ${pcts.min}")
      if (rs.length > 1) assert(math.abs(pcts.max - 1.0) < 1e-9)
      val zMean = rs.map(_.getDouble(6)).sum / rs.length
      assert(math.abs(zMean) < 1e-3, s"$src z-mean $zMean")
    }
  }

  test("x78 shuffle: a permutation — contiguous positions, all docs, stable") {
    val rows = MiningQueries.x78SeededShuffle(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).distinct.length == n)
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getLong(2)).sorted
      assert(pos.toSeq == (1L to rs.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    val again = MiningQueries.x78SeededShuffle(spark, sf).collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }

  test("x73 weights: every near-dup cluster contributes total weight ~1") {
    val rows = MiningQueries.x73SoftDedupWeights(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4,
        s"cluster $cid total weight $total (${rs.length} members)")
      assert(rs.forall(_.getLong(2) == rs.length),
        s"cluster $cid size column disagrees with member count")
    }
  }
}
