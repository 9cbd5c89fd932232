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

  test("x81 boilerplate: per-doc counts match a driver-side replay") {
    val segs = TextQueries.segmentSpans(
        Tables.documents(spark, sf), carry = Seq("source"))
      .select(col("doc_id"), col("source"), col("line"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val boiler = segs.groupBy(r => (r._2, r._3))
      .filter { case (_, occ) => occ.map(_._1).distinct.length >= 2 }
      .keySet
    val truth = segs.groupBy(_._1).map { case (doc, rs) =>
      doc -> (rs.length.toLong,
        rs.count(r => boiler((r._2, r._3))).toLong)
    }
    val got = MiningQueries.x81Boilerplate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == truth)
    // the corpus genuinely exercises the flag path
    assert(got.values.map(_._2).sum > 0, "no boilerplate flagged at sf0.001")
    val fracs = MiningQueries.x81Boilerplate(spark, sf).collect()
      .map(_.getDouble(3))
    assert(fracs.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("x82 retrieval eval matches a driver-side exact replay") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dotS(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) {
        val v = a(i) * b(i) * 1000000d
        s += (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        i += 1
      }
      s
    }
    val truth = emb.filter(_._1 < 10).sortBy(_._1).map { case (qid, qlab, qe) =>
      val qn = math.sqrt(dotS(qe, qe).toDouble)
      val ranked = emb.filter(_._1 != qid)
        .map { case (cid, clab, ce) =>
          (cid, clab, dotS(qe, ce) / (qn * math.sqrt(dotS(ce, ce).toDouble)))
        }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(10)
      val rel = ranked.zipWithIndex.filter { case ((_, clab, _), _) => clab == qlab }
      val frr = rel.headOption.map(_._2 + 1).getOrElse(0)
      (qid, qlab.toLong, frr.toLong,
        if (frr > 0) 1000000L / frr else 0L, rel.length.toLong)
    }
    val got = MiningQueries.x82RetrievalEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == truth.toSeq,
      s"x82 mismatch:\n got=${got.take(3).mkString(",")}\n want=${truth.take(3).mkString(",")}")
  }

  test("x83 triangle count matches brute force; orientation finds each once") {
    val row = MiningQueries.x83TriangleCount(spark, sf).collect().head
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val support = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (e, os) => e -> os.size }
    val edges = support.filter(_._2 >= MiningQueries.TriMinSupport).keySet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nTri = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(u, Set.empty).count(w => w > v && edges((v, w)))
    }.sum
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).size
    assert(row.getLong(0) == nodes.toLong, s"nodes ${row.getLong(0)} != $nodes")
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == nTri.toLong,
      s"triangles ${row.getLong(2)} != $nTri")
    assert(nTri > 0, "sf0.001 co-occurrence graph has no triangles")
  }

  test("x84 perceptron: weights replay exactly; round 1 is the full batch sum") {
    val feats = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect().map { r =>
        val text = r.getString(1)
        val y = if (r.getString(0) == "en") 1L else -1L
        (y, Array(1L, text.split(" ", -1).length.toLong, text.length.toLong,
          text.count(_ == 'e').toLong))
      }
    val w = Array(0L, 0L, 0L, 0L)
    val truth = (1 to MiningQueries.PerceptronRounds).flatMap { r =>
      val mis = feats.filter { case (y, x) =>
        y * (0 to 3).map(j => w(j) * x(j)).sum <= 0
      }
      for (j <- 0 to 3) w(j) += mis.map { case (y, x) => y * x(j) }.sum
      (0 to 3).map(j => (r.toLong, j.toLong, w(j), mis.length.toLong))
    }
    val got = MiningQueries.x84PerceptronQuality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == truth,
      s"x84 mismatch: got=${got.take(4).mkString(",")} want=${truth.take(4).mkString(",")}")
    // round 1 from w=0: every margin is 0 => the whole corpus updates
    assert(got.take(4).forall(_._4 == feats.length.toLong))
  }

  test("x85 profile matches driver-side statistics per column") {
    val li = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect()
    def scaled(r: org.apache.spark.sql.Row): Map[String, Long] = Map(
      "okey" -> r.getLong(0), "pkey" -> r.getLong(1), "skey" -> r.getLong(2),
      "qty" -> math.round(r.getDouble(3)),
      "eprice" -> math.round(r.getDouble(4) * 100),
      "disc" -> math.round(r.getDouble(5) * 100))
    val byCol = li.map(scaled)
    val got = MiningQueries.x85ColumnProfile(spark, sf).collect()
    assert(got.length == 6)
    got.foreach { r =>
      val c = r.getString(0)
      val vals = byCol.map(_(c))
      assert(r.getLong(1) == li.length.toLong)
      assert(r.getLong(2) == 0L)
      assert(r.getLong(3) == vals.distinct.length.toLong, s"$c distinct")
      assert(r.getLong(4) == vals.min, s"$c min")
      assert(r.getLong(5) == vals.max, s"$c max")
    }
  }

  test("x86 winnowing: driver replay + the shared-run guarantee") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def hex60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val k = MiningQueries.WinnowK; val w = MiningQueries.WinnowW
    val truth = docs.flatMap { case (id, text) =>
      val words = text.split(" ", -1)
      if (words.length < k) Seq.empty
      else {
        val hashes = (0 to words.length - k)
          .map(p => hex60(words.slice(p, p + k).mkString(" ")))
        (w - 1 until hashes.length)
          .map(p => (id, hashes.slice(p - w + 1, p + 1).min)).distinct
      }
    }.toSet
    val got = MiningQueries.x86Winnowing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    // the winnowing guarantee on a real shared run: two docs sharing a
    // w+k-1-word run must share a fingerprint. Build the check from any
    // exact-duplicate pair in the corpus (full text = a shared run).
    val dupPair = docs.groupBy(_._2).values.find(_.length >= 2)
    dupPair.foreach { ds =>
      val fps = ds.map(d => got.collect { case (id, f) if id == d._1 => f }.toSet)
      assert(fps.head.intersect(fps(1)).nonEmpty,
        "exact-duplicate docs share no winnowing fingerprint")
    }
  }

  test("x87 CDC chunks: lossless cover, boundary rule, edit locality") {
    val rows = MiningQueries.x87CdcChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // chunks tile each doc exactly: widths sum to the word count and
    // chunk ids are contiguous from 0
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val n = docs(id).split(" ", -1).length.toLong
      assert(rs.map(_._3).sum == n, s"doc $id chunks cover ${rs.map(_._3).sum}/$n words")
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length.toLong).toSeq)
    }
    // copy counts are consistent with the hash multiset
    val byHash = rows.groupBy(_._4)
    rows.foreach { r => assert(r._5 == byHash(r._4).length.toLong) }
    // edit locality — the CDC point: re-chunking a doc with one word
    // prepended preserves every boundary after the first resync, so
    // all but O(1) of the original chunk hashes survive; a fixed-width
    // chunker (x29's shape) would lose them all
    val (did, text) = docs.maxBy(_._2.length)
    import spark.implicits._
    val edited = Seq((did, "zzedit " + text), (did + 1000000L, text))
      .toDF("doc_id", "text")
    val rechunk = MiningQueries.x87CdcChunksOn(spark, edited).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val orig = rechunk.filter(_._1 == did + 1000000L).map(_._2).toSet
    val edit = rechunk.filter(_._1 == did).map(_._2).toSet
    val shared = orig.intersect(edit).size
    assert(shared >= orig.size - 2,
      s"edit destroyed chunk sharing: $shared of ${orig.size} survive")
  }

  test("x88 binary ANN: exact hamming replay; recall beats the random floor") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def pack(e: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (j <- 0 until 32) if (e(j) > 0) lo |= (1L << j)
      for (j <- 0 until 32) if (e(j + 32) > 0) hi |= (1L << j)
      (lo, hi)
    }
    val codes = emb.map { case (id, e) => (id, pack(e)) }
    val truth = codes.filter(_._1 < 10).sortBy(_._1).flatMap { case (qid, (ql, qh)) =>
      codes.filter(_._1 != qid)
        .map { case (cid, (cl, ch)) =>
          (cid, (java.lang.Long.bitCount(ql ^ cl)
            + java.lang.Long.bitCount(qh ^ ch)).toLong)
        }
        .sortBy { case (cid, h) => (h, cid) }.take(10).zipWithIndex
        .map { case ((cid, h), i) => (qid, (i + 1).toLong, cid, h) }
    }.toSeq
    val got = MiningQueries.x88AnnBinary(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == truth)
  }

  test("x89 diff statuses follow the snapshot rules exactly") {
    val got = MiningQueries.x89DatasetDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == ids)
    got.foreach { case (id, st) =>
      val want =
        if (id % 4 == 1) "added"
        else if (id % 4 == 2) "removed"
        else if (id % 5 == 0) "changed"
        else "unchanged"
      assert(st == want, s"doc $id: got $st want $want")
    }
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(got.map(_._2).toSet))
  }

  test("x90 span corruption: mask replays, rate ~15%, spans bound masked runs") {
    def hex60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = docs.map { case (id, text) =>
      val mask = text.split(" ", -1).indices
        .map(p => hex60(s"$id:$p") % 100 < MiningQueries.CorruptPct)
      val spans = mask.indices.count(i => mask(i) && (i == 0 || !mask(i - 1)))
      id -> (mask.length.toLong, mask.count(identity).toLong, spans.toLong)
    }.toMap
    val got = MiningQueries.x90SpanCorruption(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == truth)
    val (tok, masked) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    val rate = masked.toDouble / tok
    assert(rate > 0.12 && rate < 0.18, s"corpus mask rate $rate")
  }

  test("x93 confusion matrix replays driver-side and tiles the corpus") {
    val feats = Tables.documents(spark, sf)
      .select(col("source"), col("lang"), col("text")).collect().map { r =>
        val text = r.getString(2)
        val y = if (r.getString(1) == "en") 1L else -1L
        (r.getString(0), y,
          Array(1L, text.split(" ", -1).length.toLong, text.length.toLong,
            text.count(_ == 'e').toLong))
      }
    val w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to MiningQueries.PerceptronRounds) {
      val mis = feats.filter { case (_, y, x) =>
        y * (0 to 3).map(j => w(j) * x(j)).sum <= 0
      }
      for (j <- 0 to 3) w(j) += mis.map { case (_, y, x) => y * x(j) }.sum
    }
    val truth = feats.groupBy(_._1).map { case (src, rs) =>
      val scored = rs.map { case (_, y, x) =>
        (y, if ((0 to 3).map(j => w(j) * x(j)).sum > 0) 1L else -1L)
      }
      src -> (rs.length.toLong,
        scored.count { case (y, p) => y == 1 && p == 1 }.toLong,
        scored.count { case (y, p) => y == -1 && p == 1 }.toLong,
        scored.count { case (y, p) => y == -1 && p == -1 }.toLong,
        scored.count { case (y, p) => y == 1 && p == -1 }.toLong)
    }
    val got = MiningQueries.x93PerceptronEval(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == truth)
    // the four cells tile every source's docs
    got.foreach { case (src, (n, tp, fp, tn, fn)) =>
      assert(tp + fp + tn + fn == n, s"$src cells don't tile $n docs")
    }
  }

  test("x94 semantic decontamination: argmax replay, both flag paths live") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dotS(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) {
        val v = a(i) * b(i) * 1000000d
        s += (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        i += 1
      }
      s
    }
    val bench = emb.filter(_._1 < 50).sortBy(_._1)
    val truth = emb.filter(_._1 >= 50).sortBy(_._1).map { case (cid, ce) =>
      val cn = math.sqrt(dotS(ce, ce).toDouble)
      val (bid, cos) = bench.map { case (b, be) =>
        (b, dotS(ce, be) / (cn * math.sqrt(dotS(be, be).toDouble)))
      }.maxBy { case (b, c) => (c, -b) }
      (cid, bid, cos > MiningQueries.SemDecontThreshold)
    }
    val got = MiningQueries.x94SemanticDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3) == 1L))
    assert(got.toSeq == truth.toSeq)
    assert(got.exists(_._3) && got.exists(!_._3),
      "threshold does not exercise both flag paths at this SF")
  }

  test("x95 centroid outliers: integer distances replay; 5% flagged per label") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map { x =>
          val v = x.toDouble * 1000
          (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        }.toArray))
    val byLab = emb.groupBy(_._2)
    val truth = byLab.toSeq.flatMap { case (lab, rs) =>
      val n = rs.length.toLong
      val sums = Array.tabulate(rs.head._3.length)(j => rs.map(_._3(j)).sum)
      val dists = rs.map { case (id, _, xs) =>
        id -> xs.indices.map { j =>
          val t = n * xs(j) - sums(j); t * t
        }.sum
      }
      val ranked = dists.sortBy { case (id, dd) => (-dd, id) }.zipWithIndex
      val cut = math.max(1L, n / 20)
      ranked.map { case ((id, dd), i) =>
        (id, lab.toLong, dd, (i + 1).toLong, if (i + 1 <= cut) 1L else 0L)
      }
    }.toSeq.sortBy(_._1)
    val got = MiningQueries.x95CentroidOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == truth)
    // exactly ceil-free 5% (n DIV 20, min 1) flagged per label
    got.groupBy(_._2).foreach { case (lab, rs) =>
      val n = rs.length.toLong
      assert(rs.count(_._5 == 1L).toLong == math.max(1L, n / 20),
        s"label $lab flag count")
    }
  }

  test("x96 Zipf fit replays driver-side; slope is negative and sane") {
    val freqs = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (w, f) => (-f, w) }.take(MiningQueries.ZipfTopN)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1000), math.round(math.log(f.toDouble) * 1000))
    }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._1 * p._2).sum)
    val slope = BigDecimal((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = MiningQueries.x96ZipfProfile(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - slope) < 1e-9,
      s"slope ${row.getDouble(1)} != replay $slope")
    // corpus health: rank-frequency decays (negative slope), and the
    // synthetic vocabulary is flatter than natural language's -1
    assert(row.getDouble(1) < 0.0 && row.getDouble(1) > -2.0)
  }

  test("x97 centroid drift replays driver-side; same-distribution halves sit low") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map { x =>
          val v = x.toDouble * 1000
          (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        }.toArray))
    def meanS(rs: Array[(Long, Int, Array[Long])]): Array[Long] = {
      val n = rs.length.toDouble
      Array.tabulate(rs.head._3.length) { j =>
        val v = rs.map(_._3(j)).sum / n * 1000
        (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
      }
    }
    val truth = emb.groupBy(_._2).map { case (lab, rs) =>
      val (o, nn) = rs.partition(_._1 % 2 == 0)
      val (mo, mn) = (meanS(o), meanS(nn))
      lab.toLong -> (o.length.toLong, nn.length.toLong,
        mo.indices.map { j => val t = mo(j) - mn(j); t * t }.sum)
    }
    val got = MiningQueries.x97CentroidDrift(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == truth)
    // both halves draw from the same distribution: the mean drift must
    // sit far below the within-label spread (x95's distances are ~1e9
    // at the same 1e6 mean scale) — a sanity floor, not a pin
    assert(got.values.forall(_._3 > 0))
  }

  test("x98 source overlap: cells recount from x7 pairs, matrix symmetric-canonical") {
    val src = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = DedupQueries.x7Pairs(spark, sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, rs) =>
      val js = rs.map { case (_, _, j) => math.round(j * 1000000) }
      k -> (rs.length.toLong, js.sum / js.length)
    }
    val got = MiningQueries.x98SourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == truth)
    got.keys.foreach { case (lo, hi) => assert(lo <= hi) }
    assert(got.nonEmpty)
  }

  test("x99 length-bias correlation replays driver-side, |corr| <= 1") {
    val pts = Tables.documents(spark, sf)
      .select(col("n_chars"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        (r.getLong(0), toks.count(_.length <= 3).toLong * 1000 / toks.length)
      }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val corr = BigDecimal((n * sxy - sx * sy).toDouble
        / (math.sqrt((n * sxx - sx * sx).toDouble)
          * math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = MiningQueries.x99LengthBias(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == sx * 1000 / n)
    assert(row.getLong(2) == sy / n)
    assert(math.abs(row.getDouble(3) - corr) < 1e-9)
    assert(math.abs(row.getDouble(3)) <= 1.0)
  }

  test("x100 comparison arms equal each method's own pair count") {
    val got = MiningQueries.x100DedupCompare(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("exact", "minhash", "ngram", "simhash"))
    assert(got("minhash") == DedupQueries.x2DedupMinhash(spark, sf).count())
    assert(got("ngram") == DedupQueries.x7NgramJaccard(spark, sf).count())
    assert(got("simhash") == DedupQueries.x6DedupSimhash(spark, sf).count())
    val exact = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0)).groupBy(identity).values
      .map(g => (g.length - 1).toLong).sum
    assert(got("exact") == exact)
  }

  test("x101 passage extraction replays; hit-anchored max equals global max") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val W = MiningQueries.PassageW
    val truth = TextQueries.bm25Queries.flatMap { case (qid, terms) =>
      val ts = terms.toSet
      val perDoc = docs.flatMap { case (id, words) =>
        val hitPos = words.indices.filter(i => ts(words(i)))
        if (hitPos.isEmpty) None
        else {
          val scored = hitPos.map(st =>
            (st, hitPos.count(p => p >= st && p < st + W)))
          val (bs, bh) = scored.maxBy { case (st, h) => (h, -st) }
          // the anchoring claim: no window anywhere beats a hit-anchored one
          val globalMax = (0 until words.length)
            .map(st => hitPos.count(p => p >= st && p < st + W)).max
          assert(globalMax == bh, s"doc $id query $qid anchor suboptimal")
          Some((id, bs.toLong, bh.toLong))
        }
      }
      perDoc.sortBy { case (id, _, h) => (-h, id) }.take(5).zipWithIndex
        .map { case ((id, bs, bh), i) =>
          (qid, (i + 1).toLong, id, bs, bh)
        }
    }
    val got = MiningQueries.x101PassageExtract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == truth)
    assert(got.nonEmpty)
  }

  test("x103 mutual kNN: exactly the reciprocal edges of x45's graph") {
    val edges = DedupQueries.x45KnnGraph(spark, sf)
      .select("src_id", "nbr_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val truth = edges.keySet.collect {
      case (a, b) if a < b && edges.contains((b, a)) =>
        (a, b, edges((a, b)), edges((b, a)))
    }
    val got = DedupQueries.x103MutualKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == truth,
      s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    assert(got.nonEmpty, "graph has no reciprocal pairs at this SF")
    // reciprocal pairs are a strict subset: one-directional edges exist
    assert(got.size < edges.size)
  }

  test("x104 kNN label audit replays driver-side; agreement beats chance") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dotS(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) {
        val v = a(i) * b(i) * 1000000d
        s += (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        i += 1
      }
      s
    }
    val truth = emb.filter(_._1 < DedupQueries.KnnAuditN).sortBy(_._1)
      .map { case (qid, qlab, qe) =>
        val qn = math.sqrt(dotS(qe, qe).toDouble)
        val top = emb.filter(_._1 != qid).map { case (cid, clab, ce) =>
          (cid, clab, dotS(qe, ce) / (qn * math.sqrt(dotS(ce, ce).toDouble)))
        }.sortBy { case (cid, _, cos) => (-cos, cid) }
          .take(DedupQueries.KnnAuditK)
        val votes = top.groupBy(_._2).map { case (l, vs) => (l, vs.length) }
        val (pl, nv) = votes.toSeq.maxBy { case (l, n) => (n, -l) }
        (qid, qlab.toLong, pl.toLong, nv.toLong,
          if (qlab.toLong == pl.toLong) 1L else 0L)
      }
    val got = DedupQueries.x104KnnLabelAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == truth.toSeq)
    // isotropic embeddings: agreement hovers near the label prior, but
    // the audit must not be degenerate (some agree, some disagree)
    assert(got.exists(_._5 == 1L) && got.exists(_._5 == 0L))
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
