package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the non-SQL-expressible extension operators
  * (minhash/simhash/LSH/multimodal) against exact ground truth computed
  * in-engine at sf0.001/sf0.01. */
class ExtSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("minhash LSH finds exactly the high-jaccard planted pairs") {
    // ground truth: exact 3-gram jaccard >= 0.5 (matches the minhash
    // shingle size so the estimator is unbiased for the same measure)
    val docs = Tables.documents(spark, sf)
    val grams = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("g")).distinct()
    val sizes = grams.groupBy("doc_id").count()
    val truth = grams.as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("doc_id").as("da"), col("count").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("count").as("nb")), "db")
      .where(col("ni") / (col("na") + col("nb") - col("ni")) >= 0.5)
      .select(col("da"), col("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = DedupQueries.x2DedupMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val missed = truth -- found
    val extra = found -- truth
    // banding (16 bands x 4) catches j>=0.5 w.h.p.; allow 10% slack
    assert(missed.size <= math.max(1, truth.size / 10),
      s"missed ${missed.size} of ${truth.size}: $missed")
    assert(extra.size <= math.max(2, truth.size / 5), s"extra pairs: $extra")
  }

  test("simhash: near-identical docs collide, hamming is symmetric-free") {
    val out = DedupQueries.x6DedupSimhash(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 2))
  }

  test("ANN LSH results are a subset of brute-force with decent recall") {
    val brute = DedupQueries.x3TopkSimilarity(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = DedupQueries.x14AnnLsh(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // single-probe LSH on near-orthogonal vectors: recall is modest; it
    // must be nonzero and every ANN hit must be a real vector pair
    assert(ann.nonEmpty)
    val overlap = ann.intersect(brute)
    assert(overlap.nonEmpty, "ANN found none of the brute-force top-5")
  }

  test("PQ ANN: well-formed ranking, compression invariants, some true neighbors") {
    val pq = DedupQueries.x38AnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // 10 queries × top-5, adc nondecreasing within each query
    assert(pq.map(_._1).distinct.length == 10)
    pq.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
      assert(sorted.forall(_._4 >= 0L)) // squared distances
    }
    // ADC ranking must recover at least some of the exact cosine top-5:
    // random (untrained) codebooks give modest recall, but on 64-dim
    // vectors 8×8-dim quantizers preserve enough geometry to be nonzero
    val brute = DedupQueries.x3TopkSimilarity(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq.map(t => (t._1, t._3)).toSet.intersect(brute)
    assert(hits.nonEmpty, "PQ found none of the brute-force top-5")
  }

  test("IVF-PQ composes: restricted candidates can never beat unrestricted PQ") {
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.where(col("rank") === 1).collect()
        .map(r => (r.getLong(0), r.getLong(3))).toMap
    val pq = top1(DedupQueries.x38AnnPq(spark, sf))
    val ivfpq = top1(DedupQueries.x39AnnIvfPq(spark, sf))
    assert(ivfpq.keySet == pq.keySet) // every query still answers
    // x39 scans a subset of x38's candidates with the same ADC, so its
    // best distance is bounded below by x38's
    ivfpq.foreach { case (q, adc) =>
      assert(adc >= pq(q), s"query $q: ivfpq adc $adc < pq ${pq(q)}")
    }
  }

  test("approx_count_distinct stays within 5% of exact") {
    val terms = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
    val both = terms.groupBy("source")
      .agg(countDistinct(col("term")).as("exact"),
        approx_count_distinct(col("term"), 0.01).as("approx"))
      .collect()
    both.foreach { r =>
      val e = r.getLong(1).toDouble; val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.05, s"source ${r.get(0)}: $a vs $e")
    }
  }

  test("multimodal features: histogram mass, rebin, frame sampling") {
    val out = TextQueries.x13MultimodalFeatures(spark, sf).collect()
      .map { r =>
        (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("kind")),
          r.getLong(r.fieldIndex("idx")), r.getDouble(r.fieldIndex("value")),
          r.getLong(r.fieldIndex("n_bytes")))
      }
    val byDoc = out.groupBy(_._1)
    assert(byDoc.size == 500)
    byDoc.foreach { case (_, rows) =>
      val n = rows.head._5
      val hist = rows.filter(_._2 == "hist")
      val coarse = rows.filter(_._2 == "coarse")
      val frames = rows.filter(_._2 == "frame")
      assert(hist.length == 16 && hist.map(_._4).sum == n)
      assert(coarse.length == 4 && coarse.map(_._4).sum == n)
      assert(frames.length == (n + 63) / 64)
      assert(frames.forall(f => f._4 >= 0 && f._4 <= 255))
    }
  }

  test("approx quantiles (the 100 TB path) track the exact thresholds") {
    // x18's exact rank-arithmetic quantiles are the auditable form; at
    // scale the same thresholds come from percentile_approx (t-digest).
    // Pin that the approx path lands within the corpus's length spread.
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.documents(spark, sf)
    val approx = docs.groupBy(col("source"))
      .agg(percentile_approx(col("n_chars"),
        array(TextQueries.QuantilePoints.map(lit): _*), lit(10000)).as("qs"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Any](1).map(_.toString.toLong)).toMap
    val exact = TextQueries.x18LengthQuantiles(spark, sf).collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.sortBy(_.getDouble(1))
          .map(r => r.get(2).toString.toLong).toSeq }
    exact.foreach { case (src, ex) =>
      val ap = approx(src)
      ex.zip(ap).foreach { case (e, a) =>
        assert(math.abs(e - a).toDouble <= math.max(8L, (e * 0.05).toLong),
          s"source $src: approx quantile $a far from exact $e")
      }
    }
  }

  test("PNG payloads decode losslessly and pixel features come from pixels") {
    // codec round-trip: imageio PNG encode -> decode is the identity on
    // 8-bit grayscale samples
    val pixels = Array.tabulate(64)(i => (i * 37 + 11) % 256)
    assert(TextQueries.decodePng(TextQueries.encodePng(pixels)).sameElements(pixels))
    // png-codec docs (every 5th) report the decoded pixel stream, not
    // the raw payload: 64 pixels -> one frame whose mean equals the
    // cyclic text-byte formula
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextQueries.x13MultimodalFeatures(spark, sf).collect()
    val pngRows = out.filter(r => r.getString(r.fieldIndex("codec")) == "png")
    assert(pngRows.nonEmpty)
    assert(pngRows.forall(_.getLong(2) == 64L), "png n_bytes = decoded pixel count")
    pngRows.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(id % 5 == 0)
      val frames = rows.filter(_.getString(3) == "frame")
      assert(frames.length == 1, "8x8 image = one 64-value frame")
      val tb = docs(id).getBytes("UTF-8")
      val expected = TextQueries.pngPixelsOf(tb).map(_.toDouble).sum / 64.0
      assert(frames.head.getDouble(5) == expected,
        s"doc $id frame mean not derived from decoded pixels")
    }
    // WAV round-trip: 8-bit PCM encode -> decode is the identity
    assert(TextQueries.decodeWav(TextQueries.encodeWav(pixels))
      .sameElements(pixels))
    // wav-codec docs (every 7th, non-5th) report decoded PCM samples
    val wavRows = out.filter(r => r.getString(r.fieldIndex("codec")) == "wav")
    assert(wavRows.nonEmpty)
    assert(wavRows.forall(_.getLong(2) == 64L), "wav n_bytes = sample count")
    wavRows.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(id % 7 == 0 && id % 5 != 0)
      val frames = rows.filter(_.getString(3) == "frame")
      assert(frames.length == 1)
      val tb = docs(id).getBytes("UTF-8")
      val expected = TextQueries.pngPixelsOf(tb).map(_.toDouble).sum / 64.0
      assert(frames.head.getDouble(5) == expected,
        s"doc $id frame mean not derived from decoded samples")
    }
    // JPEG round-trip: constant 8x8 blocks at quality 1.0 are DC-only
    // with all-ones quant tables — bit-exact for EVERY value 0..255
    (0 until 256).foreach { v =>
      val back = TextQueries.decodePng(TextQueries.encodeJpg(v))
      assert(back.length == 64 && back.forall(_ == v),
        s"jpg constant block $v did not round-trip exactly")
    }
    // jpg-codec docs (every 11th, non-5th/7th) report decoded pixels:
    // one 64-value frame whose mean is the constant first text byte
    val jpgRows = out.filter(r => r.getString(r.fieldIndex("codec")) == "jpg")
    assert(jpgRows.nonEmpty)
    assert(jpgRows.forall(_.getLong(2) == 64L), "jpg n_bytes = pixel count")
    jpgRows.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(id % 11 == 0 && id % 5 != 0 && id % 7 != 0)
      val frames = rows.filter(_.getString(3) == "frame")
      assert(frames.length == 1)
      val expected = (docs(id).getBytes("UTF-8")(0) & 0xff).toDouble
      assert(frames.head.getDouble(5) == expected,
        s"doc $id frame mean not the decoded constant pixel")
    }
  }

  test("IVF ANN probes return real neighbors with brute-force overlap") {
    val brute = DedupQueries.x3TopkSimilarity(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = DedupQueries.x15AnnIvf(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    assert(ivf.intersect(brute).nonEmpty,
      "IVF found none of the brute-force top-5")
  }

  test("dup clusters: pairs co-clustered, canonical id is the min member") {
    val pairs = DedupQueries.x7NgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupQueries.x16DupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(clusters.nonEmpty)
    // every near-dup pair lands in the same cluster (transitive closure)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split")
    }
    // cluster id is the minimum member id; sizes count the members
    val byCluster = clusters.groupBy(_._2._1)
    byCluster.foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.values.forall(_._2 == members.size))
    }
    // exactly the documents that appear in some pair are clustered
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("exact ngram jaccard agrees with minhash estimates (planted pairs)") {
    val exact = DedupQueries.x7NgramJaccard(spark, sf)
      .where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = DedupQueries.x2DedupMinhash(spark, sf)
      .where(col("est_jaccard") >= 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty && exact.nonEmpty)
    assert(mh.intersect(exact).size >= math.min(mh.size, exact.size) / 2)
  }

  test("lsh near-dup pairs are a subset of exact pairs with high recall") {
    val exact = DedupQueries.x8EmbeddingDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = DedupQueries.x30NeardupLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "LSH prefilter found nothing")
    // subset property is exact: same threshold, exact rescore
    lsh.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"$pair not in exact pairs")
      assert(math.abs(exact(pair) - cos) < 1e-12, s"$pair cosine differs")
    }
    // recall: this fixture's pairs sit at cosine 0.4-0.51 (~66 deg), so
    // P(signature hamming <= 1) is ~0.3 per random-hyperplane theory —
    // pin a deterministic 1/3 floor (measured 21/59 on the fixed planes;
    // recall rises toward 1 as cosine -> 1, which is the regime the
    // prefilter exists for)
    assert(lsh.size * 3 >= exact.size,
      s"recall ${lsh.size}/${exact.size} below 1/3")
    // the prefilter must actually prune: candidates, not the pair space
    assert(lsh.size < exact.size)
  }

  test("line dedup: span accounting exact, corpus contains real dup spans") {
    val rows = TextQueries.x26LineDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val nWords = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == nWords.keySet, "every doc gets a row")
    rows.foreach { case (id, (nLines, nDup, retained)) =>
      // span count = ceil(words / LineWords), from the explode bound
      val expected = (nWords(id) - 1) / TextQueries.LineWords + 1
      assert(nLines == expected, s"doc $id: $nLines lines, want $expected")
      // a doc may lose every span (C4 drops fully-duplicated docs)
      assert(nDup >= 0 && nDup <= nLines, s"doc $id dup count out of range")
      assert(math.abs(retained - (nLines - nDup).toDouble / nLines) < 1e-12)
    }
    // the small-vocab corpus must actually exercise the dedup path
    assert(rows.values.map(_._2).sum > 0, "no duplicate spans found")
    // first-occurrence rule: total kept lines == distinct line hashes
    val kept = rows.values.map(v => v._1 - v._2).sum
    val distinctLines = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        s"transform(sequence(0, (size(w) - 1) DIV ${TextQueries.LineWords}), " +
          s"i -> concat_ws(' ', slice(w, i * ${TextQueries.LineWords} + 1, ${TextQueries.LineWords})))"))
        .as("line"))
      .distinct().count()
    assert(kept == distinctLines, s"kept $kept != distinct $distinctLines")
  }

  test("repeated substrings: containment dups score 1.0, fractions sane") {
    val rows = TextQueries.x31RepeatedSubstrings(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (nW, nR, frac)) =>
      assert(nW > 0 && nR >= 0 && nR <= nW, s"doc $id counts")
      assert(math.abs(frac - nR.toDouble / nW) < 1e-12, s"doc $id fraction")
    }
    // the crisp deterministic anchor: the fixture plants CONTAINMENT
    // dups (one doc's text verbatim inside another's) — every window of
    // the contained doc recurs in the container, so its fraction is
    // exactly 1.0. This is the dup class x1 (exact) and x26 (aligned
    // spans) both miss, and the reason this operator exists. (The
    // scattered-substitution NEAR-dups rightly score ~0: edits land
    // within any 8-token window.)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val contained = texts.filter { case (id, t) =>
      t.split(" ").length >= TextQueries.SubstrWindow &&
        texts.exists { case (oid, ot) => oid != id && ot.contains(t) }
    }.map(_._1)
    assert(contained.nonEmpty, "fixture has no containment dups")
    contained.foreach { id =>
      assert(rows(id)._3 == 1.0, s"contained doc $id fraction ${rows(id)._3}")
    }
    // and the corpus-wide signal is not saturated (scores discriminate)
    assert(rows.values.exists(_._3 == 0.0) || rows.values.map(_._3).min < 0.5,
      "every doc maximally repeated — window too weak to discriminate")
  }

  test("pii scrub: finds exactly the injected pii, placeholders replace it") {
    val rows = TextQueries.x27PiiScrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmails, nPhones, _) =>
      assert(nEmails == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(nPhones == (if (id % 7 == 0) 1L else 0L), s"doc $id phones")
    }
    // scrubbed text of a pii doc differs from its un-scrubbed fixture;
    // a clean doc's scrubbed text is byte-identical to the original
    val originals = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, _, scrubMd5) =>
      if (id % 3 != 0 && id % 7 != 0)
        assert(scrubMd5 == originals(id), s"clean doc $id was altered")
      else assert(scrubMd5 != originals(id), s"pii doc $id unchanged")
    }
  }

  test("split assign: deterministic, exhaustive, near the 90/5/5 target") {
    val rows = TextQueries.x28SplitAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = rows.length
    assert(n > 0)
    rows.foreach { case (_, bucket, split) =>
      assert(bucket >= 0 && bucket < 100)
      val want =
        if (bucket < 90) "train" else if (bucket < 95) "validation" else "test"
      assert(split == want)
    }
    val frac = rows.groupBy(_._3).view.mapValues(_.size.toDouble / n).toMap
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.90) < 0.06, frac)
    assert(math.abs(frac.getOrElse("validation", 0.0) - 0.05) < 0.04, frac)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.04, frac)
    // pure function of doc_id: a second evaluation is identical
    val again = TextQueries.x28SplitAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("weighted sample: length-biased draw, dense ranks, replayable keys") {
    val rows = TextQueries.x32WeightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"$src ranks not dense")
      assert(rs.length <= TextQueries.WeightedPerSource)
    }
    // Efraimidis-Spirakis biases toward heavy docs: the sampled mean
    // weight must exceed the corpus mean (deterministic on this fixture)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val sampleMean = rows.map(_._4).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"no length bias: sample $sampleMean vs corpus $corpusMean")
    // keys replay exactly: round(ln(u)/w, 6) from the portable hash
    val keyOf = Tables.documents(spark, sf).select(col("doc_id"),
        round(log((expr(graft.queries.PortableHash.hex60(
          "concat('x32:', CAST(doc_id AS STRING))")) % 1000000L + 1L)
          / lit(1000000.0)) / col("n_chars").cast("double"), 6))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (_, _, id, _, key) => assert(key == keyOf(id)) }
  }

  test("budget select: exactly the longest-first greedy prefix per source") {
    val budget = TextQueries.TokenBudget
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = docs.groupBy(_._1).iterator.flatMap { case (_, ds) =>
      var cum = 0L
      // longest-first; a doc that would overflow stops the prefix
      ds.sortBy(d => (-d._3, d._2)).takeWhile { d =>
        cum += d._4; cum <= budget
      }.map(_._2)
    }.toSet
    val got = TextQueries.x33BudgetSelect(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(got.map(_._1).toSet == expected, "selected set diverges")
    got.foreach { case (id, cum) =>
      assert(cum <= budget, s"doc $id cum $cum over budget")
    }
    // the budget binds: not everything is selected
    assert(got.length < docs.length, "budget never binds on this fixture")
  }

  test("chunk overlap: windows tile every doc with the configured stride") {
    val w = TextQueries.ChunkWindow
    val s2 = TextQueries.ChunkStride
    val byDoc = TextQueries.x29ChunkOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._3)
      val n = sorted.head._2
      assert(sorted.map(_._3).toSeq == (0L until sorted.length).toSeq,
        s"doc $id: chunk ids not dense")
      sorted.foreach { case (_, _, cid, start, end) =>
        assert(start == cid * s2 && end == math.min(start + w, n))
        assert(end > start, s"doc $id chunk $cid empty")
      }
      // full coverage: last window reaches the end, no window starts past it
      assert(sorted.last._5 == n, s"doc $id: tail uncovered")
      assert(sorted.last._4 < n, s"doc $id: chunk starts past end")
      // overlap contract between consecutive windows (all docs here > w)
      if (sorted.length > 1)
        assert(sorted(0)._5 - sorted(1)._4 == (w - s2).toLong)
    }
  }

  // the x13 oracle models bytes with per-CHARACTER ord(substr(...)) —
  // including the jpg constant (kernel: first UTF-8 byte) — which only
  // equals Spark's UTF-8 bytes while the fixture stays ASCII. Pin that
  // assumption where it's legible instead of letting a future non-ASCII
  // fixture surface as an opaque hash mismatch.
  test("x13 fixture assumption: documents text is ASCII at the verify SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { d =>
      val nonAscii = Tables.documents(spark, d)
        .where(org.apache.spark.sql.functions.expr(
          "octet_length(text) <> char_length(text)")).count()
      assert(nonAscii == 0,
        s"$d: $nonAscii non-ASCII documents — x13's ord()-based oracle " +
          "(and its jpg first-byte constant) no longer matches UTF-8 bytes")
    }
  }

  test("semantic dedup: reps are component minima, kept = one per cluster") {
    val out = DedupQueries.x48SemanticDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nVec = Tables.embeddings(spark, sf).count()
    assert(out.length == nVec, "every vector gets a dedup decision")
    // a representative is the minimum id of its component, so it keeps
    // itself; every dropped vector points at a kept representative
    val keptIds = out.filter(_._3).map(_._1).toSet
    out.foreach { case (id, rep, kept) =>
      assert(rep <= id, s"rep $rep of $id is not a component minimum")
      assert(kept == (id == rep))
      assert(keptIds.contains(rep), s"rep $rep of $id was itself dropped")
    }
    // the near-dup pair scan must actually merge something at this SF
    assert(keptIds.size < nVec, "fixture contains near-dup embeddings")
    // cross-check against the pair scan: paired vectors never BOTH kept
    DedupQueries.x8PairScan(spark, sf).select(col("vec_a"), col("vec_b"))
      .collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(!(keptIds.contains(a) && keptIds.contains(b)),
          s"near-dup pair ($a,$b) both kept")
      }
  }

  test("cell-bounded semantic dedup: edges ⊆ exact arm, drops ⊆ exact drops") {
    // x108 restricts x48's edge set to pairs sharing a k-means cell —
    // it may MISS exact edges (the recall/compute trade) but must never
    // invent one: every x108 edge is an x8 edge, and therefore every
    // x108 drop is an x48 drop (cells can only split components).
    val exactEdges = DedupQueries.x8PairScan(spark, sf)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellEdges = DedupQueries.x108CellPairScan(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cellEdges.subsetOf(exactEdges),
      s"cell scan invented edges: ${(cellEdges -- exactEdges).take(5)}")
    assert(cellEdges.nonEmpty, "fixture finds no in-cell near-dup pairs")
    val exactDrops = DedupQueries.x48SemanticDedup(spark, sf)
      .where(!col("kept")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val cellDrops = DedupQueries.x108SemanticDedupCells(spark, sf)
      .where(!col("kept")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(cellDrops.subsetOf(exactDrops),
      s"x108 dropped ids x48 keeps: ${(cellDrops -- exactDrops).take(5)}")

    // re-pin at a second cell count (the k-knob, VERDICT r9 gap #3):
    // containment is a k-invariant — cells at ANY k can only restrict
    // the edge set, never invent pairs, so edges and drops at k=64 must
    // be subsets of the exact arm (k=16 and k=64 partitions are not
    // nested, so no cross-k containment is asserted)
    val cellEdges64 = DedupQueries.x108CellPairScan(spark, sf, k = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cellEdges64.subsetOf(exactEdges),
      s"k=64 cell scan invented edges: ${(cellEdges64 -- exactEdges).take(5)}")
    assert(cellEdges64.nonEmpty, "k=64 finds no in-cell near-dup pairs")
    val cellDrops64 = DedupQueries.semanticDedupDecision(spark,
        Tables.embeddings(spark, sf),
        DedupQueries.x108CellPairScan(spark, sf, k = 64))
      .where(!col("kept")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(cellDrops64.subsetOf(exactDrops),
      s"k=64 dropped ids x48 keeps: ${(cellDrops64 -- exactDrops).take(5)}")
  }

  test("semantic dedup scale path: hash collapse + LSH pairs, replication-invariant") {
    // the CorpusSoak composition at CI scale: replicate the vectors 3x,
    // collapse exact twins by content hash, run the sublinear x30 pair
    // scan on distinct vectors only, decide over every replica
    val base = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val n = base.agg(max(col("vec_id"))).head.getLong(0) + 1
    val vecs = (0 until 3).map { k =>
      base.select((col("vec_id") + lit(k * n)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val crep = vecs.withColumn("h", xxhash64(col("embedding")))
      .groupBy(col("h")).agg(min(col("vec_id")).as("crep"))
    val withRep = vecs.withColumn("h", xxhash64(col("embedding"))).join(crep, "h")
    val twinStars = withRep.where(col("vec_id") =!= col("crep"))
      .select(col("vec_id").as("vec_a"), col("crep").as("vec_b"))
    val distinctVecs = withRep.where(col("vec_id") === col("crep"))
      .select(col("vec_id"), col("embedding"))
    assert(distinctVecs.count() == n, "hash collapse finds exactly the base set")
    val decision = DedupQueries.semanticDedupDecision(spark,
      vecs.select(col("vec_id")),
      twinStars.unionByName(DedupQueries.x30PairScan(spark, distinctVecs)
        .select(col("vec_a"), col("vec_b"))))
    assert(decision.count() == 3 * n)
    // no replica outranks its base copy
    assert(decision.where(col("rep_id") >= n).isEmpty)
    // restricted to base ids, the decision is byte-identical to the
    // unreplicated run — replication-invariance
    val baseDecision = DedupQueries.semanticDedupDecision(spark,
      base.select(col("vec_id")),
      DedupQueries.x30PairScan(spark, base).select(col("vec_a"), col("vec_b")))
    val proj = decision.where(col("vec_id") < n)
    assert(proj.exceptAll(baseDecision).isEmpty &&
      baseDecision.exceptAll(proj).isEmpty)
  }

  test("bpe pair count: exact counts on a hand-checkable recomputation") {
    val out = TextQueries.x49BpePairCount(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.length == 50)
    // descending with (a,b) tiebreak — the deterministic top-50 contract
    out.sliding(2).foreach { case Array(x, y) =>
      assert(x._3 > y._3 ||
        (x._3 == y._3 && (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2))))
    }
    // symbols are single lowercase characters at round 0
    out.foreach { case (a, b, n) =>
      assert(a.length == 1 && b.length == 1 && n > 0)
      assert(a.head.isLower && b.head.isLower)
    }
    // independent recomputation of one pair's count, driver-side
    val (pa, pb, pn) = out.head
    val docs = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val wf = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { t =>
      t.toLowerCase.map(c => if (c >= 'a' && c <= 'z') c else ' ')
        .split(" ").filter(_.length >= 2)
        .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L)
    }
    val expect = wf.iterator.map { case (w, f) =>
      f * w.sliding(2).count(p => p(0) == pa.head && p(1) == pb.head)
    }.sum
    assert(pn == expect, s"top pair ($pa,$pb): engine $pn vs recompute $expect")
  }

  test("bm25: ranked lists well-formed, rare-term idf dominates") {
    val out = TextQueries.x51Bm25TopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == TextQueries.bm25Queries.map(_._1).toSet)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      // score non-increasing with rank; doc_id ascending inside ties
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
      }
    }
    // q4 = the single rare term: every hit must actually contain it,
    // and the full TopK fills (df('dup') > TopK at sf0.01)
    val dupDocs = Tables.documents(spark, sf)
      .where(col("text").contains("dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val q4 = byQuery(4L)
    assert(q4.length == TextQueries.Bm25TopK)
    q4.foreach { case (_, _, docId, _) => assert(dupDocs.contains(docId)) }
    // q1 = rare 'dup' + common 'scan': idf separates them by ~ln(N/df)
    // ratio, so rank 1 must hit a 'dup' doc, not a scan-only doc
    val q1Top = byQuery(1L).minBy(_._2)
    assert(dupDocs.contains(q1Top._3),
      s"q1 rank-1 doc ${q1Top._3} does not contain the rare term")
  }

  test("quality keeper: keeps exactly the best copy per near-dup cluster") {
    val out = DedupQueries.x52QualityKeeper(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val n = Tables.documents(spark, sf).count()
    assert(out.length == n, "every document gets a decision")
    out.groupBy(_._2).foreach { case (cluster, rows) =>
      val kept = rows.filter(_._5)
      assert(kept.length == 1, s"cluster $cluster keeps ${kept.length} docs")
      val maxQ = rows.map(_._3).max
      val winner = kept.head
      assert(winner._3 == maxQ, s"cluster $cluster kept a non-best copy")
      // tie → lowest doc_id among the max-quality copies
      assert(winner._1 == rows.filter(_._3 == maxQ).map(_._1).min)
      // rep_id column agrees with the kept flag for every member
      rows.foreach(r => assert(r._4 == winner._1))
    }
    // the policy must actually differ from x48's min-id stand-in
    // somewhere, or this key is a re-skin: at least one multi-doc
    // cluster's winner is NOT the min doc_id
    val multi = out.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "no multi-doc near-dup clusters at this SF")
    assert(multi.exists { case (_, rows) =>
      rows.filter(_._5).head._1 != rows.map(_._1).min
    }, "quality arg-max never diverged from min-id — vacuous policy")
  }

  test("bigram LM score: matches an exact driver-side recompute") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tok(t: String): Array[String] = t.toLowerCase
      .map(c => if (c >= 'a' && c <= 'z') c else ' ')
      .split(" +").filter(_.nonEmpty)
    val docToks = texts.map { case (id, t) => (id, tok(t)) }
      .filter(_._2.length >= 2)
    val cab = scala.collection.mutable.Map.empty[(String, String), Long]
    val ca = scala.collection.mutable.Map.empty[String, Long]
    docToks.foreach { case (_, ts) =>
      ts.sliding(2).foreach { case Array(a, b) =>
        cab((a, b)) = cab.getOrElse((a, b), 0L) + 1L
        ca(a) = ca.getOrElse(a, 0L) + 1L
      }
    }
    val v = cab.keysIterator.flatMap(p => Iterator(p._1, p._2)).toSet.size
    val expect = docToks.map { case (id, ts) =>
      val sum = ts.sliding(2).map { case Array(a, b) =>
        math.round(math.log((cab((a, b)) + 1.0) / (ca(a) + v)) * 1e6)
      }.sum
      (id, ((ts.length - 1).toLong, sum))
    }.toMap
    val out = TextQueries.x53LmScore(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == expect.keySet)
    expect.foreach { case (id, (n, sum)) =>
      assert(out(id) == ((n, sum)), s"doc $id: ${out(id)} vs ($n, $sum)")
    }
    // the gate must separate docs: scores are not all equal, and every
    // log-prob sum is negative (probabilities < 1)
    assert(out.values.map(_._2).toSet.size > 1)
    assert(out.values.forall(_._2 < 0))
  }

  test("CMS estimates never undercount; absent term has zero true count") {
    val out = TextQueries.x54CmsFreq(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == TextQueries.cmsQueryTerms.toSet)
    out.foreach { case (term, est, actual) =>
      assert(est >= actual, s"$term: CMS $est under true count $actual")
    }
    val absent = out.find(_._1 == "zzzabsent").get
    assert(absent._3 == 0L, "fixture term unexpectedly present in corpus")
    // frequent probes must really be present — otherwise the ≥ checks
    // above are vacuous
    assert(out.count(_._3 > 0) >= 4, s"too few present probe terms: $out")
  }

  test("RRF fusion: matches driver-side recompute from both arms") {
    def rrf(rank: Long): Long = math.round(1e6 / (TextQueries.RrfK + rank))
    val qids = TextQueries.bm25Queries.map(_._1).toSet
    val lex = TextQueries.x51Bm25TopK(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1).toLong)).toMap
    val sem = graft.queries.DedupQueries.x3TopkSimilarity(spark, sf)
      .collect().filter(r => qids.contains(r.getLong(0)))
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1).toLong)).toMap
    val scores = (lex.keySet ++ sem.keySet).map { k =>
      k -> (lex.get(k).map(rrf).getOrElse(0L) +
        sem.get(k).map(rrf).getOrElse(0L))
    }.toMap
    val expect = scores.groupBy(_._1._1).flatMap { case (q, m) =>
      m.toSeq.map { case ((_, d), s) => (d, s) }
        .sortBy { case (d, s) => (-s, d) }.take(TextQueries.RrfTopK)
        .zipWithIndex.map { case ((d, s), i) => ((q, i + 1L), (d, s)) }
    }
    val out = TextQueries.x56RrfFusion(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1).toLong),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out == expect)
    // the fusion must be a genuine hybrid: some fused row comes from the
    // semantic arm alone and some from the lexical arm alone — otherwise
    // one arm is dead weight and the test is vacuous
    val fusedKeys = out.map { case ((q, _), (d, _)) => (q, d) }.toSet
    assert(fusedKeys.exists(k => sem.contains(k) && !lex.contains(k)),
      "no sem-only doc survived fusion")
    assert(fusedKeys.exists(k => lex.contains(k) && !sem.contains(k)),
      "no lex-only doc survived fusion")
  }

  test("phrase search: matches exact sliding-window counts, incl. overlap") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val expect = (for {
      (pid, phrase) <- TextQueries.phraseDefs
      (docId, toks) <- texts
      n = toks.sliding(phrase.length)
        .count(w => w.length == phrase.length && w.sameElements(phrase))
      if n > 0
    } yield ((pid, docId), n.toLong)).toMap
    val out = TextQueries.x55PhraseSearch(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out == expect,
      s"missing=${expect.keySet -- out.keySet} extra=${out.keySet -- expect.keySet}")
    // overlap semantics must be exercised: some repeated-token phrase
    // ("a a" / "table table") matches more than once in one doc
    val rep = TextQueries.phraseDefs.filter(p => p._2.distinct.size < p._2.size)
      .map(_._1).toSet
    assert(expect.exists { case ((pid, _), n) => rep.contains(pid) && n > 1 },
      "no overlapping repeated-token match at this SF — weak fixture")
  }

  test("dup spans: reported spans are real, maximal where uncapped") {
    val out = DedupQueries.x60DupSpans(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.nonEmpty, "no shared spans found at this SF — weak fixture")
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toMap
    // exact longest-common-word-substring by DP, per reported pair
    def lcs(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](b.length + 1)
      var best = 0
      for (i <- 1 to a.length) {
        var prev = 0
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = if (a(i - 1) == b(j - 1)) prev + 1 else 0
          if (dp(j) > best) best = dp(j)
          prev = cur
        }
      }
      best
    }
    var exactCount = 0
    out.foreach { case ((a, b), (maxSpan, nSpans)) =>
      assert(maxSpan >= DedupQueries.SpanMin && nSpans >= 1)
      val truth = lcs(texts(a), texts(b))
      // the df cap can only SPLIT or DROP spans, never invent length
      assert(maxSpan <= truth,
        s"pair ($a,$b) reports $maxSpan but true LCS is $truth")
      if (maxSpan == truth) exactCount += 1
    }
    // where no common-gram cap interferes the detector must be exact —
    // that has to be the common case on this corpus
    assert(exactCount * 2 > out.size,
      s"only $exactCount of ${out.size} pairs exactly maximal")
    // the corpus's planted near-dups share long passages — the detector
    // must surface them as long spans, not gram-sized fragments
    val longest = out.values.map(_._1).max
    assert(longest >= 50, s"longest reported span only $longest words")
  }

  test("span excise: later copies cleaned, earlier copies untouched") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val out = DedupQueries.x61SpanExcise(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == texts.size, "every doc must come back")
    val pairs = DedupQueries.x60DupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val laterDocs = pairs.map(_._2).toSet
    val earlierOnly = pairs.map(_._1).toSet -- laterDocs
    var removedTotal = 0L
    out.foreach { case (id, clean, removed) =>
      val orig = texts(id).split(" ")
      val kept = if (clean.isEmpty) Array.empty[String] else clean.split(" ")
      assert(removed == orig.length - kept.length,
        s"doc $id: removed=$removed but ${orig.length}->${kept.length}")
      // cleaned text is a subsequence of the original words
      var i = 0
      kept.foreach { w =>
        while (i < orig.length && orig(i) != w) i += 1
        assert(i < orig.length, s"doc $id: cleaned not a subsequence")
        i += 1
      }
      // keep-first policy: only LATER copies (x60's doc_b side) change
      if (removed > 0) assert(laterDocs.contains(id),
        s"doc $id cleaned but is no pair's later copy")
      if (earlierOnly.contains(id))
        assert(removed == 0 && clean == texts(id),
          s"earlier copy $id was modified")
      removedTotal += removed
    }
    assert(removedTotal > 0, "no spans excised at this SF — weak fixture")
    // every later copy with a >= SpanMin span actually lost words
    laterDocs.foreach { id =>
      val r = out.find(_._1 == id).get
      assert(r._3 >= DedupQueries.SpanMin,
        s"later copy $id lost only ${r._3} words")
    }
  }

  test("kmeans train: all vectors assigned, training beats the seeds") {
    val out = DedupQueries.x59KmeansTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == DedupQueries.IvfClusters * 64)
    // n_members is a per-cluster constant across dims, and the cluster
    // sizes partition the corpus (every vector assigned exactly once)
    val byCluster = out.groupBy(_._1)
    byCluster.values.foreach { rs =>
      assert(rs.map(_._3).distinct.length == 1,
        "n_members varies across dims of one cluster")
    }
    val total = byCluster.values.map(_.head._3).sum
    val nVec = Tables.embeddings(spark, sf).count()
    assert(total == nVec, s"assigned $total of $nVec vectors")
    // training must actually move centroids INTO the data: under each
    // round's own (dot-argmax) assignment, the within-cluster sum of
    // squared distances collapses from the random seeds (which sit far
    // from every vector) to the trained means
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).toArray.map(f =>
        DedupQueries.scale1e6(f.toDouble)))
    val seeds = DedupQueries.ivfCentroids
      .map { case (_, c) => c.map(DedupQueries.scale1e6) }
    val trained = out.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._4).toArray).toArray
    def wcss(cents: Array[Array[Long]]): BigInt =
      emb.map { e =>
        val c = cents.maxBy(c =>
          c.zip(e).map { case (a, b) => BigInt(a) * b }.sum)
        c.zip(e).map { case (a, b) => BigInt(a - b) * (a - b) }.sum
      }.sum
    val (wSeed, wTrained) = (wcss(seeds), wcss(trained))
    assert(wTrained < wSeed,
      s"training did not reduce WCSS: $wSeed -> $wTrained")
  }

  test("kmeans assign: labels partition the corpus per x59's counts") {
    val assign = DedupQueries.x62KmeansAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nVec = Tables.embeddings(spark, sf).count()
    assert(assign.length == nVec)
    assert(assign.map(_._1).distinct.length == assign.length)
    // exact driver-side replay of the training recurrence: scaled
    // embeddings, 3 Lloyd rounds with half-away rounding, then the
    // final argmax assignment — x62 must match it row for row
    val es = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(f => DedupQueries.scale1e6(f.toDouble))))
    var cs = DedupQueries.ivfCentroids
      .map { case (_, c) => c.map(DedupQueries.scale1e6) }
    def best(e: Array[Long]): (Int, Long) =
      cs.zipWithIndex.map { case (c, ci) =>
        (ci, c.zip(e).map { case (a, b) => a * b }.sum)
      }.maxBy { case (ci, dot) => (dot, -ci) }
    for (_ <- 1 to DedupQueries.KmeansRounds) {
      val members = es.groupBy { case (_, e) => best(e)._1 }
      val next = cs.map(_.clone())
      members.foreach { case (c, vs) =>
        for (dim <- cs(c).indices) {
          val q = vs.map(_._2(dim)).sum.toDouble / vs.length
          next(c)(dim) =
            (if (q >= 0) math.floor(q + 0.5) else math.ceil(q - 0.5)).toLong
        }
      }
      cs = next
    }
    val expect = es.map { case (id, e) =>
      val (c, dot) = best(e); (id, c.toLong, dot)
    }.sortBy(_._1).toSeq
    assert(assign.sortBy(_._1).toSeq == expect,
      "x62 assignment diverged from the driver-side Lloyd replay")
  }

  test("dedup audit: per-source rollup sums to x61's totals") {
    val audit = DedupQueries.x63DedupAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val excise = DedupQueries.x61SpanExcise(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(audit.map(_._2).sum == excise.length)
    assert(audit.map(_._3).sum == excise.map(_._2).sum)
    assert(audit.map(_._4).sum == excise.count(_._2 > 0))
    assert(audit.map(_._3).sum > 0, "audit shows zero removal — vacuous")
  }

  test("leakage-safe split: no near-dup cluster straddles splits") {
    val out = TextQueries.x64LeakageSafeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    // THE property: one split per cluster
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cid straddles splits: ${members.map(_._3).distinct}")
    }
    // singletons keep exactly their x28 assignment
    val x28 = TextQueries.x28SplitAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val clustered = DedupQueries.x16DupClusters(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out.filterNot(r => clustered.contains(r._1)).foreach { case (id, _, sp) =>
      assert(sp == x28(id), s"singleton $id diverges from x28")
    }
    // the fixture must actually exercise the inheritance: some
    // clustered doc's split differs from its own x28 assignment
    assert(out.exists { case (id, cid, sp) =>
      clustered.contains(id) && id != cid && sp != x28(id)
    }, "no clustered doc inherited a different split — vacuous fixture")
    // and the split proportions stay near 90/5/5
    // loose sanity bound — cluster inheritance skews a 500-doc corpus
    // a few points off 90/5/5 (observed 0.97 at sf0.01)
    val trainShare = out.count(_._3 == "train").toDouble / out.length
    assert(trainShare > 0.8 && trainShare < 1.0, s"train share $trainShare")
    assert(out.exists(_._3 != "train"), "everything landed in train")
  }

  test("DSIR weights: target-language docs score above the rest") {
    val langs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val out = TextQueries.x57DsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    // every doc with at least one alphabetic token is scored, each once
    assert(out.map(_._1).distinct.length == out.length)
    val (tgt, rest) = out.partition(r =>
      langs(r._1) == TextQueries.DsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty, "fixture must mix languages")
    val meanT = tgt.map(_._2.toDouble).sum / tgt.length
    val meanR = rest.map(_._2.toDouble).sum / rest.length
    // the defining property of importance weights against a lang=en
    // target: en docs must score decisively higher on average — their
    // tokens hash into buckets whose target probability exceeds raw
    assert(meanT > meanR,
      s"target-lang mean $meanT not above non-target mean $meanR")
    // and the separation must be usable for selection, not marginal:
    // the top weight quartile must be decisively ENRICHED in the target
    // language vs its corpus share (weights sum per token, so short
    // target docs sit near zero — enrichment, not purity, is the claim)
    val baseShare = out.count(r =>
      langs(r._1) == TextQueries.DsirTargetLang).toDouble / out.length
    val topQ = out.sortBy(-_._2).take(out.length / 4)
    val enShare = topQ.count(r =>
      langs(r._1) == TextQueries.DsirTargetLang).toDouble / topQ.length
    assert(enShare >= 1.4 * baseShare,
      s"top-quartile en share $enShare not >= 1.4x base $baseShare")
  }

  test("minhash calibration: estimator tracks exact Jaccard on candidates") {
    val out = DedupQueries.x58MinhashCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(out.nonEmpty, "LSH produced no candidate pairs at this SF")
    // the calibration table covers every x2 near-dup (x2 = the est>=0.5
    // subset of the same candidate relation)
    val pairs = out.map(r => (r._1, r._2)).toSet
    val x2 = DedupQueries.x2DedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(x2.subsetOf(pairs), s"x2 pairs missing: ${x2 -- pairs}")
    out.foreach { case (a, b, est, exact, errS) =>
      assert(a < b)
      assert(est >= 0.0 && est <= 1.0, s"est $est out of range")
      assert(exact >= 0.0 && exact <= 1.0, s"exact $exact out of range")
      assert(errS == math.round(math.abs(est - exact) * 1e6))
    }
    // Broder: E[agree/64] = J, std <= sqrt(J(1-J)/64) <= 0.0625 — the
    // MEAN absolute error across candidates must sit well inside that
    val meanErr = out.map(r => math.abs(r._3 - r._4)).sum / out.length
    assert(meanErr <= 0.10, s"mean |est - exact| = $meanErr: estimator broken")
    // and near-certain signatures must be genuinely similar documents
    out.filter(_._3 >= 0.95).foreach { case (a, b, _, exact, _) =>
      assert(exact >= 0.5, s"pair ($a,$b) est>=0.95 but exact $exact")
    }
  }

  test("contamination fraction: graded score consistent with x20's cut") {
    val frac = TextQueries.x65ContaminationFrac(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(frac.nonEmpty)
    frac.foreach { case (id, nGrams, nHit, f) =>
      assert(id % DedupQueries.DecontamEvery != 0, "bench doc in corpus side")
      assert(nHit >= 0 && nHit <= nGrams, s"doc $id: $nHit of $nGrams")
      assert(f >= 0.0 && f <= 1.0)
      assert(math.abs(f - nHit.toDouble / nGrams) < 1e-12)
    }
    // every doc x20 flags (>= threshold overlap with ONE bench doc) must
    // score at least that overlap against the bench UNION here
    val flagged = DedupQueries.x20Decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (id, rows) => id -> rows.map(_._2).max }
    assert(flagged.nonEmpty, "x20 fixture found no contaminated docs")
    val byId = frac.map(r => (r._1, r._3)).toMap
    flagged.foreach { case (id, maxOverlap) =>
      assert(byId(id) >= maxOverlap,
        s"doc $id: union hit count ${byId(id)} < per-bench max $maxOverlap")
    }
    // the score must actually grade: some unflagged doc has 0 < frac
    assert(frac.exists(r => !flagged.contains(r._1) && r._3 > 0),
      "no sub-threshold contamination measured — score degenerates to x20")
  }

  test("quality rules: flags recompute from the text, battery non-trivial") {
    val out = TextQueries.x66QualityRules(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    val text = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val stop = TextQueries.GopherStopwords.toSet
    out.take(200).foreach { r =>
      val (id, nWords) = (r.getLong(0), r.getLong(1))
      // split(text, ' ') keeps trailing empties in Spark SQL → limit -1
      val w = text(id).split(" ", -1)
      assert(nWords == w.length, s"doc $id word count")
      val meanLen = w.map(_.length).sum.toDouble / w.length
      assert(math.abs(r.getDouble(2) - meanLen) < 1e-9, s"doc $id mean len")
      val alphaFrac = w.count(_.exists(_.isLetter)).toDouble / w.length
      assert(math.abs(r.getDouble(4) - alphaFrac) < 1e-9, s"doc $id alpha")
      val nStop = stop.count(w.contains)
      assert(r.getLong(5) == nStop, s"doc $id stopwords")
      assert(r.getBoolean(6) == (nWords >= 50 && nWords <= 100000))
      assert(r.getBoolean(7) == (meanLen >= 3.0 && meanLen <= 10.0))
      assert(r.getBoolean(10) == (nStop >= TextQueries.GopherMinStopwords))
      assert(r.getBoolean(11) == (r.getBoolean(6) && r.getBoolean(7) &&
        r.getBoolean(8) && r.getBoolean(9) && r.getBoolean(10)))
    }
    // the battery must separate, not rubber-stamp: both outcomes occur
    assert(out.exists(_.getBoolean(11)), "no doc passes the battery")
    assert(out.exists(r => !r.getBoolean(11)), "every doc passes — vacuous")
  }

  test("dup segment chars: fraction recomputes from the raw segmentation") {
    val out = TextQueries.x67DupSegmentChars(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    val text = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.take(100).foreach { case (id, nSegs, total, dup, frac) =>
      val segs = text(id).split(" ", -1).grouped(TextQueries.LineWords)
        .map(_.mkString(" ")).toSeq
      assert(nSegs == segs.length, s"doc $id segment count")
      assert(total == segs.map(_.length).sum, s"doc $id total chars")
      // duplicate chars: every occurrence AFTER the first of a content
      val expectDup = segs.groupBy(identity).values
        .map(g => (g.size - 1) * g.head.length).sum
      assert(dup == expectDup, s"doc $id dup chars")
      assert(dup <= total)
      if (total > 0)
        assert(math.abs(frac - dup.toDouble / total) < 1e-12)
    }
    // the corpus' planted near-dups repeat content ACROSS docs, not
    // within — within-doc repetition must still occur somewhere (3-word
    // spans recur in natural-ish synthetic text) but not dominate
    assert(out.exists(_._4 > 0), "no within-doc duplicate segments found")
    assert(out.count(_._5 > 0.5) < out.length / 2, "most docs >50% dup?")
  }

  test("ppl buckets: balanced tertiles ordered by average log-prob") {
    val out = TextQueries.x68PplBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4), r.getLong(5),
        r.getString(6)))
    assert(out.nonEmpty)
    // bucket id <-> name mapping is fixed
    out.foreach { case (_, _, _, b, name) =>
      assert(Seq(1L -> "head", 2L -> "middle", 3L -> "tail")
        .toMap.apply(b) == name)
    }
    // every x53-scored doc appears exactly once
    val scored = TextQueries.x53LmScore(spark, sf).count()
    assert(out.length == scored)
    out.groupBy(_._1).foreach { case (src, rows) =>
      // ntile balance: sizes differ by at most 1
      val sizes = rows.groupBy(_._4).view.mapValues(_.size)
      assert(sizes.values.max - sizes.values.min <= 1,
        s"source $src tertiles unbalanced: $sizes")
      // CCNet ordering: every head score >= every middle >= every tail
      def avgs(b: Long) = rows.filter(_._4 == b).map(_._3)
      if (avgs(1).nonEmpty && avgs(2).nonEmpty)
        assert(avgs(1).min >= avgs(2).max, s"source $src head < middle")
      if (avgs(2).nonEmpty && avgs(3).nonEmpty)
        assert(avgs(2).min >= avgs(3).max, s"source $src middle < tail")
    }
  }
}
