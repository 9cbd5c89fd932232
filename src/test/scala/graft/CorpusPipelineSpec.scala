package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, Tables}

/** Curation pipeline: stages compose, each monotonically shrinks the
  * corpus, and the invariants of every stage hold on its output. */
class CorpusPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("incremental ingest == batch curation on the union, restricted to new ids") {
    import spark.implicits._
    val warehouseDocs = Seq(
      (0L, "alpha beta gamma delta", "en", "s0", 22L),
      (1L, "epsilon zeta eta theta", "en", "s0", 22L),
      (2L, "iota kappa lambda mu", "en", "s1", 20L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val newDocs = Seq(
      // dup of warehouse doc 0 (punctuation variant) -> dropped
      (10L, "Alpha! Beta... GAMMA delta", "en", "s0", 26L),
      // in-batch dup pair -> lower id 11 survives
      (11L, "nu xi omicron pi", "en", "s1", 16L),
      (12L, "NU xi, omicron: pi", "en", "s1", 18L),
      // case/punctuation variant of warehouse doc 1 -> same canonical
      // fingerprint -> dropped
      (13L, "Epsilon; zeta ETA theta!!", "en", "s0", 25L),
      // genuinely fresh
      (14L, "rho sigma tau upsilon", "en", "s1", 21L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")

    val inc = CorpusPipeline.incrementalIngest(warehouseDocs, newDocs)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
    assert(inc.map(_._1).sorted.toSeq == Seq(11L, 14L), inc.toSeq)

    // gold invariant: the batch pipeline's scrub -> exact-dedup on the
    // UNION keeps exactly the warehouse ids plus the increment's ids
    val full = CorpusPipeline.splitAssign(CorpusPipeline.exactDedup(
        CorpusPipeline.piiScrub(warehouseDocs.unionByName(newDocs))))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
    val fullNew = full.filter(_._1 >= 10L)
    assert(fullNew.map(_._1).sorted.toSeq == inc.map(_._1).sorted.toSeq)
    // and split assignment is the same pure hash either way
    assert(fullNew.toMap == inc.toMap)
  }

  test("incremental near-dup: warehouse signature index catches near misses") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val warehouseDocs = Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, "completely different content about stars and galaxies far away",
        "en", "s0", 62L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val warehouseSigs =
      DedupQueries.minhashSignatures(warehouseDocs).localCheckpoint(true)
    val newDocs = Seq(
      // near-dup of warehouse doc 0: one word changed -> high signature
      // agreement, not an exact dup
      (10L, base.replace("lazy", "sleepy"), "en", "s0", 62L),
      // fresh content
      (11L, "novel text with no resemblance to anything stored before now",
        "en", "s1", 60L),
      // too short for shingles -> passes through by contract
      (12L, "tiny doc", "en", "s1", 8L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CorpusPipeline.incrementalNearDup(warehouseSigs, newDocs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(11L, 12L), kept)
  }

  test("pipeline shrinks monotonically and outputs a clean corpus") {
    val (curated, stats) = CorpusPipeline.run(spark, sf,
      lang = "en", minQuality = 0.2, samplePerSource = 50)
    assert(stats.map(_.stage) == Seq("language_filter", "quality_filter",
      "repetition_filter", "pii_scrub", "exact_dedup", "boilerplate_strip",
      "substring_dedup",
      "line_dedup", "span_excise", "near_dup_canonical", "semantic_dedup",
      "decontaminate", "stratified_sample", "split_assign",
      "shuffle_shard"))
    stats.foreach(st => assert(st.rowsOut <= st.rowsIn, st.toString))
    assert(stats.head.rowsIn == 500)
    val out = curated.localCheckpoint(true)
    val n = out.count()
    assert(n > 0, "pipeline removed everything")

    // the publish stage laid out contiguous per-shard positions
    out.select(col("shard"), col("shard_pos")).collect()
      .groupBy(_.getLong(0)).foreach { case (shard, rs) =>
        assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq,
          s"shard $shard positions not contiguous")
      }

    // no exact duplicates survive (canonical-form fingerprint unique)
    val fps = out.groupBy(
      md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))).count()
    assert(fps.where(col("count") > 1).isEmpty)

    // at most ONE member of each text near-dup cluster survives (the
    // stage keeps each cluster's minimum surviving member — a globally
    // non-canonical member may legitimately survive when the canonical
    // was dropped by an earlier stage, but never two from one cluster)
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val textClusters = DedupQueries.x16DupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    textClusters.groupBy(_._2).foreach { case (cid, members) =>
      val alive = members.map(_._1).filter(survivors)
      assert(alive.length <= 1, s"text cluster $cid kept ${alive.toSeq}")
    }

    // same for semantic (embedding) clusters — re-derived INDEPENDENTLY
    // by driver-side union-find over the pair list (not by replaying
    // the stage's starContract call)
    val semPairs = DedupQueries.x30NeardupLsh(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    semPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = semPairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(members.nonEmpty, "fixture has no semantic clusters")
    members.groupBy(find).foreach { case (root, ms) =>
      val alive = ms.filter(survivors)
      assert(alive.length <= 1, s"semantic cluster $root kept ${alive.toSeq}")
    }

    // sample bound respected per source
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 50))

    // schema preserved: curated corpus is still a documents table, plus
    // the final split + publish-layout annotations
    assert(out.columns.toSet ==
      Tables.documents(spark, sf).columns.toSet
        ++ Set("split", "shard", "shard_pos"))
    assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "validation", "test")))

    // publication: the curated corpus ships as serving artifacts, and
    // both indexes serve EXACTLY the curated set — never a doc that
    // curation dropped
    val pubDir = java.nio.file.Files.createTempDirectory("publish").toString
    val published = CorpusPipeline.publishIndexes(spark, sf, out, pubDir)
    assert(published("text_docs") == n)
    val lexical = TextIndex.search(spark, s"$pubDir/text_index",
      graft.queries.TextQueries.bm25Queries)
      .select("doc_id").collect().map(_.getLong(0))
    assert(lexical.nonEmpty)
    lexical.foreach(id => assert(survivors(id),
      s"text index served dropped doc $id"))
    val served = spark.read.parquet(s"$pubDir/vector_index/ivf_codes")
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(served.nonEmpty)
    assert(served.subsetOf(survivors),
      "vector index carries codes for docs curation dropped")
    assert(served.size == published("vectors"))
  }

  test("boilerplate strip removes exactly the flagged spans, others byte-identical") {
    val docs = Tables.documents(spark, sf)
    val out = CorpusPipeline.boilerplateStrip(docs).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("text")))).toMap
    // driver replay of x81's detection over the same segmentation
    val segs = graft.queries.TextQueries
      .segmentSpans(docs, carry = Seq("source"))
      .select(col("doc_id"), col("source"), col("seg"), col("line"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val boiler = segs.groupBy(r => (r._2, r._4))
      .filter { case (_, occ) => occ.map(_._1).distinct.length >=
        graft.queries.MiningQueries.BoilerMinDocs }
      .keySet
    val truth = segs.groupBy(_._1).flatMap { case (id, rs) =>
      val kept = rs.sortBy(_._3).filterNot(r => boiler((r._2, r._4)))
      if (kept.isEmpty) None else Some(id -> kept.map(_._4).mkString(" "))
    }
    assert(out == truth)
    // the corpus genuinely exercises both paths: some doc was rewritten
    val original = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.exists { case (id, t) => original(id) != t },
      "no doc was rewritten — stage untested at this SF")
    assert(out.exists { case (id, t) => original(id) == t },
      "every doc was rewritten — threshold suspiciously low")
  }

  test("substring dedup drops exactly the no-novel-window docs") {
    val K = graft.queries.TextQueries.SubstrWindow
    val input = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // driver replay of the max-owner rule: a doc is dropped iff every
    // one of its windows also occurs in a LARGER-id doc (internal
    // repeats alone never drop; the largest member of any mutual-cover
    // group survives)
    val maxOwner = scala.collection.mutable.HashMap.empty[String, Long]
    val winsOf = input.map { case (id, t) =>
      val w = t.split(" ")
      id -> (0 to w.length - K).map(i => w.slice(i, i + K).mkString(" "))
    }.toMap
    winsOf.foreach { case (id, ws) =>
      ws.foreach(w => maxOwner(w) = math.max(maxOwner.getOrElse(w, id), id))
    }
    val expectDrop = winsOf.collect {
      case (id, ws) if ws.nonEmpty && ws.forall(maxOwner(_) > id) => id
    }.toSet
    assert(expectDrop.nonEmpty, "fixture has no containment dups")
    val kept = CorpusPipeline.substringDedup(Tables.documents(spark, sf))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == input.map(_._1).toSet -- expectDrop)
    // the containers survive: some doc containing a dropped doc is kept
    val dropped = expectDrop.map(id => input.find(_._1 == id).get._2)
    assert(dropped.exists(t => kept.exists(k =>
      input.find(_._1 == k).get._2.contains(t))),
      "no container of a dropped doc survived")
  }

  test("substring dedup keeps a unique internally-periodic doc") {
    import spark.implicits._
    // sole copy of its content: a phrase repeated back-to-back repeats
    // every one of its own windows, but no OTHER doc has them — the
    // max-owner rule keeps it (any-repeat counting would drop it)
    val phrase = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, (phrase + " ") * 3 + phrase, "en", "srcA", 0L),
      (2L, "completely different words in this other document here now",
        "en", "srcA", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CorpusPipeline.substringDedup(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"periodic doc dropped: kept $kept")
  }

  test("substring dedup never loses a mutual-containment group entirely") {
    import spark.implicits._
    // P x 3 and P x 2 cover each other's every window (periodicity), are
    // not byte-identical, and are the corpus's only copies of P — the
    // max-owner rule keeps the larger-id member and drops the other;
    // the naive any-other-doc rule would drop BOTH and lose P forever
    val p = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, (p + " ") * 2 + p, "en", "srcA", 0L), // P x 3
      (2L, p + " " + p, "en", "srcA", 0L),       // P x 2
      (3L, "completely different words in this other document here now",
        "en", "srcA", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CorpusPipeline.substringDedup(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(3L))
    assert(kept.intersect(Set(1L, 2L)) == Set(2L),
      s"mutual group mishandled: kept $kept (want P x 2, the max id)")
  }

  test("substring dedup property: no window content is ever lost") {
    import spark.implicits._
    // randomized corpora (seeded) with planted dup shapes — identical
    // twins, containment, periodicity — must NEVER lose a window: every
    // K-window of every input doc still occurs in some kept doc (the
    // max-owner rule's induction guarantee)
    val K = graft.queries.TextQueries.SubstrWindow
    val rng = new scala.util.Random(2026)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 5).foreach { trial =>
      def words(n: Int) =
        Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val base = (0 until 10).map(i => (i.toLong, words(6 + rng.nextInt(20))))
      val planted = Seq(
        (100L, base(0)._2),                      // identical twin
        (101L, base(1)._2 + " " + base(2)._2),   // container of two docs
        (102L, { val p = words(K); (p + " ") * 2 + p }), // periodic
      )
      val all = base ++ planted
      val docs = all.map { case (id, t) => (id, t, "en", "s", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val keptWins = CorpusPipeline.substringDedup(docs)
        .select("text").collect().map(_.getString(0))
        .flatMap { t =>
          val w = t.split(" ")
          (0 to w.length - K).map(i => w.slice(i, i + K).mkString(" "))
        }.toSet
      all.foreach { case (id, t) =>
        val w = t.split(" ")
        (0 to w.length - K).foreach { i =>
          val win = w.slice(i, i + K).mkString(" ")
          assert(keptWins.contains(win),
            s"trial $trial: window of doc $id lost: '$win'")
        }
      }
    }
  }

  test("line dedup stage matches a driver-side first-occurrence replay") {
    val L = graft.queries.TextQueries.LineWords
    val input = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // independent replay: walk docs in (doc_id, seg) order, keep a span
    // only the first time its content appears anywhere in the corpus
    val seen = scala.collection.mutable.HashSet.empty[String]
    val expected = input.flatMap { case (id, text) =>
      val kept = text.split(" ").grouped(L)
        .map(_.mkString(" ")).filter(seen.add).toSeq
      if (kept.isEmpty) None else Some(id -> kept.mkString(" "))
    }.toMap
    val got = CorpusPipeline.lineDedup(Tables.documents(spark, sf))
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (text, nChars)) =>
      assert(text == expected(id), s"doc $id text diverges")
      assert(nChars == text.length.toLong, s"doc $id n_chars stale")
    }
    val totalSpans = input.map { case (_, t) =>
      (t.split(" ").length - 1) / L + 1 }.sum
    assert(seen.size < totalSpans, "fixture exercised no dedup")
  }

  test("span excise stage agrees with x61 on the raw table") {
    val docs = Tables.documents(spark, sf)
    val got = CorpusPipeline.spanExcise(docs)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val x61 = graft.queries.DedupQueries.x61SpanExcise(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // same cleaned text per doc (x61 keeps fully-excised docs as empty
    // rows; the stage drops them — the only allowed difference)
    x61.foreach { case (id, clean, _) =>
      if (clean.isEmpty) assert(!got.contains(id), s"empty doc $id kept")
      else {
        assert(got.contains(id), s"doc $id missing from stage output")
        assert(got(id)._1 == clean, s"doc $id text diverges from x61")
        assert(got(id)._2 == clean.length.toLong, s"doc $id n_chars stale")
      }
    }
    assert(got.size <= x61.length)
    // schema round-trips (the stage contract)
    assert(CorpusPipeline.spanExcise(docs).columns.toSeq == docs.columns.toSeq)
    // and it actually cut something at this SF
    val removed = x61.map(_._3).sum
    assert(removed > 0, "fixture exercised no excision")
  }
}
