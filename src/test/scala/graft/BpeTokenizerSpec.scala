package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables

/** BPE train/apply lifecycle: the distributed trainer must match an
  * independent in-memory reference on the same corpus, and tokenization
  * must match the canonical greedy apply word for word. */
class BpeTokenizerSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val NMerges = 12

  /** In-memory reference trainer — same extraction, counts and
    * (count DESC, pair lexicographic) tiebreak, written independently
    * of the Spark path. */
  private def referenceTrain(texts: Seq[String], n: Int)
      : Seq[(String, String)] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.replaceAll("[^a-z ]", " ").split(" "))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toList, ws.length.toLong)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < n && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (ps, f) =>
        ps.zip(ps.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          words = words.toSeq.map { case (ps, f) =>
            (BpeTokenizer.mergePair(ps.toArray, a, b).toList, f)
          }.groupBy(_._1).map { case (ps, g) => (ps, g.map(_._2).sum) }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private lazy val texts = Tables.documents(spark, sf)
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), r.getString(1)))

  test("distributed trainer matches the in-memory reference merge list") {
    val got = BpeTokenizer.train(spark, Tables.documents(spark, sf), NMerges)
    val want = referenceTrain(texts.map(_._2).toSeq, NMerges)
    assert(got == want, s"got $got\nwant $want")
    assert(got.length == NMerges, "fixture too small to learn 12 merges")
    // learned merges must compress: at least one is a multi-char join
    assert(got.exists { case (a, b) => (a + b).length > 2 },
      "no merge built on a previous merge — degenerate training")
  }

  test("reliable-checkpoint training matches the local path and rotates files") {
    // cluster posture (checkpoint dir set): same merges, and the Loop
    // must delete superseded merge rounds' checkpoint files — a
    // 12-merge train writes 13 word-table copies unrotated (ADVICE r13)
    val local = BpeTokenizer.train(spark, Tables.documents(spark, sf), NMerges)
    val ckptDir = java.nio.file.Files.createTempDirectory("bpeckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val reliable = BpeTokenizer.train(spark,
        Tables.documents(spark, sf), NMerges)
      assert(reliable == local)
      val rddLeft = CkptDirs.rddDirs(ckptDir)
      assert(rddLeft.size <= 1,
        s"keep=1 rotation left ${rddLeft.size} word-table checkpoints: $rddLeft")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("tokenize matches the canonical greedy apply on every doc") {
    val merges = BpeTokenizer.train(spark, Tables.documents(spark, sf),
      NMerges)
    val ranks = merges.zipWithIndex.toMap
    def applyWord(w: String): Seq[String] = {
      var pieces = w.map(_.toString).toArray
      var go = true
      while (go && pieces.length > 1) {
        val ranked = (0 until pieces.length - 1)
          .map(i => (ranks.getOrElse((pieces(i), pieces(i + 1)),
            Int.MaxValue), i))
          .minBy { case (r, i) => (r, i) }
        if (ranked._1 == Int.MaxValue) go = false
        else {
          val i = ranked._2
          pieces = BpeTokenizer.mergePair(pieces, pieces(i), pieces(i + 1))
        }
      }
      pieces.toSeq
    }
    val want = texts.flatMap { case (id, t) =>
      t.toLowerCase.replaceAll("[^a-z ]", " ").split(" ")
        .filter(_.nonEmpty).flatMap(w => applyWord(w).map(tok => (id, tok)))
    }.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val got = BpeTokenizer.tokenize(spark,
      Tables.documents(spark, sf), merges).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == want,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    // tokenization must actually compress vs characters somewhere
    val charCount = texts.map(_._2.toLowerCase
      .replaceAll("[^a-z ]", " ").count(_ != ' ')).sum
    val tokCount = got.values.sum
    assert(tokCount < charCount, "no compression — merges never applied")
  }
}
