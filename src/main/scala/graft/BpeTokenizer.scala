package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer LIFECYCLE — train a merge table on a corpus, then
  * tokenize with it (the Sennrich et al. 2016 algorithm x49 exposes one
  * inner step of, composed into the full train/apply pair an LLM data
  * pipeline actually runs before packing sequences).
  *
  * Training never collects the corpus: the corpus collapses ONCE to a
  * distributed word-frequency table (x49's pre-aggregation — the pair
  * explosion then runs over DISTINCT words), and each merge round is
  * one bounded job: frequency-weighted adjacent-pair counts over the
  * current piece sequences, a single top-1 row collected (count DESC,
  * then lexicographic — the deterministic tiebreak), and a broadcast
  * rewrite of the piece arrays. Per-round shuffle is
  * |distinct symbol pairs| cells, map-side combined; the word table is
  * localCheckpointed once and iterated in place.
  *
  * Tokenization is the canonical greedy apply: lowest-rank pair present
  * merges first (all its occurrences, left to right), repeated until no
  * ranked pair remains — a broadcast rank map and one distributed pass.
  */
object BpeTokenizer {

  /** Word frequency table with x49's exact word extraction. */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(
        regexp_replace(lower(col("text")), "[^a-z ]", " "), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Merge one ranked pair inside a piece sequence, left to right —
    * shared verbatim by the trainer's rewrite and the greedy apply. */
  private[graft] def mergePair(pieces: Array[String], a: String,
      b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < pieces.length) {
      if (i + 1 < pieces.length && pieces(i) == a && pieces(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += pieces(i); i += 1 }
    }
    out.toArray
  }

  /** Train `nMerges` merges; returns them in rank order. Stops early
    * when the best remaining pair occurs only once (no compression
    * left to learn). */
  def train(spark: SparkSession, docs: DataFrame, nMerges: Int)
      : Seq[(String, String)] = {
    import spark.implicits._
    // strategy latched + superseded rounds freed by the Loop (keep=1:
    // each merge strictly supersedes the previous word table). On the
    // local path this is the round-5 soak-spike release; on the
    // reliable path it deletes the previous merge's checkpoint FILES —
    // one full word-table copy per merge otherwise (ADVICE r13).
    val loop = new operators.Checkpoints.Loop(spark, keep = 1)
    var words = loop.stable(wordFreq(docs).as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toArray, f) })
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val top = words.flatMap { case (pieces, f) =>
        (0 until pieces.length - 1)
          .map(i => (pieces(i), pieces(i + 1), f))
      }.toDF("a", "b", "f")
        .groupBy(col("a"), col("b")).agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1) // TakeOrderedAndProject — one row crosses to the driver
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        // loop.stable materializes the new round FIRST, then frees the
        // superseded one (blocks or files per the latched strategy)
        words = loop.stable(words
          .map { case (pieces, f) => (mergePair(pieces, a, b), f) })
      }
    }
    merges.toSeq
  }

  /** Tokenize: (doc_id, token, n) — per doc, its BPE token sequence
    * collapsed to token counts (the shape the packing/vocab stages
    * consume). Greedy canonical apply under a broadcast rank map. */
  def tokenize(spark: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, r) => (p, r) }.toMap)
    docs.select(col("doc_id"), explode(split(
        regexp_replace(lower(col("text")), "[^a-z ]", " "), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .as[(Long, String)]
      .flatMap { case (id, w) =>
        var pieces = w.map(_.toString).toArray
        var go = true
        while (go && pieces.length > 1) {
          var bestRank = Int.MaxValue
          var bi = -1
          var i = 0
          while (i < pieces.length - 1) {
            val r = ranks.value.getOrElse((pieces(i), pieces(i + 1)),
              Int.MaxValue)
            if (r < bestRank) { bestRank = r; bi = i }
            i += 1
          }
          if (bi < 0) go = false
          else pieces = mergePair(pieces, pieces(bi), pieces(bi + 1))
        }
        pieces.map(p => (id, p))
      }
      .toDF("doc_id", "token")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("doc_id"), col("token"))
  }
}
