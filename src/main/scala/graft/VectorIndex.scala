package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Persisted graph-ANN index — the build-once / serve-many form of the
  * x45 construction + x47 beam-search kernels (the lifecycle FAISS's
  * `write_index`/`read_index` gives a single node, restated as warehouse
  * tables; reference analog: the APDB store's persisted obj_last
  * snapshot vs per-visit recompute).
  *
  * Layout under `dir`:
  *  - `graph/`   — (src_id, rank, nbr_id) out-edges, top-`degree` exact
  *    cosine neighbors per vector, repartitioned by src_id so a serving
  *    round's id-join touches co-located files;
  *  - `vectors/` — (cand_id, cand_e, cand_n) full-precision vectors +
  *    scaled norms for exact scoring along the walk, repartitioned by
  *    cand_id;
  *  - `meta.json` — degree + row counts, checked at serve time.
  *
  * At 100 TB both tables are id-bucketed warehouse tables; each beam
  * round's joins touch ≤ queries × beamWidth × degree rows of them, and
  * the O(n²/blocks)-work build is paid ONCE instead of per query batch
  * (x47's inline form rebuilds because the registry contract is one
  * self-contained DataFrame per key).
  */
object VectorIndex {

  /** Build the index from (vec_id, embedding) rows. One job for the
    * kNN graph (x45's block-nested kernel with per-source bounded
    * heaps), one pass to lay out the scoring vectors. */
  def build(spark: SparkSession, dir: String, emb: DataFrame,
      degree: Int = DedupQueries.GraphDegree): Unit = {
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, ed, DedupQueries.dotScaled(ed, ed))
      }
    val wG = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    DedupQueries.knnBlockScored(spark, vecs, degree)
      .withColumn("rank", row_number().over(wG))
      .where(col("rank") <= degree)
      .select(col("src_id"), col("rank"), col("nbr_id"))
      .repartition(col("src_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/graph")
    vecs.toDF("cand_id", "cand_e", "cand_n")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
    val n = spark.read.parquet(s"$dir/vectors").count()
    EstateFs.writeStringAtomic(s"$dir/meta.json",
      s"""{"degree":$degree,"vectors":$n}""")
  }

  private def meta(dir: String): (Int, Long) = {
    val txt = EstateFs.readString(s"$dir/meta.json")
    def grab(k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(txt).getOrElse(
        throw new IllegalStateException(
          s"$dir/meta.json has no \"$k\" — not a VectorIndex dir")
      ).group(1).toLong
    (grab("degree").toInt, grab("vectors"))
  }

  /** Serve a query batch from the PERSISTED index — no build stage in
    * the plan (the spec asserts the serve plan contains no scoring
    * kernel). `queries` is (query_id, embedding); entry points are the
    * `entryCount` lowest indexed ids outside the batch (deterministic,
    * x47's convention). Returns (query_id, rank, cand_id, cosine),
    * rank ≤ k by exact cosine over the visited set. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, beamWidth: Int = DedupQueries.GraphBeamWidth,
      rounds: Int = DedupQueries.GraphBeamRounds,
      entryCount: Int = DedupQueries.GraphEntryCount,
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val (_, nVec) = meta(dir)
    val graph = spark.read.parquet(s"$dir/graph")
      .select(col("src_id"), col("nbr_id"))
    val embD = spark.read.parquet(s"$dir/vectors")
    // bounded collect #1: the query batch (a serving request is small
    // by contract — the corpus-side never collects)
    val queryVecs = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, (ed, DedupQueries.dotScaled(ed, ed)))
      }
    val qIds = queryVecs.map(_._1).toSet
    // bounded collect #2: entryCount lowest indexed ids not in the batch
    val entryIds = embD.select(col("cand_id"))
      .where(!col("cand_id").isin(qIds.toSeq: _*))
      .orderBy(col("cand_id")).limit(entryCount)
      .as[Long].collect()
    require(entryIds.nonEmpty, s"index at $dir has no entry candidates " +
      s"outside the query batch ($nVec vectors)")
    DedupQueries.beamSearch(spark, graph, embD, queryVecs, entryIds,
      beamWidth, rounds, k, excludeSelf)
  }

  // -- PQ mode: persisted codes + trained books (x44's serving stack) ----

  /** Build the PQ half of the index: train codebooks on the bounded
    * `vec_id < trainN` sample (x43's FAISS-`train()` shape — one
    * bounded collect, integer Lloyd rounds at the driver), then encode
    * EVERY vector once and persist the 8-byte codes — the pay-once form
    * of what x38/x42/x44 recompute inside each query's scan. Writes
    * `pq_codes/` (cand_id, code), `pq_books/` (m, k, entry) and
    * `vectors/` (shared with the graph mode: exact-rescore payload). */
  def buildPq(spark: SparkSession, dir: String, emb: DataFrame,
      trainN: Long = DedupQueries.PqTrainN): Unit = {
    import spark.implicits._
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, ed, DedupQueries.dotScaled(ed, ed))
      }
    // column filter BEFORE the typed conversion: the predicate pushes to
    // the parquet scan, so training collects a trainN-row slice instead
    // of scanning+converting the whole corpus (x42/x44's r7 fix)
    val train = emb.where(col("vec_id") < trainN)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, ed, DedupQueries.dotScaled(ed, ed))
      }.collect().sortBy(_._1)
    require(train.nonEmpty, s"no vectors under vec_id < $trainN to train on")
    val cbT = DedupQueries.trainPqCodebooks(
      train.map(_._2.map(DedupQueries.scale1e6)))
    val cb = spark.sparkContext.broadcast(cbT)
    rows.map { case (id, e, _) =>
      (id, DedupQueries.pqEncode(e.map(DedupQueries.scale1e6), cb.value))
    }.toDF("cand_id", "code")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/pq_codes")
    cbT.zipWithIndex.flatMap { case (sub, m) =>
      sub.zipWithIndex.map { case (entry, kk) => (m, kk, entry.toSeq) }
    }.toSeq.toDF("m", "k", "entry")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/pq_books")
    rows.toDF("cand_id", "cand_e", "cand_n")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
    val n = spark.read.parquet(s"$dir/pq_codes").count()
    EstateFs.writeStringAtomic(s"$dir/meta_pq.json",
      s"""{"subspaces":${DedupQueries.PqSubspaces},"k":${DedupQueries.PqK},"trainN":$trainN,"vectors":$n}""")
  }

  /** Serve from the persisted PQ index: per-query ADC LUTs computed at
    * the driver from the PERSISTED books, a codes-column scan with a
    * shortlist-bounded per-query heap, then exact cosine over only the
    * shortlist's vectors — x42/x44's two-stage shape with the encode
    * work already paid at build time. */
  def searchPq(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, shortlist: Int = DedupQueries.RescoreShortlist,
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    require(EstateFs.exists(s"$dir/meta_pq.json"),
      s"$dir/meta_pq.json missing — not a PQ VectorIndex dir")
    val cbT: Array[Array[Array[Long]]] = {
      val flat = spark.read.parquet(s"$dir/pq_books")
        .select(col("m"), col("k"), col("entry"))
        .as[(Int, Int, Array[Long])].collect()
      val out = Array.ofDim[Array[Long]](DedupQueries.PqSubspaces,
        DedupQueries.PqK)
      flat.foreach { case (m, kk, e) => out(m)(kk) = e }
      require(out.forall(_.forall(_ != null)),
        s"$dir/pq_books is incomplete")
      out
    }
    val queryVecs = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (qid, qe) =>
        val qd = qe.map(_.toDouble)
        val se = qd.map(DedupQueries.scale1e6)
        (qid, qd, DedupQueries.normScaled(qd),
          Array.tabulate(DedupQueries.PqSubspaces, DedupQueries.PqK) {
            (m, kk) => DedupQueries.pqDist2(
              se, m * DedupQueries.PqSubDim, cbT(m)(kk))
          })
      }
    val queriesB = spark.sparkContext.broadcast(queryVecs)
    val adcOrder: Ordering[(Long, Long, Long)] =
      Ordering.fromLessThan { (x, y) =>
        x._3 < y._3 || (x._3 == y._3 && x._2 < y._2)
      }
    val adcScored = spark.read.parquet(s"$dir/pq_codes")
      .select(col("cand_id"), col("code"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = queriesB.value
        val rows = it.flatMap { case (cid, code) =>
          qs.iterator.collect {
            case (qid, _, _, lut) if !excludeSelf || qid != cid =>
            var adc = 0L; var m = 0
            while (m < DedupQueries.PqSubspaces) {
              adc += lut(m)(code(m)); m += 1
            }
            (qid, cid, adc)
          }
        }
        graft.operators.BoundedTopK.perQuery(rows, shortlist,
          (r: (Long, Long, Long)) => r._1)(adcOrder)
      }.toDF("query_id", "cand_id", "adc")
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("cand_id"))
    val short = adcScored.withColumn("adc_rank", row_number().over(wAdc))
      .where(col("adc_rank") <= shortlist)
      .select(col("query_id"), col("cand_id"))
    val rescored = short
      .join(spark.read.parquet(s"$dir/vectors"), "cand_id")
      .select(col("query_id"), col("cand_id"), col("cand_e"), col("cand_n"))
      .as[(Long, Long, Array[Double], Long)]
      .mapPartitions { it =>
        val qs = queriesB.value
          .map { case (qid, qe, qn, _) => (qid, (qe, qn)) }.toMap
        it.map { case (qid, cid, ce, cn) =>
          val (qe, qn) = qs(qid)
          (qid, cid,
            DedupQueries.dotScaled(qe, ce) / (math.sqrt(qn) * math.sqrt(cn)))
        }
      }.toDF("query_id", "cand_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    rescored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // -- binary mode: 64-bit sign codes → Hamming shortlist + rescore ------

  /** x88's sign packing: one bit per dimension, two positive 32-bit
    * words (so every stored value is plain positive BIGINT arithmetic
    * in any engine that reads the table). */
  private[graft] def signPack(e: Array[Double]): (Long, Long) = {
    require(e.length == 64,
      s"binary index packs exactly 64 sign bits but embedding has ${e.length} " +
        "dimensions — pad/truncate the column to 64 dims (or use the PQ/IVF " +
        "modes, which accept any width) before buildBinary/searchBinary")
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 32) { if (e(j) > 0) lo |= (1L << j); j += 1 }
    while (j < 64) { if (e(j) > 0) hi |= (1L << (j - 32)); j += 1 }
    (lo, hi)
  }

  /** Build the binary half of the index: pack every embedding to 8
    * BYTES of sign bits (x88's code) and persist alongside the
    * full-precision rescore payload. The cheapest index in the family
    * — no training at all, codes 4× smaller than even PQ's — for the
    * shortlist-then-rescore serving x42 established. */
  def buildBinary(spark: SparkSession, dir: String, emb: DataFrame): Unit = {
    import spark.implicits._
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, ed, DedupQueries.dotScaled(ed, ed))
      }
    rows.map { case (id, e, _) =>
      val (lo, hi) = signPack(e)
      (id, lo, hi)
    }.toDF("cand_id", "lo", "hi")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/bin_codes")
    rows.toDF("cand_id", "cand_e", "cand_n")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
    val n = spark.read.parquet(s"$dir/bin_codes").count()
    EstateFs.writeStringAtomic(s"$dir/meta_bin.json",
      s"""{"bits":64,"vectors":$n}""")
  }

  /** Serve from the binary index: Hamming scan over the stored 8-byte
    * codes with a shortlist-bounded per-query heap (popcount of XOR —
    * the cheapest candidate generator in the family), then exact
    * cosine over only the shortlist's vectors. With `shortlist` ≥ the
    * corpus the result IS the exact brute-force top-k (the rescore
    * sees everything) — the knob walks the whole cost/recall curve.
    *
    * `shortlist` is the BASE width: the served shortlist is
    * saturation-adaptive ([[DedupQueries.adaptiveHammingShortlist]],
    * VERDICT r12 #4) — candidates Hamming-indistinguishable from the
    * base cutoff (≤ hK+1) ride along, hard-capped at 2× base — so a
    * dense corpus whose 64-bit codes saturate keeps its recall
    * (RecallProbe 200 k: 0.53 fixed → ≥0.65 adaptive) without
    * retuning the knob, and a sparse one pays ≈ base as before. */
  def searchBinary(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, shortlist: Int = DedupQueries.RescoreShortlist,
      excludeSelf: Boolean = false,
      /** the adaptive hK+1 shell's hard cap, as a multiple of
        * `shortlist`. Measured at 200 k (README "ANN retrieval
        * quality"): on a saturated corpus widening the cap buys a
        * little (0.70 → 0.74 at cap 4) and then goes inert — the shell
        * is exhausted. The knob that KEEPS buying recall is `shortlist`
        * itself (base 100 → 400 → 1600 reads 0.70 → 0.92 → 0.98 at
        * sub-second serve), at exact-rescore cost linear in it. */
      capFactor: Int = 2): DataFrame = {
    import spark.implicits._
    require(EstateFs.exists(s"$dir/meta_bin.json"),
      s"$dir/meta_bin.json missing — not a binary VectorIndex dir")
    val queryVecs = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (qid, qe) =>
        val qd = qe.map(_.toDouble)
        val (lo, hi) = signPack(qd)
        (qid, qd, DedupQueries.normScaled(qd), lo, hi)
      }
    val queriesB = spark.sparkContext.broadcast(queryVecs)
    val hamOrder: Ordering[(Long, Long, Long)] =
      Ordering.fromLessThan { (x, y) =>
        x._3 < y._3 || (x._3 == y._3 && x._2 < y._2)
      }
    val hamScored = spark.read.parquet(s"$dir/bin_codes")
      .select(col("cand_id"), col("lo"), col("hi"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        val qs = queriesB.value
        val rows = it.flatMap { case (cid, clo, chi) =>
          qs.iterator.collect {
            case (qid, _, _, qlo, qhi) if !excludeSelf || qid != cid =>
              (qid, cid, (java.lang.Long.bitCount(qlo ^ clo)
                + java.lang.Long.bitCount(qhi ^ chi)).toLong)
          }
        }
        graft.operators.BoundedTopK.perQuery(rows,
          // capFactor× heap feeds the adaptive cut; guard the multiply
          // against a shortlist near Int.MaxValue ("the corpus")
          if (shortlist > Int.MaxValue / capFactor) Int.MaxValue
          else capFactor * shortlist,
          (r: (Long, Long, Long)) => r._1)(hamOrder)
      }.toDF("query_id", "cand_id", "hamming")
    val short =
      DedupQueries.adaptiveHammingShortlist(hamScored, shortlist, capFactor)
    val rescored = short
      .join(spark.read.parquet(s"$dir/vectors"), "cand_id")
      .select(col("query_id"), col("cand_id"), col("cand_e"), col("cand_n"))
      .as[(Long, Long, Array[Double], Long)]
      .mapPartitions { it =>
        val qs = queriesB.value
          .map { case (qid, qe, qn, _, _) => (qid, (qe, qn)) }.toMap
        it.map { case (qid, cid, ce, cn) =>
          val (qe, qn) = qs(qid)
          (qid, cid,
            DedupQueries.dotScaled(qe, ce) / (math.sqrt(qn) * math.sqrt(cn)))
        }
      }.toDF("query_id", "cand_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    rescored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // -- IVF-PQ mode: list-PARTITIONED codes → serve-time partition prune --

  private[graft] def nearestIn(cents: Array[(Int, Array[Double])],
      e: Array[Double], k: Int): Seq[Int] =
    cents.map { case (ci, c) => (ci, DedupQueries.dotScaled(e, c)) }
      .sortBy { case (ci, dot) => (-dot, ci) }.take(k).map(_._1).toSeq

  private[graft] def nearestClusters(e: Array[Double], k: Int): Seq[Int] =
    nearestIn(DedupQueries.ivfCentroids, e, k)

  /** The index's OWN PQ codebooks (persisted at build). Streamed
    * ingest MUST encode with these, not the global defaults: an index
    * built with trained books whose stream encodes with the seeded
    * defaults would ADC-score every streamed vector against the wrong
    * quantizer — silently garbage distances. */
  private[graft] def loadIvfBooks(spark: SparkSession,
      dir: String): Array[Array[Array[Long]]] = {
    import spark.implicits._
    val flat = spark.read.parquet(s"$dir/ivf_books")
      .select(col("m"), col("k"), col("entry"))
      .as[(Int, Int, Array[Long])].collect()
    val out = Array.ofDim[Array[Long]](DedupQueries.PqSubspaces,
      DedupQueries.PqK)
    flat.foreach { case (m, kk, e) => out(m)(kk) = e }
    require(out.forall(_.forall(_ != null)), s"$dir/ivf_books is incomplete")
    out
  }

  /** The index's OWN coarse centroids (persisted at build / re-trained
    * by [[rebalanceIvf]]); falls back to the fixed seeded set for dirs
    * written before centroids were persisted. */
  private[graft] def loadIvfCentroids(spark: SparkSession,
      dir: String): Array[(Int, Array[Double])] = {
    import spark.implicits._
    if (!EstateFs.exists(s"$dir/ivf_centroids")) DedupQueries.ivfCentroids
    else spark.read.parquet(s"$dir/ivf_centroids")
      .select(col("cluster"), col("c"))
      .as[(Int, Array[Double])].collect().sortBy(_._1)
  }

  /** Build the IVF-PQ index: every vector assigned to its nearest
    * coarse list and PQ-encoded once; the codes table is WRITTEN
    * PARTITIONED BY the list id, which is the whole point — probing p
    * of the `IvfClusters` lists at serve time becomes parquet partition
    * pruning (the scan never opens the other lists' files), the
    * warehouse-native form of FAISS's per-list storage. */
  def buildIvfPq(spark: SparkSession, dir: String, emb: DataFrame,
      books: Array[Array[Array[Long]]] = DedupQueries.pqCodebooks): Unit = {
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(books)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (nearestClusters(ed, 1).head, id,
          DedupQueries.pqEncode(ed.map(DedupQueries.scale1e6), cb.value))
      }.toDF("list", "cand_id", "code")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("list").parquet(s"$dir/ivf_codes")
    books.zipWithIndex.flatMap { case (sub, m) =>
      sub.zipWithIndex.map { case (entry, kk) => (m, kk, entry.toSeq) }
    }.toSeq.toDF("m", "k", "entry")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_books")
    // full-precision vectors ride along as the MAINTENANCE payload
    // (serving reads only codes; rebalanceIvf re-trains/re-assigns on
    // true embeddings — PQ reconstructions carry too much quantization
    // error to recover recall, measured in IvfDriftSpec's history)
    emb.select(col("vec_id").as("cand_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_vectors")
    // the index carries ITS OWN coarse layout: centroids (the seed set
    // at build; Lloyd-retrained by rebalanceIvf on drift) and the
    // trained-layout per-list mass the drift metric compares against
    writeIvfLayout(spark, dir, DedupQueries.ivfCentroids)
    val n = spark.read.parquet(s"$dir/ivf_codes").count()
    EstateFs.writeStringAtomic(s"$dir/meta_ivf.json",
      s"""{"clusters":${DedupQueries.IvfClusters},"vectors":$n}""")
  }

  /** Persist the coarse layout: the centroid table plus the CURRENT
    * per-list mass snapshot (the "trained layout" the drift metric
    * compares future ingests against). */
  private def writeIvfLayout(spark: SparkSession, dir: String,
      cents: Array[(Int, Array[Double])]): Unit = {
    import spark.implicits._
    cents.map { case (ci, c) => (ci, c.toSeq) }.toSeq
      .toDF("cluster", "c")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_centroids")
    ivfListMass(spark, dir)
      .toSeq.map { case (l, m) => (l, m) }
      .toDF("list", "mass")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_list_mass")
  }

  /** Serve from the persisted IVF-PQ index: probe lists + ADC LUTs are
    * computed at the driver from the query batch and the PERSISTED
    * books; the codes scan carries `list IN (probed)` so parquet
    * partition pruning skips every unprobed list's files (the spec
    * asserts selectedPartitions < clusters); candidates are ranked by
    * the same integer ADC as x39. */
  def searchIvfPq(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, probes: Int = DedupQueries.IvfProbes,
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    require(EstateFs.exists(s"$dir/meta_ivf.json"),
      s"$dir/meta_ivf.json missing — not an IVF-PQ VectorIndex dir")
    val cbT = loadIvfBooks(spark, dir)
    // probe against the index's PERSISTED centroids (re-trained layouts
    // keep serving without code changes)
    val cents = loadIvfCentroids(spark, dir)
    // one bounded collect: per-query probe lists + ADC LUTs
    val queryProbes = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .flatMap { case (qid, qe) =>
        val qd = qe.map(_.toDouble)
        val se = qd.map(DedupQueries.scale1e6)
        val lut = Array.tabulate(DedupQueries.PqSubspaces,
          DedupQueries.PqK) { (m, kk) =>
          DedupQueries.pqDist2(se, m * DedupQueries.PqSubDim, cbT(m)(kk))
        }
        nearestIn(cents, qd, probes).map(c => (c, qid, lut))
      }
    val probedLists = queryProbes.map(_._1).distinct.toSeq
    val qpB = spark.sparkContext.broadcast(queryProbes)
    val adcOrder: Ordering[(Long, Long, Long)] =
      Ordering.fromLessThan { (x, y) =>
        x._3 < y._3 || (x._3 == y._3 && x._2 < y._2)
      }
    val scored = allIvfCodes(spark, dir)
      // partition prune: only the probed lists' files are opened
      .where(col("list").isin(probedLists: _*))
      .as[(Int, Long, Array[Int])]
      .mapPartitions { it =>
        val qs = qpB.value
        val rows = it.flatMap { case (cluster, cid, code) =>
          qs.iterator
            .filter { case (qc, qid, _) =>
              qc == cluster && (!excludeSelf || qid != cid) }
            .map { case (_, qid, lut) =>
              var adc = 0L; var m = 0
              while (m < DedupQueries.PqSubspaces) {
                adc += lut(m)(code(m)); m += 1
              }
              (qid, cid, adc)
            }
        }
        graft.operators.BoundedTopK.perQuery(rows, k,
          (r: (Long, Long, Long)) => r._1)(adcOrder)
      }.toDF("query_id", "cand_id", "adc")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("cand_id"))
    // LOAD-BEARING dedup, not belt-and-braces: an at-least-once feed
    // may re-deliver a base vector under a different ingest batch, and
    // a duplicated (query, cand) would otherwise occupy two top-k
    // slots; rows here are already heap-bounded (partitions × queries
    // × k), so this exchange is tiny
    scored.dropDuplicates("query_id", "cand_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Base codes ∪ stream-ingested codes (VectorIngest) as
    * (list, cand_id, code) — `list` is a partition column in both, so a
    * probe filter prunes files either way. The streamed read carries an
    * EXPLICIT schema: a stream dir holding only _SUCCESS (zero-row
    * first batch) must serve as empty, not fail schema inference. */
  private def allIvfCodes(spark: SparkSession, dir: String): DataFrame = {
    val baseCodes = spark.read.parquet(s"$dir/ivf_codes")
      .select(col("list"), col("cand_id"), col("code"))
    val streamDir = s"$dir/ivf_codes_stream"
    if (EstateFs.exists(streamDir))
      baseCodes.unionByName(spark.read
        .schema("ingest_batch LONG, list INT, cand_id LONG, code ARRAY<INT>")
        .parquet(streamDir)
        .select(col("list"), col("cand_id"), col("code")))
    else baseCodes
  }

  // -- IVF maintenance under drift (VERDICT r7 #4) -----------------------

  /** Current per-list mass over base + streamed codes (every trained
    * list present, zero-filled). One count-by-partition-column job. */
  def ivfListMass(spark: SparkSession, dir: String): Map[Int, Long] = {
    import spark.implicits._
    val counted = allIvfCodes(spark, dir)
      .groupBy(col("list")).agg(count(lit(1)).as("mass"))
      .as[(Int, Long)].collect().toMap
    (0 until DedupQueries.IvfClusters)
      .map(l => l -> counted.getOrElse(l, 0L)).toMap
  }

  /** Drift of the current list-mass distribution vs the layout the
    * centroids were trained for: total-variation distance in [0, 1]
    * (0 = identical shape, 1 = disjoint). Streamed batches landing in
    * lists the trained layout considered small push this up — the
    * signal that coarse assignment no longer matches the corpus. */
  def ivfDrift(spark: SparkSession, dir: String): Double = {
    import spark.implicits._
    require(EstateFs.exists(s"$dir/ivf_list_mass"),
      s"$dir has no ivf_list_mass table (built before maintenance " +
        "support) — rebuild with buildIvfPq to enable drift tracking")
    val trained = spark.read.parquet(s"$dir/ivf_list_mass")
      .as[(Int, Long)].collect().toMap
    val current = ivfListMass(spark, dir)
    val tSum = math.max(1L, trained.values.sum).toDouble
    val cSum = math.max(1L, current.values.sum).toDouble
    (0 until DedupQueries.IvfClusters).map { l =>
      math.abs(current.getOrElse(l, 0L) / cSum -
        trained.getOrElse(l, 0L) / tSum)
    }.sum / 2.0
  }

  /** Base ∪ streamed full-precision vectors (the maintenance payload). */
  private def allIvfVectors(spark: SparkSession, dir: String): DataFrame = {
    require(EstateFs.exists(s"$dir/ivf_vectors"),
      s"$dir has no ivf_vectors table (built before maintenance support) " +
        "— rebuild with buildIvfPq to enable rebalanceIvf")
    val base = spark.read.parquet(s"$dir/ivf_vectors")
      .select(col("cand_id"), col("embedding"))
    val streamDir = s"$dir/ivf_vectors_stream"
    if (EstateFs.exists(streamDir))
      base.unionByName(spark.read
        .schema("ingest_batch LONG, cand_id LONG, embedding ARRAY<FLOAT>")
        .parquet(streamDir)
        .select(col("cand_id"), col("embedding")))
    else base
  }

  /** FAISS re-train analog (reference shape: the nightly consolidation
    * pass, `log2influx.py:197-204`): Lloyd-refine the coarse centroids
    * on a BOUNDED, per-list-stratified sample of the current corpus's
    * TRUE embeddings, then re-assign EVERY vector to its nearest new
    * centroid and rewrite the list-partitioned codes table, folding the
    * streamed deltas in. The PQ books (and therefore the codes
    * themselves) are untouched; only the coarse layout moves.
    * Re-training from PQ reconstructions instead was tried and
    * rejected: its quantization error exceeded the layout gain and
    * recall went DOWN — hence the ivf_vectors maintenance payload. At
    * warehouse scale this is the out-of-band nightly job beside the
    * ingest path: one bounded collect (the training sample), one
    * join + map re-assignment pass, one partitioned rewrite.
    *
    * Stream replay stays safe across the fold-in: a batch re-delivered
    * AFTER its rows were consolidated lands in the stream table as a
    * duplicate of a base row, which serving already deduplicates by
    * (query, cand) — the same at-least-once contract the ingest path
    * documents. */
  /** Test seam: runs after [[rebalanceIvf]] snapshots the stream batch
    * dirs and before any consolidation read — lets a spec land a
    * "mid-rebalance" ingest batch deterministically to pin the
    * only-delete-what-you-read contract. No-op in production. */
  private[graft] var postEnumerateHook: () => Unit = () => ()

  def rebalanceIvf(spark: SparkSession, dir: String,
      trainN: Long = DedupQueries.PqTrainN,
      rounds: Int = DedupQueries.KmeansRounds): Unit = {
    // single-writer lease (round 10 parity with warehouse ingest): the
    // self-heal below repairs a CRASHED rebalance, not a concurrent
    // twin — two live runs would overwrite ivf_codes with different
    // re-trained layouts. Stream ingests stay lease-free: the batch-dir
    // snapshot below is what makes them safe (spec-pinned race).
    val lease = WriterLease.acquire(spark, dir,
      "two concurrent rebalances would overwrite each other's " +
        "ivf_codes rewrite.")
    try {
      // retention GC for lease-audit debris, under this lease (the
      // vector estate's maintenance verb, mirroring TextIndex.maintain)
      WriterLease.gcAuditRecords(spark, dir): Unit
      rebalanceIvfLocked(spark, dir, trainN, rounds, lease)
    } finally WriterLease.release(spark, dir, lease)
  }

  private def rebalanceIvfLocked(spark: SparkSession, dir: String,
      trainN: Long, rounds: Int, lease: String): Unit = {
    import spark.implicits._
    // Snapshot the stream batch partition dirs NOW: only these are
    // guaranteed to be in the consolidation read below, so only these
    // may be deleted afterwards. A batch an ingest lands mid-rebalance
    // stays on disk and folds in on the NEXT run; if its rows also got
    // swept into this run's scans the duplicate is collapsed by the
    // rewrite's dropDuplicates / serving's (query, cand) dedup. The
    // previous wholesale rm raced a live ingest into silent loss.
    val consolidatedBatchDirs =
      Seq("ivf_codes_stream", "ivf_vectors_stream").flatMap { t =>
        EstateFs.listNames(s"$dir/$t")
          .filter(_.startsWith("ingest_batch="))
          .map(n => s"$dir/$t/$n")
      }
    postEnumerateHook()
    // a code without its maintenance payload would silently VANISH in
    // the inner join below and then lose its stream copy to the
    // fold-in cleanup — refuse instead (cause: a crash between a
    // batch's codes and vectors writes; the streamed batch replays and
    // repairs it, a backfill caller must re-append)
    val orphans = allIvfCodes(spark, dir)
      .join(allIvfVectors(spark, dir), Seq("cand_id"), "left_anti")
      .limit(1).count()
    require(orphans == 0,
      s"$dir has codes without ivf_vectors rows (a half-written batch?) " +
        "— replay/re-append the batch before rebalancing")
    // Self-heal the crashed-rebalance state: a kill mid ivf_codes
    // overwrite leaves vectors whose codes are gone (meta_ivf.json is
    // already dropped, so serving refuses loudly — but a rerun here
    // used to consolidate those vectors AWAY, permanent loss). Their
    // embeddings are intact in ivf_vectors and the books are persisted,
    // so re-encode the missing codes instead of dropping the rows.
    val codeless = allIvfVectors(spark, dir)
      .join(allIvfCodes(spark, dir).select(col("cand_id")),
        Seq("cand_id"), "left_anti")
    val listedBase = allIvfCodes(spark, dir)
      .join(allIvfVectors(spark, dir), Seq("cand_id"))
    val listed =
      if (codeless.isEmpty) listedBase
      else {
        val booksB = spark.sparkContext.broadcast(loadIvfBooks(spark, dir))
        val oldCentsB =
          spark.sparkContext.broadcast(loadIvfCentroids(spark, dir))
        val repaired = codeless.select(col("cand_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .map { case (cid, e) =>
            val ed = e.map(_.toDouble)
            (nearestIn(oldCentsB.value, ed, 1).head, cid,
              DedupQueries.pqEncode(
                ed.map(DedupQueries.scale1e6), booksB.value), e)
          }.toDF("list", "cand_id", "code", "embedding")
        listedBase.unionByName(repaired)
      }
    // bounded training sample, stratified per list so drifted lists are
    // represented however lopsided the current layout is
    val perList = math.max(1L,
      trainN / math.max(1, DedupQueries.IvfClusters))
    val wL = Window.partitionBy(col("list")).orderBy(col("cand_id"))
    val sample = listed
      .withColumn("rk", row_number().over(wL))
      .where(col("rk") <= perList)
      .select(col("cand_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map(_._2.map(_.toDouble))
    require(sample.nonEmpty, s"$dir has no vectors to re-train on")
    // driver-side Lloyd on the sample (x43's bounded-train shape, x59's
    // update rule): assign by max integer dot, mean-update, empty
    // clusters keep their previous centroid
    var cents = loadIvfCentroids(spark, dir)
    for (_ <- 1 to rounds) {
      val assign = sample.map(e => (nearestIn(cents, e, 1).head, e))
      cents = cents.map { case (ci, prev) =>
        val members = assign.collect { case (c, e) if c == ci => e }
        if (members.isEmpty) (ci, prev)
        else {
          val mean = new Array[Double](prev.length)
          members.foreach { e =>
            var j = 0; while (j < e.length) { mean(j) += e(j); j += 1 }
          }
          (ci, mean.map(_ / members.length))
        }
      }
    }
    val centsB = spark.sparkContext.broadcast(cents)
    // crash protocol: serving requires meta_ivf.json, so dropping it
    // FIRST and rewriting it LAST turns a kill mid-rewrite into a loud
    // "not an IVF-PQ dir" refusal instead of silently serving a
    // truncated codes table (the marker-last rule CatalogStore and
    // TextIndex.append follow). Lease ownership re-verified at the
    // boundary of the destructive phase (VERDICT r10 #2): a rebalance
    // that outlived the TTL and was broken must abort here, before it
    // tears down serving or overwrites its successor's codes rewrite.
    WriterLease.verifyHeld(spark, dir, lease)
    EstateFs.deleteIfExists(s"$dir/meta_ivf.json"): Unit
    // re-assignment of every vector under the new centroids;
    // localCheckpoint breaks lineage BEFORE the overwrite reads the
    // same paths (the consolidateNight move). dropDuplicates folds
    // at-least-once stream re-deliveries to one row while we rewrite.
    val reassigned = listed
      .dropDuplicates("cand_id")
      .select(col("cand_id"), col("code"), col("embedding"))
      .as[(Long, Array[Int], Array[Float])]
      .map { case (cid, code, e) =>
        (nearestIn(centsB.value, e.map(_.toDouble), 1).head, cid, code,
          e)
      }
      .toDF("list", "cand_id", "code", "embedding")
      .localCheckpoint(true)
    reassigned.select(col("list"), col("cand_id"), col("code"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("list").parquet(s"$dir/ivf_codes")
    reassigned.select(col("cand_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_vectors")
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(reassigned)
    // Only the batch dirs enumerated BEFORE the consolidation read are
    // folded-in for certain — delete exactly those; later-landing
    // batches stay for the next rebalance (ADVICE r8 race fix). The
    // top-level stream dir goes too once no subdirectory remains (a
    // mid-write batch shows up as a _temporary/ingest_batch= child and
    // blocks the sweep).
    consolidatedBatchDirs.foreach(EstateFs.deleteRecursive)
    Seq("ivf_codes_stream", "ivf_vectors_stream").foreach { t =>
      if (EstateFs.hasNoSubdirs(s"$dir/$t"))
        EstateFs.deleteRecursive(s"$dir/$t")
    }
    writeIvfLayout(spark, dir, cents)
    val n = spark.read.parquet(s"$dir/ivf_codes").count()
    // the serve-enabling marker is the rebalance's commit point — one
    // more ownership read before it lands. `by` is AUDIT provenance
    // (r12, the TextIndex marker-token pattern): unlike compact there
    // is no resume path that trusts this marker — a rerun rebuilds
    // everything — so the token exists for forensics (cross-check
    // against claims/LEASE.broken.* after an incident), not a fence.
    WriterLease.verifyHeld(spark, dir, lease)
    EstateFs.writeStringAtomic(s"$dir/meta_ivf.json",
      s"""{"clusters":${DedupQueries.IvfClusters},"vectors":$n,"by":"$lease"}""")
  }

  /** Default rebalance trigger for [[maintainIvf]]/[[MaintenanceTool]]:
    * total-variation drift above this re-trains the coarse layout. */
  val DefaultDriftBound = 0.2

  /** Maintenance gate: rebalance iff the drift metric exceeds `bound`.
    * Returns whether a rebalance ran — the hook a scheduled nightly
    * job calls after each ingest window. */
  def maintainIvf(spark: SparkSession, dir: String,
      bound: Double = DefaultDriftBound): Boolean = {
    val drift = ivfDrift(spark, dir)
    if (drift <= bound) false
    else { rebalanceIvf(spark, dir); true }
  }

  // -- incremental insertion (the HNSW insert path) ----------------------

  /** Insert a BOUNDED batch of new vectors into an existing graph
    * index — flat or hierarchical — without rebuilding: each new
    * vector's out-edges are its best `degree` nodes found by beam
    * search over the CURRENT graph (exactly HNSW's insert — search
    * first, link to what you found), reverse edges are offered to
    * those neighbors, and every touched adjacency list is re-truncated
    * to the best `degree` by exact cosine. Hierarchical indexes repeat
    * that linkage on every layer the id's deterministic geometric draw
    * places it on. Only the touched src_ids rewrite; the rest of each
    * graph table carries over untouched.
    *
    * Scale shape: the batch is bounded (the insert analog of the
    * serving contract — bulk growth is a rebuild, not N inserts); the
    * beam search touches queries × beam × degree rows; the re-truncate
    * rescoring joins only (touched src) × (degree + batch) candidate
    * edges against the vectors table. The graph rewrite unions
    * [untouched ∪ rescored ∪ new] — at warehouse scale with the graph
    * bucketed by src_id this is a touched-bucket overwrite, the same
    * dynamic-partition-overwrite shape the APDB snapshot merge uses. */
  def insert(spark: SparkSession, dir: String, newEmb: DataFrame,
      beamWidth: Int = DedupQueries.GraphBeamWidth,
      rounds: Int = DedupQueries.GraphBeamRounds,
      entryCount: Int = DedupQueries.GraphEntryCount): Unit = {
    // single-writer lease (r11: lease parity extended to the one online
    // mutator that was still uncovered): insert REWRITES every touched
    // graph table in place — two live inserts would interleave their
    // untouched-union-rescored overwrites and lose each other's edges.
    // Same protocol as the consolidation verbs, with the ownership
    // re-check before each destructive graph overwrite.
    val lease = WriterLease.acquire(spark, dir,
      "two concurrent graph inserts would interleave adjacency rewrites.")
    try insertLocked(spark, dir, newEmb, beamWidth, rounds, entryCount,
      lease)
    finally WriterLease.release(spark, dir, lease)
  }

  private def insertLocked(spark: SparkSession, dir: String,
      newEmb: DataFrame, beamWidth: Int, rounds: Int, entryCount: Int,
      lease: String): Unit = {
    import spark.implicits._
    val (degree, nVec) = meta(dir)
    val txt = EstateFs.readString(s"$dir/meta.json")
    // hierarchical indexes insert per layer (VERDICT r7 #6): each new
    // vector's layer membership is the DETERMINISTIC geometric draw
    // hierLevel already makes from the portable hash, so growth and
    // from-scratch builds place every id on the same layers
    val levels = """"levels":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(0)
    val maxLevel = """"maxLevel":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(0)
    val newVecs = newEmb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, ed, DedupQueries.dotScaled(ed, ed))
      }
    require(newVecs.nonEmpty, "insert batch is empty")
    val newIds = newVecs.map(_._1).toSet
    require(newIds.size == newVecs.length,
      "insert batch contains duplicate vec_ids")
    val existing = spark.read.parquet(s"$dir/vectors")
    val dup = existing.select(col("cand_id")).as[Long]
      .filter(id => newIds.contains(id)).take(1)
    require(dup.isEmpty, s"insert batch reuses existing id ${dup.headOption}")

    // layer-0 entries come from the PRE-insert corpus
    val entryIds = existing.select(col("cand_id"))
      .orderBy(col("cand_id")).limit(entryCount).as[Long].collect()

    // append the batch to the vectors table FIRST (linkage rescoring
    // reads it back so reverse edges can score against new vectors).
    // Ownership re-check at the first mutation (VERDICT r10 #2 parity).
    WriterLease.verifyHeld(spark, dir, lease)
    newVecs.toSeq.toDF("cand_id", "cand_e", "cand_n")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Append).parquet(s"$dir/vectors")
    val vecsAll = spark.read.parquet(s"$dir/vectors")

    if (levels == 0) {
      // flat: every new vector links into the one graph from the fixed
      // low-id entries (the flat serving convention)
      linkIntoGraph(spark, s"$dir/graph", vecsAll, newVecs,
        newVecs.map(_._1).flatMap(q => entryIds.map((q, _))),
        degree, beamWidth, rounds)
    } else {
      // hierarchical: descend the layers top-down exactly as serving
      // does, linking each layer's new members on the way and carrying
      // every batch vector's beam down as the seeds for the next layer
      // — HNSW's insert. Linking from fixed low-id entries instead
      // collapses recall on clustered data (grown 0.60 vs 0.96
      // from-scratch, measured building this spec): the low-id entries
      // sit in one cluster and layer-0 beam search cannot navigate out.
      // An id whose draw exceeds the built level count first joins the
      // layers that exist; once the batch is linked, the promotion pass
      // below may then EXTEND the hierarchy (VERDICT r8 #7).
      import spark.implicits._
      val queryVecs = newVecs.map { case (id, e, n) => (id, (e, n)) }
      val topIds = vecsAll.select(col("cand_id")).as[Long]
        .filter(id => hierLevel(id, maxLevel) >= levels)
        .filter(id => !newIds.contains(id))
        .collect().sorted.take(entryCount)
      require(topIds.nonEmpty,
        s"$dir top layer has no pre-existing members to enter from")
      var seeds: Array[(Long, Long)] =
        newVecs.map(_._1).flatMap(q => topIds.map(en => (q, en)))
      (levels to 1 by -1).foreach { l =>
        val sub = newVecs.filter(v => hierLevel(v._1, maxLevel) >= l)
        if (sub.nonEmpty) {
          val subIds = sub.map(_._1).toSet
          linkIntoGraph(spark, s"$dir/graph_l$l", vecsAll, sub,
            seeds.filter { case (q, _) => subIds.contains(q) },
            degree, beamWidth, rounds)
        }
        // advance ALL batch queries' seeds through this layer's
        // (post-link) graph — the serving descent, beam carried down
        val graphL = spark.read.parquet(s"$dir/graph_l$l")
          .select(col("src_id"), col("nbr_id"))
        val best = DedupQueries.beamSearchFrom(spark, graphL, vecsAll,
          queryVecs, seeds, beamWidth = beamWidth, rounds = 2,
          k = beamWidth, excludeSelf = false)
          .select(col("query_id"), col("cand_id"))
          .as[(Long, Long)].collect()
        val bySeed = best.groupBy(_._1)
        seeds = newVecs.map(_._1).flatMap { q =>
          bySeed.getOrElse(q, topIds.map((q, _))).toSeq
        }
      }
      linkIntoGraph(spark, s"$dir/graph", vecsAll, newVecs, seeds,
        degree, beamWidth, rounds)
    }
    // Level promotion (VERDICT r8 #7): if the grown corpus now holds
    // ≥ 2 members at a level above the built count, build the new top
    // layer(s) — buildHier's rule applied incrementally. Layer
    // membership is the deterministic per-id draw and upper layers are
    // exact kNN graphs over their subset, so a promoted layer is
    // IDENTICAL to the one a from-scratch build would produce; the
    // subsets are geometrically small (≤ n/4^ℓ), so this is a bounded
    // tail cost on top of the batch link.
    var newLevels = levels
    if (maxLevel > 0) {
      val vecsDs = vecsAll
        .select(col("cand_id"), col("cand_e"), col("cand_n"))
        .as[(Long, Array[Double], Long)]
      val wG = Window.partitionBy(col("src_id"))
        .orderBy(col("cosine").desc, col("nbr_id"))
      var l = levels + 1
      var continue = true
      while (continue && l <= maxLevel) {
        val subset = vecsDs.filter(t => hierLevel(t._1, maxLevel) >= l)
        if (subset.take(2).length < 2) continue = false
        else {
          DedupQueries.knnBlockScored(spark, subset, degree)
            .withColumn("rank", row_number().over(wG))
            .where(col("rank") <= degree)
            .select(col("src_id"), col("rank"), col("nbr_id"))
            .repartition(col("src_id"))
            .write.mode(SaveMode.Overwrite).parquet(s"$dir/graph_l$l")
          newLevels = l
          l += 1
        }
      }
    }
    val metaTail =
      if (maxLevel > 0) s""","levels":$newLevels,"maxLevel":$maxLevel"""
      else ""
    // commit point: the meta rewrite publishes the grown vector count
    WriterLease.verifyHeld(spark, dir, lease)
    EstateFs.writeStringAtomic(s"$dir/meta.json",
      s"""{"degree":$degree,"vectors":${nVec + newVecs.length}$metaTail}""")
  }

  /** Link a bounded batch into ONE graph table — the HNSW insert move
    * (search first, link to what you found, offer reverse edges,
    * re-truncate touched adjacencies), shared by the flat index and
    * every layer of the hierarchical one. */
  private def linkIntoGraph(spark: SparkSession, graphPath: String,
      vecsAll: DataFrame, batch: Array[(Long, Array[Double], Long)],
      seeds: Array[(Long, Long)], degree: Int, beamWidth: Int,
      rounds: Int): Unit = {
    import spark.implicits._
    // 1. find each new vector's neighborhood on the CURRENT graph
    val graph = spark.read.parquet(graphPath)
      .select(col("src_id"), col("rank"), col("nbr_id"))
    val queryVecs = batch.map { case (id, e, n) => (id, (e, n)) }
    val found = DedupQueries.beamSearchFrom(spark,
      graph.select(col("src_id"), col("nbr_id")), vecsAll, queryVecs,
      seeds, beamWidth, rounds, degree, excludeSelf = false)
      .select(col("query_id").as("src_id"), col("rank"),
        col("cand_id").as("nbr_id"))
      .localCheckpoint(true)

    // 2. touched neighbors: offered a reverse edge, re-truncate their
    // adjacency (old edges ∪ offered) to the best `degree` by exact
    // cosine — bounded: (batch × degree) sources × (degree + batch)
    val offered = found.select(col("nbr_id").as("src_id"),
      col("src_id").as("nbr_id"))
    val touchedIds = offered.select(col("src_id")).distinct()
    val candEdges = graph.join(touchedIds, "src_id")
      .select(col("src_id"), col("nbr_id"))
      .union(offered).dropDuplicates("src_id", "nbr_id")
    val scored = candEdges
      .join(vecsAll.select(col("cand_id").as("src_id"),
        col("cand_e").as("e_s"), col("cand_n").as("n_s")), "src_id")
      .join(vecsAll.select(col("cand_id").as("nbr_id"),
        col("cand_e").as("e_n"), col("cand_n").as("n_n")), "nbr_id")
      .as[(Long, Long, Array[Double], Long, Array[Double], Long)]
      // columns reorder after the joins: the second join key leads —
      // the row is (nbr_id, src_id, e_s, n_s, e_n, n_n)
      .map { case (nbr, srcId, eS, nS, eN, nN) =>
        (srcId, nbr,
          DedupQueries.dotScaled(eS, eN) / (math.sqrt(nS) * math.sqrt(nN)))
      }.toDF("src_id", "nbr_id", "cosine")
    val wG = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    val rescored = scored.withColumn("rank", row_number().over(wG))
      .where(col("rank") <= degree)
      .select(col("src_id"), col("rank"), col("nbr_id"))

    // 3. rewrite: untouched ∪ rescored ∪ the new nodes' edges
    val untouched = graph.join(touchedIds, Seq("src_id"), "left_anti")
    val newGraph = untouched.union(rescored).union(found)
      .repartition(col("src_id"))
      .localCheckpoint(true) // materialize BEFORE overwriting its input
    newGraph.write.mode(SaveMode.Overwrite).parquet(graphPath)
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(newGraph)
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(found)
  }

  // -- hierarchical (HNSW-style) mode ------------------------------------

  /** Geometric level assignment (p = 1/4) from the portable 60-bit hash
    * of the id — deterministic, engine-independent: level(v) ≥ ℓ iff
    * 4^ℓ divides hex60(md5("hnsw:" + id)). Expected layer sizes decay
    * n, n/4, n/16, … — HNSW's log-structured hierarchy without the
    * insertion-order dependence of the online construction. */
  private[graft] def hierLevel(id: Long, maxLevel: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hnsw:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    var l = 0
    var v = h
    while (l < maxLevel && v % 4 == 0) { l += 1; v /= 4 }
    l
  }

  /** Build the layered index: the base [[build]] (layer-0 graph over
    * every vector + the scoring vectors) plus one kNN graph per upper
    * layer over the level-ℓ subset, as long as a layer keeps ≥ 2
    * members. Upper layers are GEOMETRICALLY smaller, so the extra
    * build cost is a vanishing fraction of layer 0's. */
  def buildHier(spark: SparkSession, dir: String, emb: DataFrame,
      degree: Int = DedupQueries.GraphDegree, maxLevel: Int = 6): Unit = {
    import spark.implicits._
    build(spark, dir, emb, degree)
    val vecs = spark.read.parquet(s"$dir/vectors")
      .select(col("cand_id"), col("cand_e"), col("cand_n"))
      .as[(Long, Array[Double], Long)]
    val wG = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    var levels = 0
    var l = 1
    var continue = true
    while (continue && l <= maxLevel) {
      val subset = vecs.filter(t => hierLevel(t._1, maxLevel) >= l)
      if (subset.take(2).length < 2) continue = false
      else {
        DedupQueries.knnBlockScored(spark, subset, degree)
          .withColumn("rank", row_number().over(wG))
          .where(col("rank") <= degree)
          .select(col("src_id"), col("rank"), col("nbr_id"))
          .repartition(col("src_id"))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/graph_l$l")
        levels = l
        l += 1
      }
    }
    val (deg, n) = meta(dir)
    EstateFs.writeStringAtomic(s"$dir/meta.json",
      s"""{"degree":$deg,"vectors":$n,"levels":$levels,"maxLevel":$maxLevel}""")
  }

  /** Serve from the layered index: enter at the TOP layer's lowest ids,
    * greedy-descend one layer at a time (beam 1–2 over the layer's
    * graph, each query carrying its own best-so-far node down), then
    * run the full beam search on layer 0 seeded per query. The descent
    * replaces the flat form's fixed low-id entry points with entries
    * already near the query, so layer-0 rounds start in the right
    * neighborhood — the HNSW serving argument. Each per-layer step is
    * a bounded (queries × beam) collect, per the serving contract. */
  def searchHier(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, beamWidth: Int = DedupQueries.GraphBeamWidth,
      rounds: Int = DedupQueries.GraphBeamRounds,
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val txt = EstateFs.readString(s"$dir/meta.json")
    val levels = """"levels":(\d+)""".r.findFirstMatchIn(txt).getOrElse(
      throw new IllegalStateException(
        s"$dir/meta.json has no \"levels\" — build with buildHier")
    ).group(1).toInt
    val maxLevel = """"maxLevel":(\d+)""".r.findFirstMatchIn(txt)
      .get.group(1).toInt
    val embD = spark.read.parquet(s"$dir/vectors")
    val queryVecs = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        val ed = e.map(_.toDouble)
        (id, (ed, DedupQueries.dotScaled(ed, ed)))
      }
    val qIds = queryVecs.map(_._1).toSet
    // entries: the top layer's lowest ids outside the batch (bounded
    // collect over the geometrically-small top layer)
    val topIds = embD.select(col("cand_id")).as[Long]
      .filter(id => hierLevel(id, maxLevel) >= levels)
      .filter(id => !qIds.contains(id))
      .collect().sorted.take(DedupQueries.GraphEntryCount)
    require(topIds.nonEmpty,
      s"$dir top layer has no entry candidates outside the query batch")
    var seeds: Array[(Long, Long)] =
      queryVecs.map(_._1).flatMap(q => topIds.map(en => (q, en)))
    var l = levels
    while (l >= 1) {
      val graphL = spark.read.parquet(s"$dir/graph_l$l")
        .select(col("src_id"), col("nbr_id"))
      // greedy step at this layer: the best `beamWidth` nodes per query
      // survive — carrying the full beam down keeps the entry DIVERSITY
      // a single-seed descent loses (HNSW's efSearch > 1 argument)
      val best = DedupQueries.beamSearchFrom(spark, graphL, embD,
        queryVecs, seeds, beamWidth = beamWidth, rounds = 2,
        k = beamWidth, excludeSelf)
        .select(col("query_id"), col("cand_id"))
        .as[(Long, Long)].collect()
      // a query whose every seed was itself-excluded falls back to the
      // top entries rather than entering layer 0 seedless
      val bySeed = best.groupBy(_._1)
      seeds = queryVecs.map(_._1).flatMap { q =>
        bySeed.getOrElse(q, topIds.map((q, _))).toSeq
      }
      l -= 1
    }
    val graph0 = spark.read.parquet(s"$dir/graph")
      .select(col("src_id"), col("nbr_id"))
    DedupQueries.beamSearchFrom(spark, graph0, embD, queryVecs, seeds,
      beamWidth, rounds, k, excludeSelf)
  }
}
