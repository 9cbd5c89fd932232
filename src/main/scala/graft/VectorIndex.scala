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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta.json"),
      s"""{"degree":$degree,"vectors":$n}""")
  }

  private def meta(dir: String): (Int, Long) = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json"))
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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta_pq.json"),
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
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_pq.json")),
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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta_bin.json"),
      s"""{"bits":64,"vectors":$n}""")
  }

  /** Serve from the binary index: Hamming scan over the stored 8-byte
    * codes with a shortlist-bounded per-query heap (popcount of XOR —
    * the cheapest candidate generator in the family), then exact
    * cosine over only the shortlist's vectors. With `shortlist` ≥ the
    * corpus the result IS the exact brute-force top-k (the rescore
    * sees everything) — the knob walks the whole cost/recall curve. */
  def searchBinary(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, shortlist: Int = DedupQueries.RescoreShortlist,
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_bin.json")),
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
        graft.operators.BoundedTopK.perQuery(rows, shortlist,
          (r: (Long, Long, Long)) => r._1)(hamOrder)
      }.toDF("query_id", "cand_id", "hamming")
    val wHam = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("cand_id"))
    val short = hamScored.withColumn("ham_rank", row_number().over(wHam))
      .where(col("ham_rank") <= shortlist)
      .select(col("query_id"), col("cand_id"))
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

  private[graft] def nearestClusters(e: Array[Double], k: Int): Seq[Int] =
    DedupQueries.ivfCentroids
      .map { case (ci, c) => (ci, DedupQueries.dotScaled(e, c)) }
      .sortBy { case (ci, dot) => (-dot, ci) }.take(k).map(_._1).toSeq

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
    val n = spark.read.parquet(s"$dir/ivf_codes").count()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta_ivf.json"),
      s"""{"clusters":${DedupQueries.IvfClusters},"vectors":$n}""")
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
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "meta_ivf.json")),
      s"$dir/meta_ivf.json missing — not an IVF-PQ VectorIndex dir")
    val cbT: Array[Array[Array[Long]]] = {
      val flat = spark.read.parquet(s"$dir/ivf_books")
        .select(col("m"), col("k"), col("entry"))
        .as[(Int, Int, Array[Long])].collect()
      val out = Array.ofDim[Array[Long]](DedupQueries.PqSubspaces,
        DedupQueries.PqK)
      flat.foreach { case (m, kk, e) => out(m)(kk) = e }
      require(out.forall(_.forall(_ != null)),
        s"$dir/ivf_books is incomplete")
      out
    }
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
        nearestClusters(qd, probes).map(c => (c, qid, lut))
      }
    val probedLists = queryProbes.map(_._1).distinct.toSeq
    val qpB = spark.sparkContext.broadcast(queryProbes)
    val adcOrder: Ordering[(Long, Long, Long)] =
      Ordering.fromLessThan { (x, y) =>
        x._3 < y._3 || (x._3 == y._3 && x._2 < y._2)
      }
    // base codes ∪ stream-ingested codes (VectorIngest) — `list` is a
    // partition column in both, so probe pruning opens only the probed
    // lists' files either way. The streamed read carries an EXPLICIT
    // schema: a stream dir holding only _SUCCESS (zero-row first batch)
    // must serve as empty, not fail schema inference.
    val baseCodes = spark.read.parquet(s"$dir/ivf_codes")
      .select(col("list"), col("cand_id"), col("code"))
    val streamDir = java.nio.file.Paths.get(dir, "ivf_codes_stream")
    val codes = if (java.nio.file.Files.exists(streamDir))
      baseCodes.unionByName(spark.read
        .schema("ingest_batch LONG, list INT, cand_id LONG, code ARRAY<INT>")
        .parquet(streamDir.toString)
        .select(col("list"), col("cand_id"), col("code")))
    else baseCodes
    val scored = codes
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

  // -- incremental insertion (the HNSW insert path) ----------------------

  /** Insert a BOUNDED batch of new vectors into an existing flat graph
    * index without rebuilding: each new vector's out-edges are its
    * best `degree` nodes found by beam search over the CURRENT graph
    * (exactly HNSW's insert — search first, link to what you found),
    * reverse edges are offered to those neighbors, and every touched
    * adjacency list is re-truncated to the best `degree` by exact
    * cosine. Only the touched src_ids rewrite; the rest of the graph
    * table carries over untouched.
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
    import spark.implicits._
    val (degree, nVec) = meta(dir)
    // a layered index would need per-layer link maintenance and its
    // meta preserved — out of scope here; rebuild hier indexes
    require(!java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json")).contains("\"levels\""),
      s"$dir is a hierarchical index — insert supports flat graph " +
        "indexes; rebuild with buildHier instead")
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

    // 1. find each new vector's neighborhood on the CURRENT graph
    val graph = spark.read.parquet(s"$dir/graph")
      .select(col("src_id"), col("rank"), col("nbr_id"))
    val entryIds = existing.select(col("cand_id"))
      .orderBy(col("cand_id")).limit(entryCount).as[Long].collect()
    val queryVecs = newVecs.map { case (id, e, n) => (id, (e, n)) }
    val found = DedupQueries.beamSearchFrom(spark,
      graph.select(col("src_id"), col("nbr_id")), existing, queryVecs,
      queryVecs.map(_._1).flatMap(q => entryIds.map((q, _))),
      beamWidth, rounds, degree, excludeSelf = false)
      .select(col("query_id").as("src_id"), col("rank"),
        col("cand_id").as("nbr_id"))
      .localCheckpoint(true)

    // 2. append the batch to the vectors table FIRST (rescoring below
    // reads it back so reverse edges can score against new vectors)
    newVecs.toSeq.toDF("cand_id", "cand_e", "cand_n")
      .repartition(col("cand_id"))
      .write.mode(SaveMode.Append).parquet(s"$dir/vectors")
    val vecsAll = spark.read.parquet(s"$dir/vectors")

    // 3. touched neighbors: offered a reverse edge, re-truncate their
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

    // 4. rewrite: untouched ∪ rescored ∪ the new nodes' edges
    val untouched = graph.join(touchedIds, Seq("src_id"), "left_anti")
    val newGraph = untouched.union(rescored).union(found)
      .repartition(col("src_id"))
      .localCheckpoint(true) // materialize BEFORE overwriting its input
    newGraph.write.mode(SaveMode.Overwrite).parquet(s"$dir/graph")
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(newGraph)
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(found)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta.json"),
      s"""{"degree":$degree,"vectors":${nVec + newVecs.length}}""")
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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta.json"),
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
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json"))
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
