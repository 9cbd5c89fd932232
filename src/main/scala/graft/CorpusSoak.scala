package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Tables, TextQueries}

/** Corpus-curation soak: replicate the documents table N× (doc_id
  * offset per copy — every copy is a byte-identical twin of the
  * original, deliberately stressing the dedup family with a corpus
  * that is ~(N-1)/N duplicates) and time the content-hashing stages
  * plus the full pipeline. The curation analog of the ApSim visit
  * soaks: evidence that the per-stage shuffles stay key-bounded as the
  * corpus grows, not a correctness gate (the oracle keys are that).
  *
  * Usage: runMain graft.CorpusSoak <sfDir> [factor]
  * Prints one JSON line per timed phase.
  */
object CorpusSoak {

  def replicate(spark: SparkSession, d: String, factor: Int): DataFrame = {
    val base = Tables.documents(spark, d)
    val maxId = base.agg(max(col("doc_id"))).head
    require(!maxId.isNullAt(0), s"documents table at $d is empty")
    val n = maxId.getLong(0) + 1
    (0 until factor).map { k =>
      base.withColumn("doc_id", col("doc_id") + lit(k * n))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CorpusSoak <sfDir> [factor]")
    val sfDir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 10
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = MasterConf(SparkSession.builder(),
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = replicate(spark, sfDir, factor).localCheckpoint(true)
    val nDocs = corpus.count()
    println(s"""{"phase":"replicate","docs":$nDocs,"factor":$factor}""")

    def report(phase: String, rows: Long, t0: Long): Unit =
      println(f"""{"phase":"$phase","rows":$rows,"sec":${
        (System.nanoTime() - t0) / 1e9}%.2f}""")
    def timed(phase: String)(body: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = body.localCheckpoint(true)
      report(phase, out.count(), t0)
      out
    }
    // the content-hashing stages CHAINED in pipeline order — substring
    // dedup is only content-safe after identical twins collapse (its
    // doc contract), and each stage sees the previous stage's output
    // exactly as CorpusPipeline.run would feed it
    val afterExact = timed("exact_dedup")(CorpusPipeline.exactDedup(corpus))
    val afterSub = timed("substring_dedup")(
      CorpusPipeline.substringDedup(afterExact))
    val afterLine = timed("line_dedup")(CorpusPipeline.lineDedup(afterSub))
    // span excision sees the post-line-dedup corpus exactly as
    // CorpusPipeline.run feeds it; by here the replica twins are gone
    // (exact dedup), so the gram df-cap is measuring REAL sharing, not
    // replication artifacts
    timed("span_excise")(CorpusPipeline.spanExcise(afterLine))
    // sliding-window scoring over the FULL Nx corpus (the
    // n_tokens-per-doc row blowup is the stress here)
    val t0 = System.nanoTime()
    val repeated = TextQueries.slidingWindows(corpus)
      .groupBy("win_h").count().where(col("count") > 1).count()
    report("repeated_substrings", repeated, t0)
    // bounded-memory sketch pass over the full N× term stream: state per
    // task is one capacity-bounded summary however large the corpus —
    // the constant-memory contract the SpaceSaving aggregate makes
    val t1 = System.nanoTime()
    val topTerms = corpus
      .select(explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .agg(graft.plans.SketchFunctions.spaceSavingTopK(col("term"), 4096)
        .as("top"))
      .select(explode(col("top")))
      .count()
    report("sketch_topk_terms", topTerms, t1)

    // -- x22 star contraction under a scale-stress graph: one star edge
    // per replica twin (|replicas| edges — the linear encoding of the
    // twin cliques), the base corpus's real near-dup pairs, and a
    // deliberately chain-shaped 10k-node component (the diameter shape
    // that degenerates min-label propagation to 10k rounds). Pinned:
    // rounds ≤ 2·log₂(n) + 4 — far inside the paper's O(log² n) bound.
    val t2 = System.nanoTime()
    val base = Tables.documents(spark, sfDir)
    val nBase = base.agg(max(col("doc_id"))).head.getLong(0) + 1
    val twinEdges = corpus.where(col("doc_id") >= nBase)
      .select(col("doc_id").as("u"), pmod(col("doc_id"), lit(nBase)).as("v"))
    val nearDupEdges = graft.queries.DedupQueries.x7Pairs(spark, sfDir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val chainBase = factor * nBase + 1000000L
    val chainEdges = spark.range(10000 - 1)
      .select((col("id") + chainBase).as("u"), (col("id") + chainBase + 1).as("v"))
    val edges = twinEdges.unionByName(nearDupEdges).unionByName(chainEdges)
    val (labels, rounds) = graft.operators.ConnectedComponents
      .starContractWithRounds(spark, edges)
    val nComponents = labels.select("root").distinct().count()
    val nNodes = labels.count()
    val bound = 2 * (63 - java.lang.Long.numberOfLeadingZeros(nNodes)) + 4
    println(f"""{"phase":"star_contraction","nodes":$nNodes,"components":$nComponents,"rounds":$rounds,"round_bound":$bound,"sec":${(System.nanoTime() - t2) / 1e9}%.2f}""")
    require(rounds <= bound,
      s"star contraction took $rounds rounds on $nNodes nodes (bound $bound)")

    // -- semantic dedup (x48's decision) at scale, composed the way a
    // production pipeline runs it: exact twins collapse via a CONTENT
    // HASH first (x1's shape — brute-force pair scoring over replicas
    // would be quadratic in the replication factor for pairs that a
    // hash finds for free), the sublinear LSH pair scan (x30) runs on
    // the distinct vectors only, twin membership rides as star edges,
    // and the keep-one decision labels EVERY replica. Pinned: the
    // decision restricted to base ids is byte-identical to the
    // unreplicated run's (replication-invariance, the same contract the
    // doc-dedup phases above pin), and every replica maps to its base
    // representative.
    val t3 = System.nanoTime()
    val baseEmb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nBaseVec = baseEmb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val vecs = (0 until factor).map { k =>
      baseEmb.select((col("vec_id") + lit(k * nBaseVec)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val nVecs = vecs.count()
    // 1. content-hash collapse: min id per identical embedding
    val crep = vecs.withColumn("h", xxhash64(col("embedding")))
      .groupBy(col("h")).agg(min(col("vec_id")).as("crep"))
    require(crep.count() == nBaseVec,
      "content-hash collapse must find exactly the base vectors")
    val withRep = vecs.withColumn("h", xxhash64(col("embedding")))
      .join(crep, "h")
    val twinStars = withRep.where(col("vec_id") =!= col("crep"))
      .select(col("vec_id").as("vec_a"), col("crep").as("vec_b"))
    val distinctVecs = withRep.where(col("vec_id") === col("crep"))
      .select(col("vec_id"), col("embedding"))
    // 2. cell-bounded pair scan on distinct vectors only (x108's
    // production kernel, r11: k derived from THIS corpus's vector
    // count by the k≈√n rule instead of the registry's fixed oracle k)
    val cellK = graft.queries.DedupQueries.semDedupCellCount(nBaseVec)
    println(s"""{"phase":"semantic_dedup_cells","distinct_vectors":$nBaseVec,"derived_k":$cellK}""")
    val cellPairs = graft.queries.DedupQueries
      .cellPairScan(spark, distinctVecs, cellK)
      .select(col("vec_a"), col("vec_b"))
    // 3. the x48 decision over every replica
    val decision = graft.queries.DedupQueries.semanticDedupDecision(
      spark, vecs.select(col("vec_id")),
      twinStars.unionByName(cellPairs)).localCheckpoint(true)
    val nKept = decision.where(col("kept")).count()
    println(f"""{"phase":"semantic_dedup","vectors":$nVecs,"kept":$nKept,"sec":${(System.nanoTime() - t3) / 1e9}%.2f}""")
    require(decision.count() == nVecs, "every replica gets a decision")
    // replication-invariance: base-id decisions == the factor-1 run
    // (same kernel, same derived k — the base set IS the distinct set)
    val baseDecision = graft.queries.DedupQueries.semanticDedupDecision(
      spark, baseEmb.select(col("vec_id")),
      graft.queries.DedupQueries.cellPairScan(spark, baseEmb, cellK)
        .select(col("vec_a"), col("vec_b")))
    val baseProj = decision.where(col("vec_id") < nBaseVec)
    require(baseProj.exceptAll(baseDecision).isEmpty &&
      baseDecision.exceptAll(baseProj).isEmpty,
      "semantic dedup decisions on base ids changed under replication")
    // every replica points at a BASE representative (min id = base copy)
    require(decision.where(col("rep_id") >= nBaseVec).isEmpty,
      "a replica was chosen as representative over its base copy")
    // both checkpoints are dead once the requires pass — release them
    // before the 12-stage pipeline phase rather than stranding
    // factor-sized block sets through it (the round-5 eviction-storm
    // lesson this repo keeps re-learning)
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(vecs)
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(decision)

    // -- the FULL 12-stage curation pipeline over the N× corpus, timed
    // per stage (the broadcast side-inputs — language profiles, bench
    // grams, query vectors — intentionally come from the base table:
    // replication stresses the corpus-side shuffles, which is the
    // scaling question)
    var cur = corpus
    CorpusPipeline.stages(spark, sfDir).foreach { case (name, fn) =>
      cur = timed(s"pipeline_$name")(fn(cur))
    }

    // -- publication (round 8): the curated survivors become serving
    // artifacts — BM25 postings + IVF-PQ codes — in the same job.
    // Cost scales with SURVIVORS (post-dedup the replicas are gone),
    // not with the N× input: the phase's scale claim.
    val t4 = System.nanoTime()
    val pubDir = java.nio.file.Files
      .createTempDirectory("soak_publish").toString
    // replicas carry offset doc_ids with no embedding rows; publish the
    // base-id survivors (the real corpus identity after dedup)
    val publishable = cur.where(col("doc_id") < nBase)
    val published = CorpusPipeline.publishIndexes(
      spark, sfDir, publishable, pubDir)
    println(f"""{"phase":"publish_indexes","text_docs":${
      published("text_docs")},"vectors":${published("vectors")},"sec":${
      (System.nanoTime() - t4) / 1e9}%.2f}""")
    spark.stop()
  }
}
