package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, Tables}

/** The persisted graph-ANN index lifecycle: build once, serve many —
  * and the serve path must agree exactly with x47's inline form. */
class VectorIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("persisted index serves x47's exact results without a build stage") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val label0 = Tables.embeddings(spark, sf).where(col("label") === 0)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.build(spark, dir, label0)

    // x47's query convention: the GraphQueryCount lowest tenant ids
    val qIds = label0.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(DedupQueries.GraphQueryCount).as[Long].collect().toSet
    val queries = label0.where(col("vec_id").isin(qIds.toSeq: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))

    val served = VectorIndex.search(spark, dir, queries, excludeSelf = true)
    // no build stage in the serve plan: the kNN kernel's groupByKey
    // would show as MapGroups; serving is scans + joins + mapPartitions
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("MapGroups"),
      "serve plan contains the graph-build kernel — index not persisted")

    val inline = DedupQueries.x47AnnGraphSearch(spark, sf)
    val a = served.collect().map(_.toString).toSeq
    val b = inline.collect().map(_.toString).toSeq
    assert(a == b, "persisted-index serving diverged from x47's inline form")

    // serve-many: a second search is deterministic
    val again = VectorIndex.search(spark, dir, queries, excludeSelf = true)
      .collect().map(_.toString).toSeq
    assert(again == a)

    // a fresh query (not in the head batch) gets k results from the
    // persisted graph alone
    val other = label0.orderBy(col("vec_id").desc).limit(1)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val r = VectorIndex.search(spark, dir, other, k = 3)
    assert(r.count() == 3)
  }

  test("persisted PQ index serves x44's exact results from stored codes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildPq(spark, dir, emb)

    // x44's query convention: vec_id < 10 over the full table
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val served = VectorIndex.searchPq(spark, dir, queries, excludeSelf = true)
    // serving must not re-encode the corpus: the scan side reads the
    // codes column (8 bytes/vector), never the embedding array
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "PQ serve plan scans the raw embeddings table")

    val inline = DedupQueries.x44AnnPqServe(spark, sf)
    assert(served.collect().map(_.toString).toSeq ==
      inline.collect().map(_.toString).toSeq,
      "persisted-PQ serving diverged from x44's inline form")
  }

  test("persisted IVF-PQ index prunes unprobed list partitions and matches x39") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildIvfPq(spark, dir, emb)

    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val served = VectorIndex.searchIvfPq(spark, dir, queries, excludeSelf = true)

    // the list partition column must actually prune the codes scan:
    // 10 queries x 3 probes touch at most 16 (and here fewer) of the
    // list=... partitions — the scan's selected partitions must be a
    // strict subset of the clusters
    // sparkPlan, not executedPlan: AQE wraps the executed tree in an
    // AdaptiveSparkPlanExec whose query stages are leaf nodes, so a
    // collect over it never sees the scans
    val scans = served.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val codesScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("ivf_codes"))).get
    assert(codesScan.metadata("PartitionFilters").contains("list"),
      "codes scan carries no list partition filter")
    val selected = codesScan.selectedPartitions.partitionCount
    assert(selected < DedupQueries.IvfClusters,
      s"scan opened $selected of ${DedupQueries.IvfClusters} lists — no pruning")

    val inline = DedupQueries.x39AnnIvfPq(spark, sf)
    assert(served.collect().map(_.toString).toSeq ==
      inline.collect().map(_.toString).toSeq,
      "persisted IVF-PQ serving diverged from x39's inline form")
  }

  test("VectorIndexTool round-trips build + search through parquet on disk") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vtool").toString
    val embSrc = "/root/testdata/sf0.001/embeddings.parquet"
    // a 3-query batch written the way an operator would hand it over
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .write.parquet(s"$root/queries.parquet")
    VectorIndexTool.run(spark, Array("build", "pq", s"$root/idx", embSrc))
    VectorIndexTool.run(spark, Array("search", "pq", s"$root/idx",
      s"$root/queries.parquet", s"$root/out.parquet", "4"))
    val out = spark.read.parquet(s"$root/out.parquet")
    assert(out.count() == 3 * 4)
    assert(out.columns.sorted.toSeq ==
      Seq("cand_id", "cosine", "query_id", "rank"))
    // ranks are 1..k per query and scores weakly decrease with rank
    val rows = out.orderBy(col("query_id"), col("rank"))
      .collect().groupBy(_.getLong(out.columns.indexOf("query_id")))
    rows.values.foreach { g =>
      val byRank = g.sortBy(_.getInt(out.columns.indexOf("rank")))
      assert(byRank.map(_.getInt(out.columns.indexOf("rank"))).toSeq ==
        (1 to 4))
      val scores = byRank.map(_.getDouble(out.columns.indexOf("cosine")))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    intercept[IllegalArgumentException] {
      VectorIndexTool.run(spark, Array("build", "hnsw", s"$root/idx", embSrc))
    }
  }

  test("serve default keeps coincidental id collisions (fresh-id batches)") {
    // a fresh query batch numbered 0..n-1 can collide with corpus ids;
    // by default NO candidate is dropped for sharing the query's id, so
    // a query that happens to equal corpus vector 0 still finds it
    // (cosine 1.0 at rank 1). excludeSelf=true is the opt-in for
    // batches whose ids ARE corpus ids (the registry convention above).
    val d001 = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("collidx").toString
    val emb = Tables.embeddings(spark, d001)
      .select(col("vec_id"), col("embedding"))
    VectorIndex.buildPq(spark, dir, emb)
    val q = emb.where(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = VectorIndex.searchPq(spark, dir, q, k = 1).collect().head
    assert(top.getLong(top.fieldIndex("cand_id")) == 0L)
    assert(top.getDouble(top.fieldIndex("cosine")) == 1.0)
    // the corpus-convention opt-in excludes it again
    val top2 = VectorIndex.searchPq(spark, dir, q, k = 1,
      excludeSelf = true).collect().head
    assert(top2.getLong(top2.fieldIndex("cand_id")) != 0L)
  }

  test("meta guards: a non-index dir fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("notidx").toString
    import spark.implicits._
    val q = Seq((0L, Array(1.0f))).toDF("query_id", "embedding")
    intercept[Exception] { VectorIndex.search(spark, dir, q) }
  }
}
