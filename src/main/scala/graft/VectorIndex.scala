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
      entryCount: Int = DedupQueries.GraphEntryCount): DataFrame = {
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
      beamWidth, rounds, k)
  }
}
