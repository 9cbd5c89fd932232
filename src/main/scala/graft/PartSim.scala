package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.geom._

/** `part_sim` analog (`/root/reference/bin.src/part_sim.py`): Monte-Carlo
  * comparison of sky partitioning schemes (HTM / Q3C / MQ3C quad-cube)
  * by how a camera's tile mosaic maps onto pixels.
  *
  * Spark-first restatement: visits are a distributed Dataset (each visit
  * is an independent MC draw — the reference's serial loop becomes a
  * `flatMap` over `spark.range(nVisits)`), per-tile envelope math runs
  * in the executors, and the three reference outputs (pixels_per_tile,
  * area_per_tile deg², tiles_per_pixel) plus the scheme-differentiating
  * ranges_per_tile are Spark aggregations.
  *
  * Usage: runMain graft.PartSim [mode] [level] [nVisits]
  *   mode: htm | q3c | mq3c | all (default all — compare the schemes)
  */
object PartSim {

  final case class TileStats(visit: Long, tileId: Int, nPixels: Long,
      nRanges: Int, areaDeg2: Double)

  /** Per-visit MC draw → per-tile stats + per-pixel overlap counts.
    * Deterministic per (seed, visit). */
  def visitStats(pix: SkyPixelization, visit: Long, fovRad: Double,
      divide: Int, withArea: Boolean):
      (Seq[TileStats], Seq[Int]) = {
    val pointing = Generators.sphereXyz(1, hemi = -1,
      seed = 9000L + visit).head
    val rng = new scala.util.Random(7000L + visit)
    val rotAng = rng.nextDouble() * 2 * math.Pi
    val tiles = Tiles.squareTiles(pointing, fovRad, divide,
      excludeDisjoint = false, rotRad = rotAng)
    val pixelTiles = scala.collection.mutable.HashMap.empty[Long, Int]
    val stats = tiles.map { t =>
      val ranges = pix.envelope(t.polygon)
      var nPix = 0L
      var area = 0.0
      ranges.foreach { case (lo, hi) =>
        nPix += hi - lo
        var id = lo
        while (id < hi) {
          pixelTiles.update(id, pixelTiles.getOrElse(id, 0) + 1)
          if (withArea) area += pix.polygon(id).area
          id += 1
        }
      }
      TileStats(visit, t.id, nPix, ranges.length,
        area * math.pow(180.0 / math.Pi, 2))
    }
    (stats, pixelTiles.values.toSeq)
  }

  /** One scheme's MC summary as a JSON fragment. */
  def run(spark: SparkSession, mode: String, level: Int, nVisits: Int,
      fovRad: Double = math.toRadians(3.5), divide: Int = 15): String = {
    import spark.implicits._
    val withArea = level <= 9 // area walk is per-pixel; cap the cost
    val results = spark.range(nVisits)
      .repartition(math.min(nVisits, 64))
      .mapPartitions { it =>
        // one pixelator per partition (stateless but not free to build)
        val pix = SkyPixelization(mode, level)
        it.flatMap { v =>
          val (stats, overlaps) = visitStats(pix, v, fovRad, divide, withArea)
          stats.map(s => (s.visit, s.nPixels, s.nRanges, s.areaDeg2, -1)) ++
            overlaps.map(c => (v.toLong, -1L, -1, 0.0, c))
        }
      }
      .toDF("visit", "n_pixels", "n_ranges", "area_deg2", "overlap")
      .localCheckpoint(true)
    val tiles = results.where(col("overlap") === -1)
    val pixels = results.where(col("overlap") =!= -1)
    val t = tiles.agg(
      avg(col("n_pixels")).as("pixels_per_tile"),
      avg(col("n_ranges")).as("ranges_per_tile"),
      avg(col("area_deg2")).as("area_per_tile"),
      count(lit(1)).as("n_tiles")).head()
    val p = pixels.agg(avg(col("overlap")).as("tiles_per_pixel")).head()
    f"""{"mode":"$mode","level":$level,"visits":$nVisits,""" +
      f""""pixels_per_tile":${t.getDouble(0)}%.2f,""" +
      f""""ranges_per_tile":${t.getDouble(1)}%.2f,""" +
      f""""area_per_tile_deg2":${t.getDouble(2)}%.6f,""" +
      f""""tiles_per_pixel":${p.getDouble(0)}%.2f}"""
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "all"
    val level = if (args.length > 1) args(1).toInt else 8
    val nVisits = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val modes = if (mode == "all") Seq("htm", "q3c", "mq3c") else Seq(mode)
    modes.foreach(m => println(run(spark, m, level, nVisits)))
    spark.stop()
  }
}
