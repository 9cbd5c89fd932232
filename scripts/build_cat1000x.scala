import org.apache.spark.sql.functions._
import graft.apdb._
import graft.geom._
spark.sparkContext.setLogLevel("WARN")
val cfg = ApdbConfig(warehouseDir = "/unused")
val pointings = (0 until 3).map(i => Generators.sphereXyz(1, hemi = -1, seed = 5000L + i).head)
val padRad = math.toRadians(cfg.regionPaddingArcsec / 3600.0)
val buckets = pointings.flatMap { p =>
  val region = Circle(p, cfg.fovRad / 2).padded(padRad)
  SparkGeo.coarsen(cfg.skyPix.envelope(region), cfg.maxEnvelopeRanges)
    .flatMap { case (lo, hi) => (lo >> cfg.pixBucketShift) to ((hi - 1) >> cfg.pixBucketShift) }
}.distinct.sorted
println(s"@@touched buckets: ${buckets.mkString(",")}")
val t0 = System.nanoTime()
{
  val cat = DiaSim.genCatalog(spark, 4300000000L, hemi = -1, seed = 42, slices = 512)
  val kept = cat.withColumn("pixelId", SparkGeo.pixelIndexSky(cfg.skyPix, col("x"), col("y"), col("z"))).withColumn("pix_bucket", shiftright(col("pixelId"), cfg.pixBucketShift)).where(col("pix_bucket").isin(buckets: _*)).select("sourceIdx", "x", "y", "z")
  kept.write.mode("overwrite").parquet("/tmp/cat1000x_fov.parquet")
}
println(s"@@rows kept: ${spark.read.parquet("/tmp/cat1000x_fov.parquet").count()} in ${(System.nanoTime()-t0)/1e9} s")
sys.exit(0)
