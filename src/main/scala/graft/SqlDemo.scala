package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.apdb._
import graft.geom._
import graft.plans._

/** SQL-surface demo: GraftExtensions give plain SQL users the native
  * spatial functions, and the optimizer rule turns a region filter into
  * pushed-down pixelId ranges automatically.
  *
  * Usage: runMain graft.SqlDemo
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("sqldemo").toString
    val cat = DiaSim.genCatalog(spark, 100000L, hemi = 0, seed = 3)
    val (raC, decC) = SparkGeo.raDec(col("x"), col("y"), col("z"))
    cat.withColumn("ra", raC).withColumn("dec", decC)
      .withColumn("pixelId",
        SparkGeo.pixelIndex(Pixelization(8), col("x"), col("y"), col("z")))
      .select("sourceIdx", "ra", "dec", "pixelId")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("objs")

    val region = Circle(Vec3(0.2, 0.5, 0.84).normalized, math.toRadians(3))
    val lit = RegionCodec.encode(region)
    val df = spark.sql(
      s"SELECT count(*) AS n FROM objs WHERE region_contains('$lit', ra, dec)")
    println("rows in region: " + df.head.getLong(0))
    val pushed = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString.take(180)
    println("scan: " + pushed)
    // decimal literals coerce automatically (builder wraps args in casts)
    println("sql pixel_index(10,-45) = " +
      spark.sql("SELECT pixel_index(10.0, -45.0)").head.getLong(0) +
      ", kernel = " + Pixelization(8).index(10.0, -45.0))
    spark.stop()
  }
}
