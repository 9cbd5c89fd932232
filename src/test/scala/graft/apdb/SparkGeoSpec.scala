package graft.apdb

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** Column-math geometry must agree exactly with the Scala kernel. */
class SparkGeoSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pointsDf(n: Int, seed: Long) = {
    import spark.implicits._
    Generators.sphereXyz(n, seed = seed).zipWithIndex
      .map { case (v, i) => (i.toLong, v.x, v.y, v.z) }
      .toDF("id", "x", "y", "z")
  }

  test("pixelIndex column matches Pixelization.index") {
    val pix = Pixelization(8)
    val pts = Generators.sphereXyz(3000, seed = 11)
    import spark.implicits._
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v.x, v.y, v.z) }
      .toDF("id", "x", "y", "z")
      .withColumn("pid", SparkGeo.pixelIndex(pix, col("x"), col("y"), col("z")))
    val got = df.select("id", "pid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pts.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == pix.index(v), s"mismatch at $v")
    }
  }

  test("containsXyz matches Region.contains for circle and polygon") {
    val circle = Circle(Vec3(0.3, -0.5, 0.8).normalized, math.toRadians(30))
    val poly = Tiles.squareTiles(Vec3(0.3, -0.5, 0.8).normalized,
      math.toRadians(40), 2).head.polygon
    val pts = Generators.sphereXyz(2000, seed = 12)
    for (region <- Seq[Region](circle, poly)) {
      val pred = SparkGeo.containsXyz(region, col("x"), col("y"), col("z"))
      val got = pointsDf(2000, 12).withColumn("in", pred)
        .select("id", "in").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      pts.zipWithIndex.foreach { case (v, i) =>
        assert(got(i.toLong) == region.contains(v), s"$region at $v")
      }
    }
  }

  test("raDec column matches Vec3.toRaDec") {
    val pts = Generators.sphereXyz(500, seed = 13)
    import spark.implicits._
    val (raC, decC) = SparkGeo.raDec(col("x"), col("y"), col("z"))
    val got = pts.zipWithIndex.map { case (v, i) => (i.toLong, v.x, v.y, v.z) }
      .toDF("id", "x", "y", "z")
      .select(col("id"), raC.as("ra"), decC.as("dec")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    pts.zipWithIndex.foreach { case (v, i) =>
      val (ra, dec) = v.toRaDec
      val (gra, gdec) = got(i.toLong)
      assert(math.abs(gra - ra) < 1e-9 && math.abs(gdec - dec) < 1e-9)
    }
  }

  test("coarsen caps range count and preserves coverage") {
    val pix = Pixelization(8)
    val region = Circle(Vec3(1, 0.2, 0.1).normalized, math.toRadians(5))
    val ranges = pix.envelope(region)
    val coarse = SparkGeo.coarsen(ranges, 16)
    assert(coarse.length <= 16)
    // every original range is covered by some coarse range
    ranges.foreach { case (lo, hi) =>
      assert(coarse.exists { case (clo, chi) => clo <= lo && hi <= chi })
    }
    // coarse ranges stay sorted and disjoint
    coarse.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2)
      case _ =>
    }
  }
}
