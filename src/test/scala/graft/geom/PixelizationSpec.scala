package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class PixelizationSpec extends AnyFunSuite {

  private val pix = Pixelization(8)

  test("index is total and in range over the sphere") {
    for (v <- Generators.sphereXyz(2000, seed = 7)) {
      val i = pix.index(v)
      assert(i >= 0 && i < pix.totalPixels)
    }
  }

  test("index(center(i)) == i (cells own their centers)") {
    val rng = new scala.util.Random(3)
    for (_ <- 0 until 2000) {
      val i = (rng.nextDouble() * pix.totalPixels).toLong
      assert(pix.index(pix.center(i)) == i)
    }
  }

  test("envelope covers every point of a circle region (superset)") {
    for (seed <- 1 to 5) {
      val axis = Generators.sphereXyz(1, seed = seed).head
      val region = Circle(axis, math.toRadians(1.76))
      val ranges = pix.envelope(region)
      assert(ranges.nonEmpty)
      // half-open, sorted, disjoint
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi < lo2 || ranges.length == 1)
        case _ =>
      }
      val inCone = Generators.coneXyz(axis, math.toRadians(3.52), 500, seed)
      for (v <- inCone if region.contains(v)) {
        val i = pix.index(v)
        assert(ranges.exists { case (lo, hi) => i >= lo && i < hi },
          s"pixel $i of in-region point not in envelope")
      }
    }
  }

  test("envelope is selective (far smaller than the sphere)") {
    val region = Circle(Vec3(1, 0.3, -0.2).normalized, math.toRadians(1.76))
    val ranges = pix.envelope(region)
    val covered = ranges.map { case (lo, hi) => hi - lo }.sum
    // FOV area fraction ~ (1.76deg)^2 * pi / (4 pi sr) ~ 2.4e-4;
    // conservative envelope should still be < 1% of all pixels
    assert(covered < pix.totalPixels / 100, s"covered $covered")
    // and the ranges list stays small enough for predicate pushdown
    assert(ranges.length < 300, s"${ranges.length} ranges")
  }

  test("envelope of full-sphere circle covers everything") {
    val ranges = Pixelization(4).envelope(Circle(Vec3.zAxis, math.Pi))
    val covered = ranges.map { case (lo, hi) => hi - lo }.sum
    assert(covered == Pixelization(4).totalPixels)
  }

  test("points in the same small cone mostly share few ranges") {
    val axis = Vec3(0.5, 0.5, 0.7).normalized
    val region = Circle(axis, math.toRadians(0.1))
    val ranges = pix.envelope(region)
    assert(ranges.map { case (lo, hi) => hi - lo }.sum <= 64)
  }
}
