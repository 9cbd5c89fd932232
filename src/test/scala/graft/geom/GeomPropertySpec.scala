package graft.geom

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven property tests (SURVEY §5.3) — invariants hold over
  * arbitrary inputs, not just seeded samples. Runs under sbt's native
  * ScalaCheck framework. */
object GeomPropertySpec extends Properties("geom") {

  private val genUnitVec: Gen[Vec3] = for {
    x <- Gen.choose(-1.0, 1.0)
    y <- Gen.choose(-1.0, 1.0)
    z <- Gen.choose(-1.0, 1.0)
    if math.sqrt(x * x + y * y + z * z) > 1e-3
  } yield Vec3(x, y, z).normalized

  implicit val arbVec: Arbitrary[Vec3] = Arbitrary(genUnitVec)

  property("rotateInto(a, b) always maps a to b") = forAll {
    (a: Vec3, b: Vec3) => Mat3.rotateInto(a, b)(a).angleTo(b) < 1e-9
  }

  property("rotation preserves angles between vectors") = forAll {
    (a: Vec3, b: Vec3, target: Vec3) =>
      val r = Mat3.rotateInto(a, target)
      math.abs(a.angleTo(b) - r(a).angleTo(r(b))) < 1e-9
  }

  property("pixel index round-trips through cell centers at any level") =
    forAll(Gen.choose(2, 12), genUnitVec) { (level, v) =>
      val pix = Pixelization(level)
      val i = pix.index(v)
      i >= 0 && i < pix.totalPixels && pix.index(pix.center(i)) == i
    }

  // bias axes toward face edges/corners where the quad-tree descent is
  // most fragile: components near equal magnitude
  private val genEdgy: Gen[Vec3] = for {
    sx <- Gen.oneOf(-1.0, 1.0); sy <- Gen.oneOf(-1.0, 1.0)
    sz <- Gen.oneOf(-1.0, 1.0)
    jx <- Gen.choose(0.9, 1.1); jy <- Gen.choose(0.9, 1.1)
    jz <- Gen.choose(0.0, 1.1)
  } yield Vec3(sx * jx, sy * jy, sz * jz).normalized

  property("envelope covers region points, incl. face-edge regions") =
    forAll(Gen.oneOf(genUnitVec, genEdgy), Gen.choose(0.001, 0.2)) {
      (axis, half) =>
        val pix = Pixelization(8)
        val region = Circle(axis, half)
        val ranges = pix.envelope(region)
        val pts = Generators.coneXyz(axis, 2 * half, 50,
          seed = (axis.x * 1e6).toLong)
        pts.filter(region.contains).forall { p =>
          val i = pix.index(p)
          ranges.exists { case (lo, hi) => i >= lo && i < hi }
        }
    }

  property("circle padding is monotone") =
    forAll(genUnitVec, Gen.choose(0.01, 0.5), Gen.choose(0.0, 0.3)) {
      (axis, half, pad) =>
        val c = Circle(axis, half)
        val padded = c.padded(pad)
        Generators.coneXyz(axis, 2 * half, 20, seed = 3)
          .filter(c.contains).forall(padded.contains)
    }

  property("triangle area permutation-invariant and bounded") = forAll {
    (a: Vec3, b: Vec3, c: Vec3) =>
      val t1 = Geom.triangleArea(a, b, c)
      val t2 = Geom.triangleArea(b, c, a)
      val t3 = Geom.triangleArea(c, a, b)
      math.abs(t1 - t2) < 1e-9 && math.abs(t2 - t3) < 1e-9 &&
        t1 >= 0 && t1 <= 4 * math.Pi
  }

  property("every scheme's envelope covers every in-region point") =
    forAll(Gen.oneOf("htm", "q3c", "mq3c"), genUnitVec,
      Gen.choose(0.01, 0.3), genUnitVec) { (mode, axis, half, probeDir) =>
      val pix = SkyPixelization(mode, 6)
      val region = Circle(axis, half)
      // build an in-region probe by rotating a jittered pole toward axis
      val local = Vec3(math.sin(half * 0.7) * probeDir.x,
        math.sin(half * 0.7) * probeDir.y, 1.0).normalized
      val p = Mat3.rotateInto(Vec3.zAxis, axis)(local)
      !region.contains(p) || {
        val id = pix.index(p)
        pix.envelope(region).exists { case (lo, hi) => id >= lo && id < hi }
      }
    }

  property("every scheme's cell polygon contains what indexed into it") =
    forAll(Gen.oneOf("htm", "q3c", "mq3c"), genUnitVec) { (mode, v) =>
      val pix = SkyPixelization(mode, 6)
      val id = pix.index(v)
      // centroid of the owning cell indexes back to the cell
      val c = pix.polygon(id).vertices.reduce(_ + _).normalized
      pix.index(c) == id
    }

  property("coarsen preserves coverage and respects the cap") =
    forAll(genUnitVec, Gen.choose(0.01, 0.3), Gen.choose(2, 64)) {
      (axis, half, cap) =>
        val pix = Pixelization(8)
        val ranges = pix.envelope(Circle(axis, half))
        val coarse = graft.apdb.SparkGeo.coarsen(ranges, cap)
        coarse.length <= math.max(cap, 1) &&
          ranges.forall { case (lo, hi) =>
            coarse.exists { case (clo, chi) => clo <= lo && hi <= chi }
          }
    }
}
