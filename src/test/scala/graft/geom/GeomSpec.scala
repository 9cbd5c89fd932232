package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's pinned geometry values
  * (`/root/reference/tests/test_geom.py`). */
class GeomSpec extends AnyFunSuite {

  private val eps = 1e-12

  test("rotateInto maps a onto b exactly") {
    val cases = Seq(
      (Vec3.xAxis, Vec3.zAxis), (Vec3.zAxis, Vec3.zAxis),
      (Vec3(1, 1, 1).normalized, Vec3(-1, 2, 0.5).normalized),
      (Vec3.xAxis, Vec3(-1, 0, 0))) // antipodal
    for ((a, b) <- cases) {
      val r = Mat3.rotateInto(a, b)
      val got = r(a)
      assert(got.angleTo(b) < 1e-9, s"rotate $a -> $b gave $got")
    }
  }

  test("rotation matrices are orthonormal") {
    val r = Mat3.rotateInto(Vec3(0.3, -0.4, 0.87).normalized, Vec3.zAxis)
    val rt = r.compose(r.transpose)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(rt.m(i * 3 + j) - (if (i == j) 1 else 0)) < 1e-12)
  }

  // --- tile counts pinned by tests/test_geom.py:63-90 ---

  private val fov = math.toRadians(3.52)
  private val pointing = Vec3(0.2, -0.5, -0.8).normalized

  test("square tiles 2x2 -> 4") {
    assert(Tiles.squareTiles(pointing, fov, 2).length == 4)
  }
  test("square tiles 8x8 -> 60 with disjoint exclusion, 64 without") {
    assert(Tiles.squareTiles(pointing, fov, 8).length == 60)
    assert(Tiles.squareTiles(pointing, fov, 8, excludeDisjoint = false).length == 64)
  }
  test("square tiles 15x15 -> 201") {
    assert(Tiles.squareTiles(pointing, fov, 15).length == 201)
  }
  test("camera tiles ndiv=2 -> 84, ndiv=3 -> 189, corners absent") {
    val t2 = Tiles.cameraTiles(pointing, fov, 2)
    val t3 = Tiles.cameraTiles(pointing, fov, 3)
    assert(t2.length == 84)
    assert(t3.length == 189)
    // corner rafts absent: no tile covers the extreme grid corners
    val maxG = 5 * 2 - 1
    assert(!t2.exists(t => (t.ix, t.iy) == (0, 0)))
    assert(!t2.exists(t => (t.ix, t.iy) == (maxG, maxG)))
  }
  test("makeTiles dispatcher sign convention") {
    assert(Tiles.makeTiles(pointing, fov, 3).length == 9)
    assert(Tiles.makeTiles(pointing, fov, -2).length == 84)
  }

  // --- areas pinned by tests/test_geom.py:99-151 ---

  test("1/8-sphere spherical triangle area = pi/2") {
    val a = Geom.triangleArea(Vec3.xAxis, Vec3.yAxis, Vec3.zAxis)
    assert(math.abs(a - math.Pi / 2) < 1e-12)
  }

  test("small triangle area approaches planar limit") {
    val d = 1e-4
    val a = Geom.triangleArea(Vec3(1, 0, 0),
      Vec3(1, d, 0).normalized, Vec3(1, 0, d).normalized)
    assert(math.abs(a - d * d / 2) / (d * d / 2) < 1e-4)
  }

  test("small quad polygon area ~ dy*dz") {
    val dy = 2e-3; val dz = 1e-3
    val p = SphericalPolygon(IndexedSeq(
      Vec3(1, 0, 0).normalized, Vec3(1, dy, 0).normalized,
      Vec3(1, dy, dz).normalized, Vec3(1, 0, dz).normalized))
    assert(math.abs(p.area - dy * dz) / (dy * dz) < 1e-3)
  }

  test("octant polygon area = pi/2") {
    val p = SphericalPolygon(IndexedSeq(Vec3.xAxis, Vec3.yAxis, Vec3.zAxis))
    assert(math.abs(p.area - math.Pi / 2) < 1e-12)
  }

  // --- region semantics ---

  test("circle contains axis, excludes beyond half-angle") {
    val c = Circle(Vec3.zAxis, math.toRadians(2))
    assert(c.contains(Vec3.zAxis))
    assert(c.contains(Vec3.fromRaDec(0, 88.5)))
    assert(!c.contains(Vec3.fromRaDec(0, 87.5)))
  }

  test("circle padding is exact dilation") {
    val c = Circle(Vec3.zAxis, math.toRadians(2)).padded(math.toRadians(1))
    assert(c.contains(Vec3.fromRaDec(0, 87.5)))
    assert(!c.contains(Vec3.fromRaDec(0, 86.5)))
  }

  test("polygon contains its centroid; padding grows it") {
    val tile = Tiles.squareTiles(pointing, fov, 2).head.polygon
    val centroid = tile.vertices.reduce(_ + _).normalized
    assert(tile.contains(centroid))
    val outside = Mat3.aboutAxis(
      centroid.cross(tile.vertices.head).normalized,
      centroid.angleTo(tile.vertices.head) * 1.2)(centroid)
    assert(!tile.contains(outside))
    assert(tile.padded(centroid.angleTo(tile.vertices.head) * 0.5)
      .contains(outside))
  }

  test("xyz <-> ra/dec round trip, degrees convention") {
    for ((ra, dec) <- Seq((0.0, 0.0), (123.456, -45.0), (359.9, 89.0))) {
      val v = Vec3.fromRaDec(ra, dec)
      val (ra2, dec2) = v.toRaDec
      assert(math.abs(ra2 - ra) < 1e-9 && math.abs(dec2 - dec) < 1e-9)
      assert(math.abs(v.norm - 1.0) < eps)
    }
  }
}
