package graft.geom

/** Spherical geometry kernel — pure Scala, no Spark dependency.
  *
  * Capability match for the reference's geometry module
  * (`/root/reference/python/lsst/l1dbproto/geom.py`): unit vectors,
  * rotations, sky regions (circle / convex polygon) with containment,
  * padding, and spherical areas. The implementation is original; only the
  * semantics (and the pinned test values in `tests/test_geom.py`) carry
  * over.
  */
final case class Vec3(x: Double, y: Double, z: Double) {
  def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
  def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
  def *(s: Double): Vec3 = Vec3(x * s, y * s, z * s)
  def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
  def cross(o: Vec3): Vec3 =
    Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
  def norm: Double = math.sqrt(this.dot(this))
  def normalized: Vec3 = {
    val n = norm
    require(n > 0, "cannot normalize zero vector")
    Vec3(x / n, y / n, z / n)
  }
  /** Angular separation in radians (numerically stable near 0 and π). */
  def angleTo(o: Vec3): Double =
    2.0 * math.asin(math.min(1.0, ((this - o) * 0.5).norm /
      math.max(1e-300, 0.5 * (norm + o.norm))))

  /** (ra, dec) in degrees — the reference's angle convention
    * (README.md:63-66); xyz→polar as `_executors.py:297-300`. */
  def toRaDec: (Double, Double) = {
    val ra = math.toDegrees(math.atan2(y, x))
    val dec = math.toDegrees(math.asin(z / norm))
    (if (ra < 0) ra + 360.0 else ra, dec)
  }
}

object Vec3 {
  val xAxis: Vec3 = Vec3(1, 0, 0)
  val yAxis: Vec3 = Vec3(0, 1, 0)
  val zAxis: Vec3 = Vec3(0, 0, 1)

  /** lon/lat (degrees) → unit vector (inverse of `toRaDec`). */
  def fromRaDec(raDeg: Double, decDeg: Double): Vec3 = {
    val ra = math.toRadians(raDeg)
    val dec = math.toRadians(decDeg)
    Vec3(math.cos(dec) * math.cos(ra), math.cos(dec) * math.sin(ra),
      math.sin(dec))
  }
}

/** Row-major 3×3 matrix; enough for frame rotations. */
final case class Mat3(m: Array[Double]) {
  require(m.length == 9)
  def apply(v: Vec3): Vec3 = Vec3(
    m(0) * v.x + m(1) * v.y + m(2) * v.z,
    m(3) * v.x + m(4) * v.y + m(5) * v.z,
    m(6) * v.x + m(7) * v.y + m(8) * v.z)
  def compose(o: Mat3): Mat3 = {
    val r = new Array[Double](9)
    var i = 0
    while (i < 3) {
      var j = 0
      while (j < 3) {
        var s = 0.0
        var k = 0
        while (k < 3) { s += m(i * 3 + k) * o.m(k * 3 + j); k += 1 }
        r(i * 3 + j) = s
        j += 1
      }
      i += 1
    }
    Mat3(r)
  }
  def transpose: Mat3 = Mat3(Array(
    m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)))
}

object Mat3 {
  val identity: Mat3 = Mat3(Array(1, 0, 0, 0, 1, 0, 0, 0, 1))

  /** Rotation about a unit axis by angle (Rodrigues form). */
  def aboutAxis(axis: Vec3, angle: Double): Mat3 = {
    val u = axis.normalized
    val c = math.cos(angle); val s = math.sin(angle); val t = 1 - c
    Mat3(Array(
      c + u.x * u.x * t, u.x * u.y * t - u.z * s, u.x * u.z * t + u.y * s,
      u.y * u.x * t + u.z * s, c + u.y * u.y * t, u.y * u.z * t - u.x * s,
      u.z * u.x * t - u.y * s, u.z * u.y * t + u.x * s, c + u.z * u.z * t))
  }

  /** Minimal rotation taking unit vector a onto unit vector b
    * (reference capability: `geom.py:37-56`). */
  def rotateInto(a: Vec3, b: Vec3): Mat3 = {
    val an = a.normalized; val bn = b.normalized
    val axis = an.cross(bn)
    val s = axis.norm
    if (s < 1e-15) {
      if (an.dot(bn) > 0) identity
      else {
        // antipodal: rotate π about any axis orthogonal to a
        val orth =
          if (math.abs(an.x) < 0.9) an.cross(Vec3.xAxis).normalized
          else an.cross(Vec3.yAxis).normalized
        aboutAxis(orth, math.Pi)
      }
    } else aboutAxis(axis * (1.0 / s), math.atan2(s, an.dot(bn)))
  }
}

/** A region on the unit sphere. */
sealed trait Region {
  def contains(v: Vec3): Boolean
  def contains(raDeg: Double, decDeg: Double): Boolean =
    contains(Vec3.fromRaDec(raDeg, decDeg))
  /** Dilated region for query padding (`geom.py:270-303`): exact for
    * circles, approximate (vertex push-out from centroid) for polygons. */
  def padded(radians: Double): Region
  /** Conservative bounding cone (axis + half-angle) for envelope tests. */
  def boundingCone: (Vec3, Double)
}

/** Spherical cap: all v with angle(axis, v) <= halfAngle. */
final case class Circle(axis: Vec3, halfAngle: Double) extends Region {
  private val cosHalf = math.cos(halfAngle)
  private val a = axis.normalized
  override def contains(v: Vec3): Boolean = a.dot(v) >= cosHalf * v.norm
  override def padded(radians: Double): Region =
    Circle(a, math.min(math.Pi, halfAngle + radians))
  override def boundingCone: (Vec3, Double) = (a, halfAngle)
}

/** Convex spherical polygon: intersection of half-spaces through the
  * origin. Vertices must be given counter-clockwise as seen from outside
  * the sphere (right-hand normals point inward). */
final case class SphericalPolygon(vertices: IndexedSeq[Vec3]) extends Region {
  require(vertices.length >= 3, "polygon needs >= 3 vertices")
  private val vs = vertices.map(_.normalized)
  private val edgeNormals: IndexedSeq[Vec3] = vs.indices.map { i =>
    vs(i).cross(vs((i + 1) % vs.length))
  }
  // flip normals if vertices were given clockwise (centroid must be inside)
  private val centroid = vs.reduce(_ + _).normalized
  private val sign = if (edgeNormals.forall(_.dot(centroid) >= 0)) 1.0 else -1.0

  override def contains(v: Vec3): Boolean =
    edgeNormals.forall(n => sign * n.dot(v) >= 0)

  override def padded(radians: Double): Region = {
    // approximate: push each vertex away from the centroid along the
    // great circle through (centroid, vertex) — same ad-hoc approach the
    // reference documents as approximate (`geom.py:291-293`). The push
    // angle carries the reference's sqrt(2) diagonal compensation
    // (`geom.py:300-301`): a radial vertex push dilates edge MIDPOINTS by
    // less than the margin (worst case margin/sqrt(2) for a square), so
    // points within the margin of an edge could otherwise fall outside.
    // Circle padding (the exact path) is unaffected.
    val margin = radians * math.sqrt(2.0)
    val pushed = vs.map { v =>
      val d = centroid.angleTo(v)
      if (d < 1e-12) v
      else {
        val axis = centroid.cross(v)
        if (axis.norm < 1e-15) v
        else Mat3.aboutAxis(axis * (1.0 / axis.norm), margin)(v)
      }
    }
    SphericalPolygon(pushed)
  }

  override def boundingCone: (Vec3, Double) = {
    val r = vs.map(centroid.angleTo).max
    (centroid, r)
  }

  /** Spherical area via fan triangulation from vertex 0
    * (`geom.py:225-240` capability). */
  def area: Double =
    (1 until vs.length - 1).map { i =>
      Geom.triangleArea(vs(0), vs(i), vs(i + 1))
    }.sum
}

object Geom {
  /** Area of the spherical triangle (a,b,c) via spherical excess,
    * computed with L'Huilier's theorem (stable for small triangles).
    * Reference capability: `geom.py:243-267`. */
  def triangleArea(a: Vec3, b: Vec3, c: Vec3): Double = {
    val sa = b.angleTo(c); val sb = c.angleTo(a); val sc = a.angleTo(b)
    val s = 0.5 * (sa + sb + sc)
    val t = math.sqrt(math.max(0.0,
      math.tan(s / 2) * math.tan((s - sa) / 2) *
        math.tan((s - sb) / 2) * math.tan((s - sc) / 2)))
    4.0 * math.atan(t)
  }
}
