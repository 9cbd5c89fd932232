package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Pluggable sky pixelizations — the three schemes the reference's
  * partitioning study compares (`part_sim.py:37,75-86`: HTM, Q3C, MQ3C
  * from lsst.sphgeom). Implementations are original; only the scheme
  * *semantics* carry over:
  *
  *  - [[HtmPixelization]] — hierarchical triangular mesh: 8 octahedral
  *    root triangles, each recursively split in 4 (corner + center
  *    children). Prefix-based ids make every subtree a contiguous id
  *    range.
  *  - [[Q3cPixelization]] — quad cube with Morton (z-order) intra-face
  *    indexing: quad-tree subtrees are contiguous ranges.
  *  - [[Pixelization]] (existing, MQ3C-style) — quad cube with row-major
  *    intra-face indexing: envelopes emit one range per row.
  *
  * The trio exists to measure how id-space locality interacts with
  * region envelopes: the same FOV circle costs a different number of
  * `[lo, hi)` ranges (= range predicates = "queries" in the reference's
  * num_queries metric) per scheme. PartSim runs that comparison.
  */
trait SkyPixelization {
  def name: String
  def level: Int
  def totalPixels: Long
  /** Pixel id of a direction vector. */
  def index(v: Vec3): Long
  /** Conservative id-range superset of pixels intersecting `region`. */
  def envelope(region: Region): IndexedSeq[(Long, Long)]
  /** Boundary polygon of a pixel (triangle for HTM, quad for the cube
    * schemes) — `part_sim.py`'s `pixelator.triangle/quad`. */
  def polygon(pixelId: Long): SphericalPolygon

  protected def mergeRanges(rs: IndexedSeq[(Long, Long)]): IndexedSeq[(Long, Long)] = {
    if (rs.isEmpty) return rs
    val sorted = rs.sortBy(_._1)
    val out = ArrayBuffer(sorted.head)
    sorted.tail.foreach { case (lo, hi) =>
      val (plo, phi) = out.last
      if (lo <= phi) out(out.length - 1) = (plo, math.max(phi, hi))
      else out += ((lo, hi))
    }
    out.toIndexedSeq
  }
}

object SkyPixelization {
  /** `part_sim.py --mode` dispatcher. */
  def apply(mode: String, level: Int): SkyPixelization = mode match {
    case "htm" => HtmPixelization(level)
    case "q3c" => Q3cPixelization(level)
    case "mq3c" => Mq3cAdapter(Pixelization(level))
    case other => throw new IllegalArgumentException(
      s"unknown pixelization mode '$other' (htm, q3c, mq3c)")
  }
}

/** The existing row-major quad cube exposed through the trait. */
final case class Mq3cAdapter(pix: Pixelization) extends SkyPixelization {
  val name = "mq3c"
  def level: Int = pix.level
  def totalPixels: Long = pix.totalPixels
  def index(v: Vec3): Long = pix.index(v)
  def envelope(region: Region): IndexedSeq[(Long, Long)] = pix.envelope(region)
  def polygon(pixelId: Long): SphericalPolygon = pix.polygon(pixelId)
}

/** Hierarchical triangular mesh. Ids are `root * 4^level + path` where
  * each path digit selects a child: 0/1/2 the corner triangles at the
  * respective vertex, 3 the center triangle — so a depth-d subtree is
  * the contiguous range `[base, base + 4^(level-d))`.
  */
final case class HtmPixelization(level: Int) extends SkyPixelization {
  require(level >= 0 && level <= 15, "level in [0, 15]")
  val name = "htm"
  val totalPixels: Long = 8L << (2 * level)
  private val perRoot: Long = 1L << (2 * level)

  /** 8 octant root triangles, corners ordered counter-clockwise seen
    * from outside (positive determinant). */
  private val roots: IndexedSeq[(Vec3, Vec3, Vec3)] = {
    for {
      sz <- IndexedSeq(1.0, -1.0)
      sx <- IndexedSeq(1.0, -1.0)
      sy <- IndexedSeq(1.0, -1.0)
    } yield {
      val a = Vec3(sx, 0, 0); val b = Vec3(0, sy, 0); val c = Vec3(0, 0, sz)
      // det > 0 <=> CCW from outside <=> inward edge normals
      if (a.cross(b).dot(c) > 0) (a, b, c) else (a, c, b)
    }
  }

  private def mid(a: Vec3, b: Vec3): Vec3 = (a + b).normalized

  /** children in id-digit order. */
  private def children(t: (Vec3, Vec3, Vec3)): IndexedSeq[(Vec3, Vec3, Vec3)] = {
    val (a, b, c) = t
    val mab = mid(a, b); val mbc = mid(b, c); val mac = mid(a, c)
    IndexedSeq((a, mab, mac), (mab, b, mbc), (mac, mbc, c), (mab, mbc, mac))
  }

  private def inside(t: (Vec3, Vec3, Vec3), v: Vec3, eps: Double): Boolean = {
    val (a, b, c) = t
    a.cross(b).dot(v) >= -eps && b.cross(c).dot(v) >= -eps &&
      c.cross(a).dot(v) >= -eps
  }

  def index(v: Vec3): Long = {
    val u = v.normalized
    // root: first octant containing (boundaries resolved by order)
    var rootId = roots.indexWhere(inside(_, u, 1e-12))
    if (rootId < 0) rootId = 0 // numerically degenerate input
    var t = roots(rootId)
    var id = rootId.toLong
    var d = 0
    while (d < level) {
      val cs = children(t)
      // center triangle last: corner tests are cheaper and ties on
      // internal edges resolve consistently by order
      var k = cs.indexWhere(inside(_, u, 1e-12))
      if (k < 0) k = 3
      t = cs(k)
      id = id * 4 + k
      d += 1
    }
    id
  }

  def polygon(pixelId: Long): SphericalPolygon = {
    var t = roots((pixelId >> (2 * level)).toInt)
    var d = level - 1
    while (d >= 0) {
      t = children(t)(((pixelId >> (2 * d)) & 3L).toInt)
      d -= 1
    }
    SphericalPolygon(IndexedSeq(t._1, t._2, t._3))
  }

  def envelope(region: Region): IndexedSeq[(Long, Long)] = {
    val (axis, halfAngle) = region.boundingCone
    val out = ArrayBuffer.empty[(Long, Long)]
    def visit(t: (Vec3, Vec3, Vec3), d: Int, id: Long): Unit = {
      val centroid = (t._1 + t._2 + t._3).normalized
      val circum = Seq(t._1, t._2, t._3).map(centroid.angleTo).max
      val dist = axis.angleTo(centroid)
      if (dist > halfAngle + circum) () // disjoint
      else if (d == level || dist + circum <= halfAngle) {
        // leaf, or fully inside: the whole subtree is one id range
        val span = 1L << (2 * (level - d))
        val base = id << (2 * (level - d))
        out += ((base, base + span))
      } else {
        val cs = children(t)
        var k = 0
        while (k < 4) { visit(cs(k), d + 1, id * 4 + k); k += 1 }
      }
    }
    roots.indices.foreach(r => visit(roots(r), 0, r.toLong))
    mergeRanges(out.toIndexedSeq)
  }
}

/** Quad cube with Morton (z-order) intra-face ids: `face * 4^level +
  * interleave(iu, iv)`. Quad-tree descent aligns with Morton prefixes,
  * so fully-covered subtrees emit single contiguous ranges (vs one
  * range per row for the row-major layout).
  */
final case class Q3cPixelization(level: Int) extends SkyPixelization {
  require(level >= 0 && level <= 15, "level in [0, 15]")
  val name = "q3c"
  private val quad = Pixelization(level) // reuse face geometry
  val n: Int = 1 << level
  val cellsPerFace: Long = 1L << (2 * level)
  val totalPixels: Long = 6L * cellsPerFace

  private def interleave(iu: Int, iv: Int): Long = {
    var m = 0L; var b = 0
    while (b < level) {
      m |= ((iu.toLong >> b) & 1L) << (2 * b + 1)
      m |= ((iv.toLong >> b) & 1L) << (2 * b)
      b += 1
    }
    m
  }

  def index(v: Vec3): Long = {
    val rowMajor = quad.index(v)
    val f = rowMajor / cellsPerFace
    val rem = rowMajor % cellsPerFace
    val iu = (rem / n).toInt; val iv = (rem % n).toInt
    f * cellsPerFace + interleave(iu, iv)
  }

  def polygon(pixelId: Long): SphericalPolygon = {
    val f = pixelId / cellsPerFace
    val m = pixelId % cellsPerFace
    var iu = 0; var iv = 0; var b = 0
    while (b < level) {
      iu |= (((m >> (2 * b + 1)) & 1L) << b).toInt
      iv |= (((m >> (2 * b)) & 1L) << b).toInt
      b += 1
    }
    quad.polygon(f * cellsPerFace + iu.toLong * n + iv)
  }

  def envelope(region: Region): IndexedSeq[(Long, Long)] = {
    val (axis, halfAngle) = region.boundingCone
    val out = ArrayBuffer.empty[(Long, Long)]
    // descend the same face quad-tree as the row-major scheme; Morton
    // prefix (f, path) covers the contiguous range
    def visit(f: Int, d: Int, iu: Int, iv: Int, path: Long): Unit = {
      val (c, circum) = quad.cellCone(f, d, iu, iv)
      val dist = axis.angleTo(c)
      if (dist > halfAngle + circum) ()
      else if (d == level || dist + circum <= halfAngle) {
        val span = 1L << (2 * (level - d))
        val base = f * cellsPerFace + (path << (2 * (level - d)))
        out += ((base, base + span))
      } else {
        visit(f, d + 1, iu * 2, iv * 2, path * 4)
        visit(f, d + 1, iu * 2, iv * 2 + 1, path * 4 + 1)
        visit(f, d + 1, iu * 2 + 1, iv * 2, path * 4 + 2)
        visit(f, d + 1, iu * 2 + 1, iv * 2 + 1, path * 4 + 3)
      }
    }
    (0 until 6).foreach(visit(_, 0, 0, 0, 0L))
    mergeRanges(out.toIndexedSeq)
  }
}
