package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Quad-cube sky pixelization (MQ3C-style, `part_sim.py:83-86` semantics):
  * six cube faces, each split 2^level × 2^level. Supplies the two
  * primitives the reference's spatial store depends on
  * (README.md:118-127): a per-row pixel index, and region → index-range
  * envelope used for partition pruning.
  *
  * Index layout: `face * 4^level + iu * 2^level + iv` — rows of constant
  * iu are contiguous, so envelopes of compact regions merge into few
  * ranges. All ranges are half-open `[lo, hi)`.
  */
final case class Pixelization(level: Int) {
  require(level >= 0 && level <= 15, "level in [0, 15]")
  val n: Int = 1 << level // cells per face edge
  val cellsPerFace: Long = n.toLong * n.toLong
  val totalPixels: Long = 6L * cellsPerFace

  /** Face of the dominant axis: 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z. */
  def face(v: Vec3): Int = {
    val ax = math.abs(v.x); val ay = math.abs(v.y); val az = math.abs(v.z)
    if (ax >= ay && ax >= az) { if (v.x >= 0) 0 else 1 }
    else if (ay >= ax && ay >= az) { if (v.y >= 0) 2 else 3 }
    else { if (v.z >= 0) 4 else 5 }
  }

  /** Face-plane coordinates (u, w) ∈ [-1, 1]² for a vector on `f`. */
  private def faceUV(f: Int, v: Vec3): (Double, Double) = f match {
    case 0 => (v.y / v.x, v.z / v.x)
    case 1 => (v.z / -v.x, v.y / -v.x)
    case 2 => (v.z / v.y, v.x / v.y)
    case 3 => (v.x / -v.y, v.z / -v.y)
    case 4 => (v.x / v.z, v.y / v.z)
    case 5 => (v.y / -v.z, v.x / -v.z)
  }

  /** Unit vector of face-plane point (u, w) on face `f`. */
  private def uvToVec(f: Int, u: Double, w: Double): Vec3 = (f match {
    case 0 => Vec3(1, u, w)
    case 1 => Vec3(-1, w, u)
    case 2 => Vec3(w, 1, u)
    case 3 => Vec3(u, -1, w)
    case 4 => Vec3(u, w, 1)
    case 5 => Vec3(w, u, -1)
  }).normalized

  private def clampCell(i: Int): Int = math.max(0, math.min(n - 1, i))

  /** Pixel index of a direction vector. */
  def index(v: Vec3): Long = {
    val f = face(v)
    val (u, w) = faceUV(f, v)
    val iu = clampCell(((u + 1.0) * 0.5 * n).toInt)
    val iv = clampCell(((w + 1.0) * 0.5 * n).toInt)
    f * cellsPerFace + iu.toLong * n + iv
  }

  def index(raDeg: Double, decDeg: Double): Long =
    index(Vec3.fromRaDec(raDeg, decDeg))

  /** Center direction of a pixel (for tests / debugging). */
  def center(pixelId: Long): Vec3 = {
    val f = (pixelId / cellsPerFace).toInt
    val rem = pixelId % cellsPerFace
    val iu = (rem / n).toInt; val iv = (rem % n).toInt
    uvToVec(f, (iu + 0.5) * 2.0 / n - 1.0, (iv + 0.5) * 2.0 / n - 1.0)
  }

  /** Boundary quad of a pixel (`part_sim.py` `pixelator.quad` analog). */
  def polygon(pixelId: Long): SphericalPolygon = {
    val f = (pixelId / cellsPerFace).toInt
    val rem = pixelId % cellsPerFace
    val iu = (rem / n).toInt; val iv = (rem % n).toInt
    val u0 = iu * 2.0 / n - 1.0; val u1 = u0 + 2.0 / n
    val w0 = iv * 2.0 / n - 1.0; val w1 = w0 + 2.0 / n
    SphericalPolygon(IndexedSeq(uvToVec(f, u0, w0), uvToVec(f, u1, w0),
      uvToVec(f, u1, w1), uvToVec(f, u0, w1)))
  }

  /** Bounding cone (centroid + circumradius) of a depth-`d` face cell —
    * shared with the Morton-order Q3C scheme, which descends the same
    * face quad-tree. */
  private[geom] def cellCone(f: Int, d: Int, iu: Int, iv: Int): (Vec3, Double) = {
    val nd = 1 << d
    val u0 = iu * 2.0 / nd - 1.0; val u1 = u0 + 2.0 / nd
    val w0 = iv * 2.0 / nd - 1.0; val w1 = w0 + 2.0 / nd
    val c = uvToVec(f, (u0 + u1) / 2, (w0 + w1) / 2)
    val circum = Seq(uvToVec(f, u0, w0), uvToVec(f, u1, w0),
      uvToVec(f, u1, w1), uvToVec(f, u0, w1)).map(c.angleTo).max
    (c, circum)
  }

  /** Index ranges [lo, hi) of all pixels possibly intersecting `region`
    * — a conservative superset (exact filtering happens row-wise after
    * the pruned scan, the reference's two-phase pattern
    * README.md:26-28). Hierarchical quad-tree descent per face with a
    * bounding-cone disjointness test. */
  def envelope(region: Region): IndexedSeq[(Long, Long)] = {
    val (axis, halfAngle) = region.boundingCone
    val out = ArrayBuffer.empty[(Long, Long)]

    // cell at depth d covers [-1,1]² split 2^d per axis on face f
    def visit(f: Int, d: Int, iu: Int, iv: Int): Unit = {
      val nd = 1 << d
      val u0 = iu * 2.0 / nd - 1.0; val u1 = u0 + 2.0 / nd
      val w0 = iv * 2.0 / nd - 1.0; val w1 = w0 + 2.0 / nd
      val cu = (u0 + u1) / 2; val cw = (w0 + w1) / 2
      val c = uvToVec(f, cu, cw)
      val corners = Seq(uvToVec(f, u0, w0), uvToVec(f, u1, w0),
        uvToVec(f, u1, w1), uvToVec(f, u0, w1))
      val circum = corners.map(c.angleTo).max
      val dist = axis.angleTo(c)
      if (dist > halfAngle + circum) () // disjoint — prune subtree
      else if (d == level) {
        val base = f * cellsPerFace + iu.toLong * n + iv
        out += ((base, base + 1))
      } else if (dist + circum <= halfAngle) {
        // fully inside the bounding cone: still descend only as far as
        // needed to emit contiguous runs — whole iu-rows are contiguous.
        emitSubtree(f, d, iu, iv)
      } else {
        visit(f, d + 1, iu * 2, iv * 2)
        visit(f, d + 1, iu * 2, iv * 2 + 1)
        visit(f, d + 1, iu * 2 + 1, iv * 2)
        visit(f, d + 1, iu * 2 + 1, iv * 2 + 1)
      }
    }

    /** Emit every level-`level` pixel under cell (d, iu, iv): one range
      * per fine iu-row (rows are contiguous in the index layout). */
    def emitSubtree(f: Int, d: Int, iu: Int, iv: Int): Unit = {
      val shift = level - d
      val span = 1L << shift
      val iu0 = iu.toLong << shift; val iv0 = iv.toLong << shift
      var r = 0L
      while (r < span) {
        val base = f * cellsPerFace + (iu0 + r) * n + iv0
        out += ((base, base + span))
        r += 1
      }
    }

    (0 until 6).foreach(visit(_, 0, 0, 0))
    mergeRanges(out.toIndexedSeq)
  }

  private def mergeRanges(rs: IndexedSeq[(Long, Long)]): IndexedSeq[(Long, Long)] = {
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

object Pixelization {
  /** Reference default granularity (`part_sim.py:63-66`). */
  val default: Pixelization = Pixelization(8)
}
