package graft.apdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.geom._

/** Geometry as Catalyst column expressions — every hot-path operation
  * (pixel index, region containment, coordinate conversion) is pure
  * column math so it stays inside whole-stage codegen; no UDFs.
  * Semantics match graft.geom (verified in SparkGeoSpec).
  */
object SparkGeo {

  /** ra/dec (degrees) → unit-vector components. */
  def xyz(ra: Column, dec: Column): (Column, Column, Column) = {
    val raR = radians(ra); val decR = radians(dec)
    (cos(decR) * cos(raR), cos(decR) * sin(raR), sin(decR))
  }

  /** Unit vector → (ra, dec) degrees, ra in [0, 360). */
  def raDec(x: Column, y: Column, z: Column): (Column, Column) = {
    val ra0 = degrees(atan2(y, x))
    (when(ra0 < 0, ra0 + 360.0).otherwise(ra0),
      degrees(asin(z / sqrt(x * x + y * y + z * z))))
  }

  /** Quad-cube pixel index of (x, y, z) at `pix.level` — column-math
    * mirror of [[Pixelization.index]]. */
  def pixelIndex(pix: Pixelization, x: Column, y: Column, z: Column): Column = {
    val ax = abs(x); val ay = abs(y); val az = abs(z)
    val n = lit(pix.n)
    def cell(t: Column): Column = {
      val i = floor((t + 1.0) * 0.5 * pix.n).cast("int")
      greatest(lit(0), least(lit(pix.n - 1), i))
    }
    def idx(face: Int, u: Column, w: Column): Column =
      lit(face.toLong * pix.cellsPerFace) +
        cell(u).cast("long") * n.cast("long") + cell(w).cast("long")
    // dominant-axis face selection mirrors Pixelization.face (>= ties
    // resolve x before y before z)
    when(ax >= ay && ax >= az,
      when(x >= 0, idx(0, y / x, z / x)).otherwise(idx(1, z / -x, y / -x)))
      .when(ay >= ax && ay >= az,
        when(y >= 0, idx(2, z / y, x / y)).otherwise(idx(3, x / -y, z / -y)))
      .otherwise(
        when(z >= 0, idx(4, x / z, y / z)).otherwise(idx(5, y / -z, x / -z)))
  }

  def pixelIndexRaDec(pix: Pixelization, ra: Column, dec: Column): Column = {
    val (x, y, z) = xyz(ra, dec)
    pixelIndex(pix, x, y, z)
  }

  def pixelIndexSkyRaDec(sky: SkyPixelization, ra: Column, dec: Column): Column = {
    val (x, y, z) = xyz(ra, dec)
    pixelIndexSky(sky, x, y, z)
  }

  /** Scheme-aware pixel index: the quad cube stays pure column math;
    * HTM / Morton-Q3C go through the native kernel expression (one
    * static call inside whole-stage codegen). */
  def pixelIndexSky(sky: SkyPixelization, x: Column, y: Column, z: Column): Column =
    sky match {
      case Mq3cAdapter(quad) => pixelIndex(quad, x, y, z)
      case other =>
        graft.plans.SpatialFunctions.sky_pixel_index(x, y, z,
          other.name, other.level)
    }

  /** Region containment as a boolean Column over xyz components.
    * Circle: one dot product (the reference's vectorized cone test,
    * `DIA.py:72-77`). Polygon: conjunction of edge-normal dots. */
  def containsXyz(region: Region, x: Column, y: Column, z: Column): Column =
    region match {
      case Circle(axis, halfAngle) =>
        val a = axis.normalized
        val cosH = math.cos(halfAngle)
        x * a.x + y * a.y + z * a.z >=
          lit(cosH) * sqrt(x * x + y * y + z * z)
      case p: SphericalPolygon =>
        // recompute inward normals exactly as SphericalPolygon does
        val vs = p.vertices.map(_.normalized)
        val centroid = vs.reduce(_ + _).normalized
        vs.indices.map { i =>
          val nrm = vs(i).cross(vs((i + 1) % vs.length))
          val s = if (nrm.dot(centroid) >= 0) 1.0 else -1.0
          x * (s * nrm.x) + y * (s * nrm.y) + z * (s * nrm.z) >= 0.0
        }.reduce(_ && _)
    }

  def containsRaDec(region: Region, ra: Column, dec: Column): Column = {
    val (x, y, z) = xyz(ra, dec)
    containsXyz(region, x, y, z)
  }

  /** Envelope ranges coarsened to at most `maxRanges` by merging the
    * smallest gaps — trades a few superfluous pixels for a short
    * predicate chain (the reference's num_queries/num_sp_part tradeoff,
    * `metrics.md:43-45`). */
  def coarsen(ranges: IndexedSeq[(Long, Long)], maxRanges: Int): IndexedSeq[(Long, Long)] = {
    if (ranges.length <= maxRanges) return ranges
    val sorted = ranges.sortBy(_._1)
    // gap i sits between sorted(i) and sorted(i+1); keep only the
    // maxRanges-1 largest gaps as separators, merge across the rest
    val separators = sorted.sliding(2).zipWithIndex.map {
      case (Seq((_, hi), (lo2, _)), i) => (lo2 - hi, i)
      case (_, i) => (Long.MaxValue, i)
    }.toIndexedSeq.sortBy(-_._1).take(maxRanges - 1).map(_._2).toSet
    val out = scala.collection.mutable.ArrayBuffer(sorted.head)
    sorted.tail.zipWithIndex.foreach { case ((lo, hi), i) =>
      if (separators.contains(i)) out += ((lo, hi))
      else {
        val (plo, phi) = out.last
        out(out.length - 1) = (plo, math.max(phi, hi))
      }
    }
    out.toIndexedSeq
  }

  /** OR-chain of `[lo, hi)` predicates over a pixel-id column. */
  def rangePredicate(pixelId: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => pixelId >= lo && pixelId < hi }
      .reduceOption(_ || _)
      .getOrElse(lit(false))
}
