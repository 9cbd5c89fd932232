package graft.geom

import scala.util.Random

/** Seeded random sky-point generators — capability match for the
  * reference's `generators.py:33-91` (uniform on sphere / hemisphere via
  * Gaussian normalization; uniform in cone via uniform z-height), used by
  * catalog bootstrap and the DIA simulator. Distributed variant lives in
  * `graft.apdb.CatalogGen` (spark.range + randn column math).
  */
object Generators {

  /** n points uniform on the unit sphere; hemi = -1 folds to z<=0,
    * +1 to z>=0, 0 leaves the full sphere. */
  def sphereXyz(nPoints: Int, hemi: Int = 0, seed: Long = 1L): IndexedSeq[Vec3] = {
    val rng = new Random(seed)
    IndexedSeq.fill(nPoints) {
      var v = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      while (v.norm < 1e-9) // astronomically unlikely; regenerate
        v = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      val u = v.normalized
      if (hemi > 0 && u.z < 0) Vec3(u.x, u.y, -u.z)
      else if (hemi < 0 && u.z > 0) Vec3(u.x, u.y, -u.z)
      else u
    }
  }

  /** n points uniform within the cone of full opening `openAngle` around
    * `axis`: z uniform in [cos(openAngle/2), 1], azimuth uniform, rotated
    * onto the axis. */
  def coneXyz(axis: Vec3, openAngle: Double, nPoints: Int,
      seed: Long = 1L): IndexedSeq[Vec3] = {
    val rng = new Random(seed)
    val zMin = math.cos(openAngle / 2)
    val rot = Mat3.rotateInto(Vec3.zAxis, axis.normalized)
    IndexedSeq.fill(nPoints) {
      val z = zMin + (1.0 - zMin) * rng.nextDouble()
      val phi = 2 * math.Pi * rng.nextDouble()
      val r = math.sqrt(math.max(0.0, 1.0 - z * z))
      rot(Vec3(r * math.cos(phi), r * math.sin(phi), z))
    }
  }

  /** Poisson draw via inverse-CDF multiplication (`DIA.py:82` capability);
    * deterministic given the rng state. */
  def poisson(mean: Double, rng: Random): Int = {
    if (mean <= 0) return 0
    if (mean > 30) {
      // normal approximation for large means, clamped at 0
      math.max(0, math.round(mean + math.sqrt(mean) * rng.nextGaussian()).toInt)
    } else {
      val l = math.exp(-mean)
      var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      k
    }
  }
}
