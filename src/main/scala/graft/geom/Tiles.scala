package graft.geom

/** Field-of-view tilings — capability match for the reference's tile
  * mosaics (`/root/reference/python/lsst/l1dbproto/geom.py:59-222`):
  * a square div×div grid on the tangent plane (tiles disjoint from the
  * FOV circle excluded), and a camera-style 5×5 raft grid with the four
  * corner rafts removed, each raft subdivided ndiv×ndiv (21·ndiv² tiles).
  *
  * Pinned counts (from `tests/test_geom.py:63-90`): square 2×2→4,
  * 8×8→60 (64 without exclusion), 15×15→201; camera ndiv=2→84, ndiv=3→189.
  */
final case class Tile(id: Int, ix: Int, iy: Int, polygon: SphericalPolygon)

object Tiles {

  /** Project a tangent-plane point (u, v) at the +z pole onto the unit
    * sphere, then rotate +z onto `pointing`. */
  private def tangentToSphere(rot: Mat3, u: Double, v: Double): Vec3 =
    rot(Vec3(u, v, 1.0).normalized)

  /** Square div×div tiling of the FOV circle's circumscribing tangent
    * square. Tiles whose rectangle is disjoint from the inscribed circle
    * (radius h = tan(fov/2)) are dropped when `excludeDisjoint`. */
  def squareTiles(pointing: Vec3, fovRad: Double, divide: Int,
      excludeDisjoint: Boolean = true, rotRad: Double = 0.0): IndexedSeq[Tile] = {
    require(divide >= 1)
    val h = math.tan(fovRad / 2)
    val p = pointing.normalized
    // optional camera rotation about the pointing axis
    // (`make_square_tiles(..., rot_rad)`, part_sim.py:100)
    val base = Mat3.rotateInto(Vec3.zAxis, p)
    val rot =
      if (rotRad == 0.0) base
      else Mat3.aboutAxis(p, rotRad).compose(base)
    val cell = 2.0 / divide // in units of h
    val tiles = for {
      ix <- 0 until divide
      iy <- 0 until divide
      x0 = -1.0 + ix * cell; x1 = x0 + cell
      y0 = -1.0 + iy * cell; y1 = y0 + cell
      if !excludeDisjoint || rectIntersectsUnitCircle(x0, x1, y0, y1)
    } yield {
      val corners = IndexedSeq(
        tangentToSphere(rot, x0 * h, y0 * h),
        tangentToSphere(rot, x1 * h, y0 * h),
        tangentToSphere(rot, x1 * h, y1 * h),
        tangentToSphere(rot, x0 * h, y1 * h))
      Tile(ix * divide + iy, ix, iy, SphericalPolygon(corners))
    }
    tiles
  }

  /** Nearest-point test: does [x0,x1]×[y0,y1] touch the unit disc? */
  private def rectIntersectsUnitCircle(x0: Double, x1: Double,
      y0: Double, y1: Double): Boolean = {
    val nx = math.max(x0, math.min(0.0, x1))
    val ny = math.max(y0, math.min(0.0, y1))
    nx * nx + ny * ny <= 1.0
  }

  /** Raft (ix, iy) positions of the camera layout: 5×5 minus corners. */
  val cameraRafts: IndexedSeq[(Int, Int)] = for {
    ix <- 0 until 5
    iy <- 0 until 5
    if !((ix == 0 || ix == 4) && (iy == 0 || iy == 4))
  } yield (ix, iy)

  /** Camera tiling: 21 rafts over the FOV square, each ndiv×ndiv tiles
    * → 21·ndiv² tiles, corner rafts absent. */
  def cameraTiles(pointing: Vec3, fovRad: Double, ndiv: Int,
      rotationRad: Double = 0.0): IndexedSeq[Tile] = {
    require(ndiv >= 1)
    val h = math.tan(fovRad / 2)
    val rot = Mat3.rotateInto(Vec3.zAxis, pointing.normalized)
      .compose(Mat3.aboutAxis(Vec3.zAxis, rotationRad))
    val raftSize = 2.0 / 5
    val cell = raftSize / ndiv
    val tiles = for {
      ((rx, ry), ri) <- cameraRafts.zipWithIndex
      sx <- 0 until ndiv
      sy <- 0 until ndiv
    } yield {
      val x0 = -1.0 + rx * raftSize + sx * cell; val x1 = x0 + cell
      val y0 = -1.0 + ry * raftSize + sy * cell; val y1 = y0 + cell
      val corners = IndexedSeq(
        tangentToSphere(rot, x0 * h, y0 * h),
        tangentToSphere(rot, x1 * h, y0 * h),
        tangentToSphere(rot, x1 * h, y1 * h),
        tangentToSphere(rot, x0 * h, y1 * h))
      val gx = rx * ndiv + sx; val gy = ry * ndiv + sy
      Tile(ri * ndiv * ndiv + sx * ndiv + sy, gx, gy,
        SphericalPolygon(corners))
    }
    tiles
  }

  /** Tiling dispatcher (`geom.py:205-222` capability): divide > 0 →
    * square grid; divide < 0 → camera layout with ndiv = -divide. */
  def makeTiles(pointing: Vec3, fovRad: Double, divide: Int): IndexedSeq[Tile] =
    if (divide >= 0) squareTiles(pointing, fovRad, divide)
    else cameraTiles(pointing, fovRad, -divide)
}
