package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** The pluggable pixelization trio (HTM / Q3C Morton / MQ3C row-major):
  * scheme invariants + cross-scheme consistency, mirroring what the
  * reference's part_sim relies on from sphgeom. */
class SkyPixSpec extends AnyFunSuite {

  private val level = 6
  private val schemes = Seq(
    HtmPixelization(level),
    Q3cPixelization(level),
    SkyPixelization("mq3c", level))

  test("index is total and in range; polygon round-trips its own cell") {
    for (pix <- schemes) {
      for (v <- Generators.sphereXyz(1000, seed = 11)) {
        val id = pix.index(v)
        assert(id >= 0 && id < pix.totalPixels, s"${pix.name}: $id")
        // centroid of the cell polygon must index back to the cell
        val c = pix.polygon(id).vertices.reduce(_ + _).normalized
        assert(pix.index(c) == id, s"${pix.name}: centroid escaped cell $id")
      }
    }
  }

  test("envelope is a superset: every in-region point's pixel is covered") {
    for (pix <- schemes; seed <- 1 to 3) {
      val axis = Generators.sphereXyz(1, seed = seed).head
      val region = Circle(axis, math.toRadians(1.76))
      val ranges = pix.envelope(region)
      assert(ranges.nonEmpty, pix.name)
      // sorted, disjoint, half-open
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 < l2, pix.name)
        case _ =>
      }
      // points drawn inside the circle: pixel covered by some range
      val rng = new scala.util.Random(100 + seed)
      val rot = Mat3.rotateInto(Vec3.zAxis, axis.normalized)
      for (_ <- 0 until 300) {
        val r = math.toRadians(1.76) * math.sqrt(rng.nextDouble())
        val phi = rng.nextDouble() * 2 * math.Pi
        val local = Vec3(math.sin(r) * math.cos(phi),
          math.sin(r) * math.sin(phi), math.cos(r))
        val p = rot(local)
        val id = pix.index(p)
        assert(ranges.exists { case (lo, hi) => id >= lo && id < hi },
          s"${pix.name}: pixel $id of in-region point not in envelope")
      }
    }
  }

  test("envelope is selective (small circle covers a tiny id fraction)") {
    for (pix <- schemes) {
      val region = Circle(Vec3(0.2, -0.4, 0.89).normalized, math.toRadians(1.76))
      val covered = pix.envelope(region).map { case (lo, hi) => hi - lo }.sum
      assert(covered.toDouble / pix.totalPixels < 0.01,
        s"${pix.name}: covered $covered of ${pix.totalPixels}")
    }
  }

  test("q3c and mq3c are the same cells under different numbering") {
    val q3c = Q3cPixelization(level)
    val mq3c = Pixelization(level)
    for (v <- Generators.sphereXyz(300, seed = 5)) {
      val pq = q3c.polygon(q3c.index(v)).vertices
      val pm = mq3c.polygon(mq3c.index(v)).vertices
      // identical corner sets (same construction, same order)
      assert(pq.zip(pm).forall { case (a, b) => a.angleTo(b) < 1e-12 })
    }
  }

  test("htm cells partition their parent: 4 children tile the area") {
    val htm = HtmPixelization(4)
    val rng = new scala.util.Random(17)
    for (_ <- 0 until 50) {
      val parent = (rng.nextDouble() * HtmPixelization(3).totalPixels).toLong
      val parentArea = HtmPixelization(3).polygon(parent).area
      val childArea = (0 until 4).map(k => htm.polygon(parent * 4 + k).area).sum
      assert(math.abs(parentArea - childArea) / parentArea < 1e-9)
    }
  }

  test("part_sim MC stats: schemes differ in ranges, agree in area") {
    val fov = math.toRadians(3.5)
    val results = Seq("htm", "q3c", "mq3c").map { m =>
      val pix = SkyPixelization(m, 7)
      val (stats, _) = graft.PartSim.visitStats(pix, visit = 1L, fov,
        divide = 15, withArea = true)
      m -> stats
    }.toMap
    // q3c / mq3c: identical cells → identical per-tile pixel counts+areas
    results("q3c").zip(results("mq3c")).foreach { case (a, b) =>
      assert(a.nPixels == b.nPixels && math.abs(a.areaDeg2 - b.areaDeg2) < 1e-9)
    }
    // every tile's pixelized area is at least the tile's own area
    // (envelope is a superset)
    // reconstruct visit 1's exact mosaic (same pointing + rotation draw)
    val rotAng = new scala.util.Random(7001L).nextDouble() * 2 * math.Pi
    val tiles = Tiles.squareTiles(
      Generators.sphereXyz(1, hemi = -1, seed = 9001L).head, fov, 15,
      excludeDisjoint = false, rotRad = rotAng)
    for (m <- Seq("htm", "q3c")) {
      results(m).foreach { s =>
        val tileArea = tiles(s.tileId).polygon.area * math.pow(180 / math.Pi, 2)
        assert(s.areaDeg2 >= tileArea * 0.999,
          s"$m tile ${s.tileId}: pixel area ${s.areaDeg2} < tile $tileArea")
      }
    }
  }
}
