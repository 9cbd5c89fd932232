package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom._

/** Geometry-flavored SURVEY §2 operators over the driver testdata.
  *
  * xyz/ra-dec inputs are synthesized from integer keys with *rational*
  * arithmetic (add/mul/div of small integers) so Spark and DuckDB compute
  * bit-identical doubles — no libm (sin/atan2) on the oracle-compared
  * path. Where libm is unavoidable (c1), outputs are rounded to 6
  * decimals and the row set is bounded.
  */
object GeoQueries {

  type QFn = (SparkSession, String) => DataFrame

  // Synthetic direction vector from event_id: components are exact
  // rationals in [-1, 1]; vector left unnormalized, predicates are scaled
  // by |v| instead (sqrt is IEEE-exact, so both engines agree).
  private def synthXyz(df: DataFrame): DataFrame = df
    .withColumn("sx", (pmod(col("event_id") * 37L, lit(2001L)) - 1000L) / 1000.0)
    .withColumn("sy", (pmod(col("event_id") * 101L, lit(2001L)) - 1000L) / 1000.0)
    .withColumn("sz", (pmod(col("event_id") * 61L, lit(2001L)) - 1000L) / 1000.0)
    .where(col("sx") =!= 0.0 || col("sy") =!= 0.0 || col("sz") =!= 0.0)

  private val synthXyzSql =
    """SELECT *,
      |  ((event_id * 37) % 2001 - 1000) / 1000.0 AS sx,
      |  ((event_id * 101) % 2001 - 1000) / 1000.0 AS sy,
      |  ((event_id * 61) % 2001 - 1000) / 1000.0 AS sz
      |FROM events
      |WHERE NOT (((event_id * 37) % 2001 = 1000) AND ((event_id * 101) % 2001 = 1000)
      |  AND ((event_id * 61) % 2001 = 1000))""".stripMargin

  // cone axis (exact rationals after normalization by sqrt(3) kept
  // symbolic: use unnormalized axis and scale the threshold instead)
  private val axTxt = "(0.6, 0.48, 0.64)" // |axis| = 1.0 exactly? 0.36+0.2304+0.4096 = 1.0
  private val (ax, ay, az) = (0.6, 0.48, 0.64) // exact: |axis|^2 = 1.0
  private val cosOpen = 0.94 // cos of ~20deg, exact decimal literal

  /** F1 — vectorized cone-search filter (`DIA.py:72-77`):
    * dot(pointing, src) > cos(open/2) · |src|. */
  val f1ConeFilter: QFn = (s, d) => {
    synthXyz(Tables.events(s, d))
      .where(col("sx") * ax + col("sy") * ay + col("sz") * az >
        lit(cosOpen) * sqrt(col("sx") * col("sx") + col("sy") * col("sy") + col("sz") * col("sz")))
      .select(col("event_id"), col("sx"), col("sy"), col("sz"))
      .orderBy(col("event_id"))
  }
  val f1Sql =
    s"""SELECT event_id, sx, sy, sz FROM ($synthXyzSql)
       |WHERE sx * $ax + sy * $ay + sz * $az > $cosOpen * sqrt(sx*sx + sy*sy + sz*sz)
       |ORDER BY event_id""".stripMargin

  /** F3 — region anti-mask: outsiders get sentinel id -666 then are
    * filtered (`_executors.py:57-58,166-171`). Box region in the synth
    * plane keeps the arithmetic rational. */
  val f3RegionMask: QFn = (s, d) => {
    synthXyz(Tables.events(s, d))
      .withColumn("masked_id",
        when(col("sx") > -0.5 && col("sx") < 0.5 &&
          col("sy") > -0.25 && col("sy") < 0.75, col("user_id"))
          .otherwise(lit(-666L)))
      .where(col("masked_id") =!= -666L)
      .select(col("event_id"), col("masked_id"))
      .orderBy(col("event_id"))
  }
  val f3Sql =
    s"""SELECT event_id,
       |  CASE WHEN sx > -0.5 AND sx < 0.5 AND sy > -0.25 AND sy < 0.75
       |    THEN user_id ELSE -666 END AS masked_id
       |FROM ($synthXyzSql)
       |WHERE NOT (CASE WHEN sx > -0.5 AND sx < 0.5 AND sy > -0.25 AND sy < 0.75
       |    THEN user_id ELSE -666 END = -666)
       |ORDER BY event_id""".stripMargin

  /** F4 — exact region containment: convex-polygon half-plane test with
    * rational vertices (`_executors.py:240-263`). The astronomy path uses
    * SphericalPolygon.contains; the oracle form is the identical
    * cross-product sign test. */
  val f4RegionFilter: QFn = (s, d) => {
    // convex quad (counter-clockwise): (-0.6,-0.4) (0.7,-0.5) (0.8,0.6) (-0.5,0.55)
    val vs = Seq((-0.6, -0.4), (0.7, -0.5), (0.8, 0.6), (-0.5, 0.55))
    val preds = vs.indices.map { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.length)
      (lit(x2 - x1) * (col("sy") - y1) - lit(y2 - y1) * (col("sx") - x1)) >= 0.0
    }.reduce(_ && _)
    synthXyz(Tables.events(s, d))
      .where(preds)
      .select(col("event_id"), col("sx"), col("sy"))
      .orderBy(col("event_id"))
  }
  val f4Sql = {
    val vs = Seq((-0.6, -0.4), (0.7, -0.5), (0.8, 0.6), (-0.5, 0.55))
    val preds = vs.indices.map { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.length)
      s"(${x2 - x1}) * (sy - ($y1)) - (${y2 - y1}) * (sx - ($x1)) >= 0.0"
    }.mkString(" AND ")
    s"""SELECT event_id, sx, sy FROM ($synthXyzSql)
       |WHERE $preds
       |ORDER BY event_id""".stripMargin
  }

  /** C1 — xyz → (ra, dec) degrees (`_executors.py:297-300`). atan2/asin
    * differ in the last ulp across libms → rounded to 6 decimals and
    * bounded to 1000 rows. */
  val c1XyzToRadec: QFn = (s, d) => {
    synthXyz(Tables.events(s, d))
      .where(col("event_id") < 1000)
      .withColumn("norm", sqrt(col("sx") * col("sx") + col("sy") * col("sy") + col("sz") * col("sz")))
      .select(col("event_id"),
        round(degrees(atan2(col("sy"), col("sx"))), 6).as("ra"),
        round(degrees(asin(col("sz") / col("norm"))), 6).as("dec"))
      .orderBy(col("event_id"))
  }
  val c1Sql =
    s"""SELECT event_id,
       |  round(degrees(atan2(sy, sx)), 6) AS ra,
       |  round(degrees(asin(sz / sqrt(sx*sx + sy*sy + sz*sz))), 6) AS dec
       |FROM ($synthXyzSql) WHERE event_id < 1000
       |ORDER BY event_id""".stripMargin

  // Pixel ranges shared by j3/j4/a8: the REAL envelope of a survey-field
  // circle from the quad-cube pixelization (level 4, 1536 pixels),
  // computed at SQL-build time and inlined — the same [lo, hi) range
  // list ApdbSpark pushes into its spatial reads (README.md:118-124),
  // exercised against a synthetic pixel column over the same id domain.
  private val envPix = Pixelization(4)
  private val envRegion = Circle(Vec3(0.6, 0.48, 0.64), math.toRadians(30))
  private val rangeRows: Seq[(Long, Long, Long)] =
    envPix.envelope(envRegion).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
  private val pixelDomain: Long = envPix.totalPixels // 1536
  private val rangesSql = rangeRows
    .map { case (id, lo, hi) => s"($id, $lo, $hi)" }
    .mkString("(VALUES ", ", ", ") AS r(range_id, lo, hi)")

  /** Shared range-join builder: rows whose synthetic pixelId falls in
    * any envelope range [lo, hi); ranges + id domain come from a
    * pixelization scheme at SQL-build time, so each scheme's envelope
    * gets its own oracle rows (HTM prefix ranges and Morton-Q3C ranges
    * live in different id spaces than the row-major quad cube). */
  private def rangeJoinFn(rows: Seq[(Long, Long, Long)], domain: Long): QFn =
    (s, d) => {
      import s.implicits._
      val ranges = rows.toDF("range_id", "lo", "hi")
      Tables.lineitem(s, d)
        .withColumn("pixel_id", pmod(col("l_orderkey") * 2654435761L, lit(domain)))
        .join(broadcast(ranges),
          col("pixel_id") >= col("lo") && col("pixel_id") < col("hi"))
        .select(col("l_orderkey"), col("l_linenumber"), col("pixel_id"), col("range_id"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("range_id"))
    }
  private def rangeJoinSql(rows: Seq[(Long, Long, Long)], domain: Long): String = {
    val vals = rows.map { case (id, lo, hi) => s"($id, $lo, $hi)" }
      .mkString("(VALUES ", ", ", ") AS r(range_id, lo, hi)")
    s"""SELECT l_orderkey, l_linenumber,
       |  (l_orderkey * 2654435761) % $domain AS pixel_id, range_id
       |FROM lineitem JOIN $vals
       |  ON (l_orderkey * 2654435761) % $domain >= lo
       | AND (l_orderkey * 2654435761) % $domain < hi
       |ORDER BY l_orderkey, l_linenumber, range_id""".stripMargin
  }

  /** J3 — pixel-range join: rows whose pixelId falls in any envelope
    * range [lo, hi) (README.md:118-124). Broadcast the tiny range set. */
  val j3PixelRangeJoin: QFn = rangeJoinFn(rangeRows, pixelDomain)
  val j3Sql = rangeJoinSql(rangeRows, pixelDomain)

  /** J3 variants exercising the OTHER pixelization schemes' envelopes
    * under the oracle gate (`part_sim.py:75-86` — the reference runs the
    * same partition simulation per scheme): ranges from
    * `HtmPixelization(4).envelope` / `Q3cPixelization(4).envelope`
    * inlined at SQL-build time over each scheme's own id domain. */
  private def schemeRanges(sky: SkyPixelization): Seq[(Long, Long, Long)] =
    sky.envelope(envRegion).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
  private val htmPix = HtmPixelization(4)
  private val q3cPix = Q3cPixelization(4)
  // envelope traversals computed once per scheme, shared by query + SQL
  private val htmRows = schemeRanges(htmPix)
  private val q3cRows = schemeRanges(q3cPix)
  val j3RangeJoinHtm: QFn = rangeJoinFn(htmRows, htmPix.totalPixels)
  val j3HtmSql = rangeJoinSql(htmRows, htmPix.totalPixels)
  val j3RangeJoinQ3c: QFn = rangeJoinFn(q3cRows, q3cPix.totalPixels)
  val j3Q3cSql = rangeJoinSql(q3cRows, q3cPix.totalPixels)

  /** J4 — tile×pixel overlap counts (`part_sim.py:100-122`): how many
    * tiles (ranges) cover each pixel. */
  val j4TilePixelOverlap: QFn = (s, d) => {
    import s.implicits._
    val ranges = rangeRows.toDF("range_id", "lo", "hi")
    Tables.lineitem(s, d)
      .withColumn("pixel_id", pmod(col("l_orderkey") * 2654435761L, lit(pixelDomain)))
      .select(col("pixel_id")).distinct()
      .join(broadcast(ranges),
        col("pixel_id") >= col("lo") && col("pixel_id") < col("hi"))
      .groupBy(col("pixel_id"))
      .agg(count(lit(1)).as("n_tiles"))
      .orderBy(col("pixel_id"))
  }
  val j4Sql =
    s"""SELECT pixel_id, COUNT(*) AS n_tiles FROM
       |  (SELECT DISTINCT (l_orderkey * 2654435761) % $pixelDomain AS pixel_id FROM lineitem) p
       |JOIN $rangesSql ON pixel_id >= lo AND pixel_id < hi
       |GROUP BY pixel_id ORDER BY pixel_id""".stripMargin

  /** A8 — Monte-Carlo summary means over the overlap join
    * (`part_sim.py:124-128`): integer-exact averages. */
  val a8McSummary: QFn = (s, d) => {
    j4TilePixelOverlap(s, d)
      .agg(count(lit(1)).as("n_pixels"),
        sum(col("n_tiles")).as("sum_tiles"))
      .withColumn("tiles_per_pixel", col("sum_tiles") / col("n_pixels").cast("double"))
  }
  val a8Sql =
    s"""SELECT COUNT(*) AS n_pixels, CAST(SUM(n_tiles) AS BIGINT) AS sum_tiles,
       |  CAST(SUM(n_tiles) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS tiles_per_pixel
       |FROM (${j4Sql.replace("ORDER BY pixel_id", "")})""".stripMargin

  /** U3 — camera raft grid minus corner rafts (`geom.py:177-201`):
    * EXCEPT on (ix, iy). */
  val u3CameraTiles: QFn = (s, d) => {
    import s.implicits._
    val grid = s.range(5).select(col("id").as("ix"))
      .crossJoin(s.range(5).select(col("id").as("iy")))
    val corners = Seq((0L, 0L), (0L, 4L), (4L, 0L), (4L, 4L)).toDF("ix", "iy")
    grid.except(corners).orderBy(col("ix"), col("iy"))
  }
  val u3Sql =
    """SELECT ix, iy FROM
      |  (SELECT a.range AS ix, b.range AS iy FROM range(5) a, range(5) b)
      |EXCEPT
      |SELECT * FROM (VALUES (0, 0), (0, 4), (4, 0), (4, 4)) AS c(ix, iy)
      |ORDER BY ix, iy""".stripMargin

  // --- previously rows-only geometry keys, now oracle-checked: c2 by
  // --- identical constant-matrix column math; c3/a9 by an *independent*
  // --- area formula (Girard's spherical excess in DuckDB vs the
  // --- kernel's L'Huilier), over vertex coordinates inlined as VALUES
  // --- (Scala double toString round-trips exactly through SQL parsing).

  /** The fixed pointing rotation shared by c2 and its oracle. */
  private val c2Mat: Array[Double] =
    Mat3.rotateInto(Vec3.zAxis, Vec3(0.6, 0.48, 0.64)).m

  /** C2 — rotation matrices applied row-wise: rotate the synthesized
    * catalog onto a pointing (`geom.py:37-56`, `generators.py:89-91`). */
  val c2Rotation: QFn = (s, d) => {
    val m = c2Mat
    synthXyz(Tables.events(s, d))
      .select(col("event_id"),
        (col("sx") * m(0) + col("sy") * m(1) + col("sz") * m(2)).as("rx"),
        (col("sx") * m(3) + col("sy") * m(4) + col("sz") * m(5)).as("ry"),
        (col("sx") * m(6) + col("sy") * m(7) + col("sz") * m(8)).as("rz"))
      .orderBy(col("event_id"))
  }
  val c2Sql: String = {
    val m = c2Mat
    s"""SELECT event_id,
       |  sx * (${m(0)}) + sy * (${m(1)}) + sz * (${m(2)}) AS rx,
       |  sx * (${m(3)}) + sy * (${m(4)}) + sz * (${m(5)}) AS ry,
       |  sx * (${m(6)}) + sy * (${m(7)}) + sz * (${m(8)}) AS rz
       |FROM ($synthXyzSql)
       |ORDER BY event_id""".stripMargin
  }

  /** Girard-excess CTE stages over a triangle relation with unit-vector
    * columns p1x..p3z: `d` (clamped cosines of the three sides), `ang`
    * (vertex-angle sum minus pi = spherical excess = area). */
  private def girardStages(keyCols: String, triSrc: String): String =
    s"""d AS (
       |  SELECT $keyCols,
       |    least(greatest(p2x*p3x + p2y*p3y + p2z*p3z, -1.0), 1.0) AS csa,
       |    least(greatest(p1x*p3x + p1y*p3y + p1z*p3z, -1.0), 1.0) AS csb,
       |    least(greatest(p1x*p2x + p1y*p2y + p1z*p2z, -1.0), 1.0) AS csc
       |  FROM $triSrc),
       |ang AS (
       |  SELECT $keyCols,
       |    acos(least(greatest((csa - csb*csc) / (sin(acos(csb)) * sin(acos(csc))), -1.0), 1.0))
       |  + acos(least(greatest((csb - csa*csc) / (sin(acos(csa)) * sin(acos(csc))), -1.0), 1.0))
       |  + acos(least(greatest((csc - csa*csb) / (sin(acos(csa)) * sin(acos(csb))), -1.0), 1.0))
       |  - pi() AS excess
       |  FROM d)""".stripMargin

  private def c3Triangles: Seq[(Long, IndexedSeq[Vec3])] =
    (1 to 64).map(i => (i.toLong, Generators.sphereXyz(3, seed = i.toLong)))

  /** C3 — spherical triangle areas per row (`geom.py:243-267`), rounded
    * to 6 decimals so the kernel (L'Huilier) and the oracle (Girard)
    * agree despite last-ulp differences. */
  val c3TriangleArea: QFn = (s, d) => {
    import s.implicits._
    val rows = c3Triangles.map { case (i, vs) =>
      (i, Geom.triangleArea(vs(0), vs(1), vs(2)))
    }
    rows.toDF("triangle_id", "area")
      .withColumn("area", round(col("area"), 6))
      .orderBy(col("triangle_id"))
  }
  val c3Sql: String = {
    val values = c3Triangles.map { case (i, vs) =>
      s"($i, ${vs(0).x}, ${vs(0).y}, ${vs(0).z}, ${vs(1).x}, ${vs(1).y}, ${vs(1).z}, ${vs(2).x}, ${vs(2).y}, ${vs(2).z})"
    }.mkString(",\n  ")
    s"""WITH v(triangle_id, p1x, p1y, p1z, p2x, p2y, p2z, p3x, p3y, p3z) AS (VALUES
       |  $values),
       |${girardStages("triangle_id", "v")}
       |SELECT triangle_id, round(excess, 6) AS area
       |FROM ang ORDER BY triangle_id""".stripMargin
  }

  private def a9Tiles: IndexedSeq[Tile] = {
    val pointing = Vec3(0.2, -0.5, -0.8).normalized
    Tiles.squareTiles(pointing, math.toRadians(3.52), 8)
  }

  /** A9 — polygon area as sum over fan triangles (`geom.py:225-240`),
    * rounded to 6 decimals (kernel L'Huilier vs oracle Girard). */
  val a9PolyArea: QFn = (s, d) => {
    import s.implicits._
    val rows = a9Tiles.map { t => (t.id.toLong, t.ix, t.iy, t.polygon.area) }
    rows.toDF("tile_id", "ix", "iy", "area")
      .withColumn("area", round(col("area"), 6))
      .orderBy(col("tile_id"))
  }
  val a9Sql: String = {
    val values = a9Tiles.map { t =>
      val vs = t.polygon.vertices
      val coords = vs.map(v => s"${v.x}, ${v.y}, ${v.z}").mkString(", ")
      s"(${t.id}, ${t.ix}, ${t.iy}, $coords)"
    }.mkString(",\n  ")
    s"""WITH v(tile_id, ix, iy, x0, y0, z0, x1, y1, z1, x2, y2, z2, x3, y3, z3) AS (VALUES
       |  $values),
       |tri AS (
       |  SELECT tile_id, x0 AS p1x, y0 AS p1y, z0 AS p1z,
       |         x1 AS p2x, y1 AS p2y, z1 AS p2z, x2 AS p3x, y2 AS p3y, z2 AS p3z
       |  FROM v
       |  UNION ALL
       |  SELECT tile_id, x0, y0, z0, x2, y2, z2, x3, y3, z3 FROM v),
       |${girardStages("tile_id", "tri")}
       |SELECT v.tile_id, v.ix, v.iy, round(s.area, 6) AS area
       |FROM (SELECT tile_id, SUM(excess) AS area FROM ang GROUP BY tile_id) s
       |JOIN v ON v.tile_id = s.tile_id
       |ORDER BY v.tile_id""".stripMargin
  }

  private def c4Tiles: IndexedSeq[Tile] = {
    val pointing = Vec3(0.2, -0.5, -0.8).normalized
    Tiles.cameraTiles(pointing, math.toRadians(3.52), 2)
  }

  /** C4 — tile mosaic generation (`geom.py:59-222`): emit the tiles
    * table with centers; counts pinned by GeomSpec, center math
    * re-derived independently by the SQL oracle from the inlined
    * corner vertices. */
  val c4MakeTiles: QFn = (s, d) => {
    import s.implicits._
    val rows = c4Tiles.map { t =>
      val c = t.polygon.vertices.reduce(_ + _).normalized
      val (ra, dec) = c.toRaDec
      (t.id.toLong, t.ix, t.iy, ra, dec)
    }
    rows.toDF("tile_id", "ix", "iy", "center_ra", "center_dec")
      .withColumn("center_ra", round(col("center_ra"), 6))
      .withColumn("center_dec", round(col("center_dec"), 6))
      .orderBy(col("tile_id"))
  }
  /** Oracle recomputes centers from corner vertices: normalized vertex
    * sum → atan2/asin degrees (ra wrapped to [0, 360)), rounded like c1. */
  val c4Sql: String = {
    val values = c4Tiles.map { t =>
      val vs = t.polygon.vertices
      val coords = vs.map(v => s"${v.x}, ${v.y}, ${v.z}").mkString(", ")
      s"(${t.id}, ${t.ix}, ${t.iy}, $coords)"
    }.mkString(",\n  ")
    s"""WITH v(tile_id, ix, iy, x0, y0, z0, x1, y1, z1, x2, y2, z2, x3, y3, z3) AS (VALUES
       |  $values),
       |c AS (
       |  SELECT tile_id, ix, iy,
       |    (x0 + x1 + x2 + x3) AS sx, (y0 + y1 + y2 + y3) AS sy,
       |    (z0 + z1 + z2 + z3) AS sz
       |  FROM v)
       |SELECT tile_id, ix, iy,
       |  round(CASE WHEN degrees(atan2(sy, sx)) < 0
       |    THEN degrees(atan2(sy, sx)) + 360.0
       |    ELSE degrees(atan2(sy, sx)) END, 6) AS center_ra,
       |  round(degrees(asin(sz / sqrt(sx*sx + sy*sy + sz*sz))), 6) AS center_dec
       |FROM c ORDER BY tile_id""".stripMargin
  }

  /** C5 — seeded point generators (`generators.py:33-91`): emit the
    * generated catalogs (hemisphere + cone) with ground-truth invariant
    * flags. The Spark side asserts `true`; the DuckDB oracle RE-DERIVES
    * each invariant from the inlined coordinates (unit norm via
    * x²+y²+z², hemisphere sign, cone containment via the axis dot) — a
    * kernel bug flips the oracle's flag and hash-mismatches, the same
    * independent-recomputation pattern as c3/c4/a9. Coordinates
    * round-trip bit-exactly through Double.toString → SQL literal. */
  private val c5SpherePts = Generators.sphereXyz(1000, hemi = -1, seed = 42L)
  private val c5Axis = Vec3(0.4, -0.3, 0.86).normalized
  private val c5Open = math.toRadians(10) // full opening angle
  private val c5ZMin = math.cos(c5Open / 2)
  private val c5ConePts = Generators.coneXyz(c5Axis, c5Open, 500, seed = 99L)
  val c5Generators: QFn = (s, d) => {
    import s.implicits._
    val rows =
      c5SpherePts.zipWithIndex.map { case (v, i) =>
        ("sphere", i.toLong, v.x, v.y, v.z, true, true)
      } ++ c5ConePts.zipWithIndex.map { case (v, i) =>
        ("cone", i.toLong, v.x, v.y, v.z, true, true)
      }
    rows.toDF("kind", "source_idx", "x", "y", "z", "unit_norm", "in_region")
      .orderBy(col("kind"), col("source_idx"))
  }
  val c5Sql: String = {
    def vals(kind: String, pts: IndexedSeq[Vec3]): String =
      pts.zipWithIndex.map { case (v, i) =>
        s"('$kind', CAST($i AS BIGINT), CAST(${v.x} AS DOUBLE), CAST(${v.y} AS DOUBLE), CAST(${v.z} AS DOUBLE))"
      }.mkString(",\n  ")
    s"""SELECT kind, source_idx, x, y, z,
       |  round(x*x + y*y + z*z, 9) = 1.0 AS unit_norm,
       |  CASE WHEN kind = 'sphere' THEN z <= 0.0
       |       ELSE (CAST(${c5Axis.x} AS DOUBLE)*x + CAST(${c5Axis.y} AS DOUBLE)*y
       |             + CAST(${c5Axis.z} AS DOUBLE)*z) >= CAST(${c5ZMin} AS DOUBLE) - 1e-9
       |  END AS in_region
       |FROM (VALUES
       |  ${vals("sphere", c5SpherePts)},
       |  ${vals("cone", c5ConePts)}) AS t(kind, source_idx, x, y, z)
       |ORDER BY kind, source_idx""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "f1_cone_filter" -> f1ConeFilter,
    "f3_region_mask" -> f3RegionMask,
    "f4_region_filter" -> f4RegionFilter,
    "c1_xyz_to_radec" -> c1XyzToRadec,
    "j3_pixel_range_join" -> j3PixelRangeJoin,
    "j3_range_join_htm" -> j3RangeJoinHtm,
    "j3_range_join_q3c" -> j3RangeJoinQ3c,
    "j4_tile_pixel_overlap" -> j4TilePixelOverlap,
    "a8_mc_summary" -> a8McSummary,
    "u3_camera_tiles" -> u3CameraTiles,
    "c2_rotation" -> c2Rotation,
    "c3_triangle_area" -> c3TriangleArea,
    "a9_poly_area" -> a9PolyArea,
    "c4_make_tiles" -> c4MakeTiles,
    "c5_generators" -> c5Generators,
  )

  val oracleSql: Map[String, String] = Map(
    "f1_cone_filter" -> f1Sql,
    "f3_region_mask" -> f3Sql,
    "f4_region_filter" -> f4Sql,
    "c1_xyz_to_radec" -> c1Sql,
    "j3_pixel_range_join" -> j3Sql,
    "j3_range_join_htm" -> j3HtmSql,
    "j3_range_join_q3c" -> j3Q3cSql,
    "j4_tile_pixel_overlap" -> j4Sql,
    "a8_mc_summary" -> a8Sql,
    "u3_camera_tiles" -> u3Sql,
    "c2_rotation" -> c2Sql,
    "c3_triangle_area" -> c3Sql,
    "a9_poly_area" -> a9Sql,
    "c4_make_tiles" -> c4Sql,
    "c5_generators" -> c5Sql,
  )
}
