package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert curve: exhaustive small-grid correctness (bijection,
  * unit-step adjacency — the property Morton lacks), boxRanges
  * exactness, the measured locality advantage over the z cover, and
  * the write→SQL→prune path through [[HilbertLayout]] + [[ZPruneRule]].
  */
class HilbertSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("index is a bijection with unit-step adjacency (exhaustive, 32x32)") {
    val bits = 5
    val n = 1 << bits
    val cellOf = Array.fill[(Long, Long)](n * n)(null)
    for (x <- 0L until n; y <- 0L until n) {
      val d = HilbertCurve.index(x, y, bits)
      assert(d >= 0 && d < n.toLong * n, s"index($x,$y)=$d out of range")
      assert(cellOf(d.toInt) == null, s"index collision at d=$d")
      cellOf(d.toInt) = (x, y)
    }
    // THE Hilbert property: consecutive curve positions are grid
    // neighbors — |dx| + |dy| = 1 at every single step. (The z curve
    // fails this at every power-of-two boundary.)
    for (d <- 1 until n * n) {
      val (x0, y0) = cellOf(d - 1)
      val (x1, y1) = cellOf(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-unit step at d=$d: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("boxRanges covers exactly the box (uncoarsened), sorted disjoint") {
    val bits = 5
    val rng = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val xLo = rng.nextInt(32).toLong; val xHi = xLo + rng.nextInt(32 - xLo.toInt)
      val yLo = rng.nextInt(32).toLong; val yHi = yLo + rng.nextInt(32 - yLo.toInt)
      val ranges = HilbertCurve.boxRanges(xLo, xHi, yLo, yHi,
        maxRanges = Int.MaxValue, bits = bits)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 < l2, "unsorted or touching")
        case _ =>
      }
      val area = (xHi - xLo + 1) * (yHi - yLo + 1)
      assert(ranges.map { case (l, h) => h - l }.sum == area,
        s"cover volume mismatch for [$xLo,$xHi]x[$yLo,$yHi]")
      for (x <- xLo to xHi; y <- yLo to yHi) {
        val d = HilbertCurve.index(x, y, bits)
        assert(ranges.exists { case (l, h) => d >= l && d < h },
          s"cell ($x,$y) d=$d not covered")
      }
    }
  }

  test("boxRanges exact at the full 31-bit domain (volume + membership)") {
    val rng = new scala.util.Random(23)
    (1 to 40).foreach { _ =>
      // >>> 1 (not math.abs): abs(Long.MinValue) is negative, which would
      // trip boxRanges' domain require on an astronomically unlucky draw
      val xLo = (rng.nextLong() >>> 1) % (HilbertCurve.AxisMax - 40)
      val yLo = (rng.nextLong() >>> 1) % (HilbertCurve.AxisMax - 40)
      val xHi = xLo + rng.nextInt(32); val yHi = yLo + rng.nextInt(32)
      val ranges = HilbertCurve.boxRanges(xLo, xHi, yLo, yHi,
        maxRanges = Int.MaxValue)
      assert(ranges.map { case (l, h) => h - l }.sum ==
        (xHi - xLo + 1) * (yHi - yLo + 1))
      for (x <- xLo to xHi; y <- yLo to yHi) {
        val d = HilbertCurve.index(x, y)
        assert(ranges.exists { case (l, h) => d >= l && d < h })
      }
    }
  }

  test("hilbert boxes need fewer ranges than z boxes (the locality win)") {
    val rng = new scala.util.Random(41)
    var hTotal = 0L
    var zTotal = 0L
    (1 to 100).foreach { _ =>
      val xLo = (rng.nextLong() >>> 1) % (HilbertCurve.AxisMax - 300)
      val yLo = (rng.nextLong() >>> 1) % (HilbertCurve.AxisMax - 300)
      val w = 1 + rng.nextInt(250); val h = 1 + rng.nextInt(250)
      hTotal += HilbertCurve.boxRanges(xLo, xLo + w, yLo, yLo + h,
        maxRanges = Int.MaxValue).size
      zTotal += ZCurve.boxRanges(xLo, xLo + w, yLo, yLo + h,
        maxRanges = Int.MaxValue).size
    }
    info(s"uncoarsened ranges over 100 random boxes: hilbert=$hTotal z=$zTotal" +
      f" (ratio ${zTotal.toDouble / hTotal}%.2f)")
    // the literature's ~2x cluster-count advantage; assert a
    // conservative margin so the test pins direction, not noise
    assert(hTotal * 4 < zTotal * 3,
      s"hilbert $hTotal not <3/4 of z $zTotal")
  }

  test("HilbertLayout + ZPruneRule: plain SQL box query pruned AND exact") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val rows = (0 until 20000).map { i =>
      (i.toLong, rng.nextInt(1024).toLong, rng.nextInt(1024).toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("hprune").toString
    HilbertLayout.cluster(rows.toDF("id", "u", "t"), col("u"), col("t"),
        numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val hField = table.schema("hval")
    assert(hField.metadata.getString(ZOrderLayout.XMetadataKey) == "u")
    assert(hField.metadata.getString(ZOrderLayout.CurveMetadataKey)
      == ZOrderLayout.CurveHilbert)
    table.createOrReplaceTempView("hfacts")

    val q = spark.sql(
      "SELECT id FROM hfacts WHERE u BETWEEN 100 AND 160 AND t >= 200 AND t <= 280")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.matches("(?s).*hval#\\d+L? >=.*"), optimized)
    val scan = q.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.dataFilters.exists(_.references.exists(_.name == "hval")),
      scan.dataFilters.mkString("; "))
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    val want = rows.collect {
      case (id, u, t) if u >= 100 && u <= 160 && t >= 200 && t <= 280 => id
    }.sorted
    assert(got == want && want.nonEmpty)

    // the injected predicate must be HILBERT ranges, not z ranges: a
    // box whose z cover differs from its hilbert cover still returns
    // exactly the naive rows (30 random probes)
    (1 to 30).foreach { _ =>
      val uLo = rng.nextInt(900); val uHi = uLo + rng.nextInt(120)
      val tLo = rng.nextInt(900); val tHi = tLo + rng.nextInt(120)
      val p = spark.sql(
        s"SELECT id FROM hfacts WHERE u >= $uLo AND u <= $uHi AND t >= $tLo AND t <= $tHi")
      assert(p.queryExecution.optimizedPlan.toString
        .matches("(?s).*hval#\\d+L? >=.*"))
      val g = p.collect().map(_.getLong(0)).sorted.toSeq
      val w = rows.collect {
        case (id, u, t) if u >= uLo && u <= uHi && t >= tLo && t <= tHi => id
      }.sorted
      assert(g == w, s"box [$uLo,$uHi]x[$tLo,$tHi]")
    }
  }

  test("hilbert_index SQL function matches the Scala kernel") {
    val rows = spark.sql(
      """SELECT hilbert_index(x, y) AS h, x, y FROM VALUES
        |  (0L, 0L), (1L, 0L), (0L, 1L), (12345L, 67890L),
        |  (2147483646L, 7L) AS t(x, y)""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == HilbertCurve.index(r.getLong(1), r.getLong(2)))
    }
  }
}
