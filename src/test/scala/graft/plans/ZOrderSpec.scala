package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-curve kernel properties + the layout payoff: partition pruning on
  * a z-bucketed table. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("maxRanges conf: defaults, parses, and rejects bad values by name") {
    assert(ZPruneRule.maxRanges == 32) // default
    try {
      spark.conf.set("graft.zorder.maxRanges", " 48 ")
      assert(ZPruneRule.maxRanges == 48)
      for (bad <- Seq("abc", "0", "-3")) {
        spark.conf.set("graft.zorder.maxRanges", bad)
        val e = intercept[IllegalArgumentException](ZPruneRule.maxRanges)
        assert(e.getMessage.contains("graft.zorder.maxRanges"),
          s"error for '$bad' must name the conf key: ${e.getMessage}")
      }
    } finally spark.conf.unset("graft.zorder.maxRanges")
  }

  test("interleave bit layout: x on even bits, y on odd bits") {
    assert(ZCurve.interleave(0, 0) == 0L)
    assert(ZCurve.interleave(1, 0) == 1L)
    assert(ZCurve.interleave(0, 1) == 2L)
    assert(ZCurve.interleave(3, 3) == 15L)
    assert(ZCurve.interleave(0xFFFFFFFFL, 0) == 0x5555555555555555L)
    assert(ZCurve.interleave(0, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // round-trip per-bit check on pseudo-random values
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val x = rng.nextLong() & 0xFFFFFFFFL
      val y = rng.nextLong() & 0xFFFFFFFFL
      val z = ZCurve.interleave(x, y)
      (0 until 32).foreach { i =>
        assert(((z >> (2 * i)) & 1L) == ((x >> i) & 1L))
        assert(((z >> (2 * i + 1)) & 1L) == ((y >> i) & 1L))
      }
    }
  }

  test("boxRanges covers exactly the box (uncoarsened) and never drops points") {
    val rng = new scala.util.Random(11)
    (1 to 30).foreach { _ =>
      val xLo = rng.nextInt(1000).toLong
      val yLo = rng.nextInt(1000).toLong
      val xHi = xLo + rng.nextInt(40)
      val yHi = yLo + rng.nextInt(40)
      // maxRanges huge -> exact cover: membership must be equivalence
      val exact = ZCurve.boxRanges(xLo, xHi, yLo, yHi, maxRanges = 1 << 20)
      // sorted + disjoint
      exact.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 <= l2)
        case _ =>
      }
      def inRanges(rs: Seq[(Long, Long)], z: Long) =
        rs.exists { case (lo, hi) => z >= lo && z < hi }
      // total covered cells == box area (exact cover, no overlap)
      assert(exact.map { case (lo, hi) => hi - lo }.sum ==
        (xHi - xLo + 1) * (yHi - yLo + 1))
      (1 to 50).foreach { _ =>
        val px = rng.nextInt(2000).toLong
        val py = rng.nextInt(2000).toLong
        val z = ZCurve.interleave(px, py)
        val inBox = px >= xLo && px <= xHi && py >= yLo && py <= yHi
        assert(inRanges(exact, z) == inBox, s"($px,$py) box=$inBox")
      }
      // high-coordinate regime: boxes hugging the 31-bit axis ceiling
      // must produce positive, sorted, exact covers (a 32-bit domain
      // overflowed the top quadrant's bound to Long.MinValue here)
      val m = ZCurve.AxisMax
      val hiBox = ZCurve.boxRanges(m - 40, m, m - 25, m, maxRanges = 1 << 20)
      assert(hiBox.forall { case (lo, hi) => lo >= 0 && hi > lo })
      assert(hiBox.map { case (lo, hi) => hi - lo }.sum == 41L * 26L)
      assert(hiBox.exists { case (lo, hi) =>
        ZCurve.interleave(m, m) >= lo && ZCurve.interleave(m, m) < hi })

      // coarsened cover: strictly a superset (prune-then-refine soundness)
      val coarse = ZCurve.boxRanges(xLo, xHi, yLo, yHi, maxRanges = 4)
      assert(coarse.size <= 4)
      (xLo to xHi).foreach { px =>
        (yLo to yHi).foreach { py =>
          assert(inRanges(coarse, ZCurve.interleave(px, py)))
        }
      }
    }
  }

  test("ZOrderLayout.cluster: output partitions own disjoint curve segments") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val df = (0 until 8000)
      .map(i => (i.toLong, rng.nextInt(512).toLong, rng.nextInt(512).toLong))
      .toDF("id", "u", "t")
    val clustered = ZOrderLayout.cluster(df, col("u"), col("t"), numFiles = 8)
    val ranges = clustered
      .mapPartitions { it =>
        val zs = it.map(_.getAs[Long]("zval")).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.min, zs.max, zs.sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        }))
      }.collect()
    assert(ranges.nonEmpty)
    ranges.foreach { case (_, _, sorted) => assert(sorted, "not sorted in-file") }
    // disjoint: sort by min, each next min must exceed previous max
    val byMin = ranges.sortBy(_._1)
    byMin.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("ZOrderLayout.cluster rejects out-of-domain coordinates at write time") {
    import spark.implicits._
    val bad = Seq((1L, -3L, 10L), (2L, 5L, 7L)).toDF("id", "u", "t")
    val e = intercept[Exception] {
      ZOrderLayout.cluster(bad, col("u"), col("t"), numFiles = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("outside [0, 2^31)")), e.toString)
    // the sign-bit regime must also be rejected: y = 2^31 would put the
    // interleaved code's top bit at z bit 63 (negative longs that break
    // every signed range comparison downstream)
    import spark.implicits._
    val big = Seq((1L, 5L, 1L << 31), (2L, 5L, 7L)).toDF("id", "u", "t")
    val e2 = intercept[Exception] {
      ZOrderLayout.cluster(big, col("u"), col("t"), numFiles = 2).collect()
    }
    assert(messages(e2).exists(_.contains("outside [0, 2^31)")), e2.toString)
  }

  test("z-bucketed layout prunes files for a box query") {
    import spark.implicits._
    val n = 20000
    val rng = new scala.util.Random(3)
    val rows = (0 until n).map { i =>
      (i.toLong, rng.nextInt(1024).toLong, rng.nextInt(1024).toLong)
    }
    val df = rows.toDF("id", "u", "t")
      .withColumn("z", SpatialFunctions.z_interleave(col("u"), col("t")))
      // bucket = top bits of z: each directory partition is one curve
      // segment, so box z-ranges translate to a small partition subset
      .withColumn("z_bucket", expr("z div 65536"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    df.write.partitionBy("z_bucket").mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)

    val (uLo, uHi, tLo, tHi) = (100L, 160L, 200L, 280L)
    val ranges = ZCurve.boxRanges(uLo, uHi, tLo, tHi, maxRanges = 32)
    val bucketPred = ranges.map { case (lo, hi) =>
      col("z_bucket") >= lo / 65536 && col("z_bucket") <= (hi - 1) / 65536
    }.reduce(_ || _)
    val pruned = table.where(bucketPred)
      .where(col("u").between(uLo, uHi) && col("t").between(tLo, tHi))
    val naive = table
      .where(col("u").between(uLo, uHi) && col("t").between(tLo, tHi))

    // identical answers
    assert(pruned.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      naive.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(naive.count() > 0, "box query matched nothing — test data bug")

    // and the z layout actually pruned: the scan touches a fraction of
    // the table's files (partition pruning on z_bucket). sparkPlan, not
    // executedPlan: AQE wraps the latter and hides the scan node
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    val allFiles = table.queryExecution.sparkPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get.relation.location.inputFiles.length
    val scannedFiles = scan.selectedPartitions.totalNumberOfFiles
    assert(scannedFiles * 4 <= allFiles,
      s"z pruning too weak: scanned $scannedFiles of $allFiles files")
  }
}
