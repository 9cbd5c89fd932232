package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apdb._
import graft.geom._

/** Native expressions + the pixel-prune optimizer rule, end to end:
  * SQL region queries gain pixelId range predicates that reach the
  * parquet scan as pushed filters. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // a fresh session is required: extensions apply at builder time
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

  private lazy val objectsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("objs").toString
    val pix = Pixelization(8)
    val cat = DiaSim.genCatalog(spark, 50000L, hemi = 0, seed = 21)
    val (raC, decC) = SparkGeo.raDec(col("x"), col("y"), col("z"))
    cat.withColumn("ra", raC).withColumn("dec", decC)
      .withColumn("pixelId", SparkGeo.pixelIndex(pix, col("x"), col("y"), col("z")))
      .select("sourceIdx", "ra", "dec", "pixelId")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private val region = Circle(Vec3(0.4, -0.3, 0.86).normalized, math.toRadians(5))

  test("pixel_index expression matches the Scala kernel, codegen on") {
    val df = spark.read.parquet(objectsPath)
      .withColumn("pid2", SpatialFunctions.pixel_index(col("ra"), col("dec")))
    assert(df.where(col("pid2") =!= col("pixelId")).count() == 0)
  }

  test("dot_scaled expression matches the Scala kernel, via column + SQL") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian()),
        Array.fill(64)(rng.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    // column API (codegen'd expression) vs the Dataset kernels' math
    val got = df.select(col("id"),
        SpatialFunctions.dot_scaled(col("a"), col("b")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == graft.queries.DedupQueries.dotScaled(a, b),
        s"row $id diverges from the kernel")
    }
    // SQL surface (injected function) computes the same values
    df.createOrReplaceTempView("vecs")
    val sqlGot = spark.sql("SELECT id, dot_scaled(a, b) AS dot FROM vecs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlGot == got)
    // float input path: cast matches the double path on float-exact data
    val f = Seq((1L, Array(0.5f, -1.25f, 2.0f), Array(4.0f, 0.25f, -0.5f)))
      .toDF("id", "a", "b")
    assert(f.select(SpatialFunctions.dot_scaled(col("a"), col("b")))
      .head.getLong(0) ==
      graft.queries.DedupQueries.dotScaled(
        Array(0.5, -1.25, 2.0), Array(4.0, 0.25, -0.5)))
  }

  test("region_contains expression matches kernel semantics") {
    val df = spark.read.parquet(objectsPath)
    val got = df.where(SpatialFunctions.region_contains(region, col("ra"), col("dec")))
      .select("sourceIdx").collect().map(_.getLong(0)).toSet
    val expected = df.collect().filter { r =>
      region.contains(r.getAs[Double]("ra"), r.getAs[Double]("dec"))
    }.map(_.getAs[Long]("sourceIdx")).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("SQL surface + optimizer rule inject pixelId ranges and push them down") {
    spark.read.parquet(objectsPath).createOrReplaceTempView("objs")
    val lit = RegionCodec.encode(region)
    val df = spark.sql(
      s"SELECT sourceIdx FROM objs WHERE region_contains('$lit', ra, dec)")

    // rule fired: optimized plan constrains pixelId
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("pixelId"),
      s"no pixelId predicate injected:\n$optimized")

    // ranges reached the scan as pushed filters
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("pixelId"),
      s"pixelId not pushed to parquet:\n$physical")

    // and results are identical to the unpruned filter
    val got = df.collect().map(_.getLong(0)).toSet
    val base = spark.read.parquet(objectsPath).collect().filter { r =>
      region.contains(r.getAs[Double]("ra"), r.getAs[Double]("dec"))
    }.map(_.getAs[Long]("sourceIdx")).toSet
    assert(got == base)
  }

  test("rule leaves queries without pixelId or with explicit pixelId alone") {
    // a table with no pixelId column at all (drop() is not enough: the
    // optimizer pushes the filter under the projection and correctly
    // re-exposes the relation's pixelId — which is desirable)
    val noPixPath = java.nio.file.Files.createTempDirectory("nopix").toString
    spark.read.parquet(objectsPath).drop("pixelId")
      .write.mode("overwrite").parquet(noPixPath)
    spark.read.parquet(noPixPath).createOrReplaceTempView("nopix")
    val lit = RegionCodec.encode(region)
    val df = spark.sql(
      s"SELECT sourceIdx FROM nopix WHERE region_contains('$lit', ra, dec)")
    assert(!df.queryExecution.optimizedPlan.toString.contains("pixelId"))
    assert(df.count() > 0)

    // explicit pixelId predicate → no double-injection
    spark.read.parquet(objectsPath).createOrReplaceTempView("objs2")
    val df2 = spark.sql(
      s"SELECT sourceIdx FROM objs2 WHERE region_contains('$lit', ra, dec) AND pixelId >= 0")
    // exactly the user's own predicate, no injected ranges on top
    val cnt = "pixelId#\\d+L? >=".r
      .findAllIn(df2.queryExecution.optimizedPlan.toString).length
    assert(cnt == 1, s"expected exactly the explicit pixelId predicate, found $cnt")
    assert(df2.count() > 0)
  }

  test("rule skips non-Long pixelId, level mismatch, cross-relation joins") {
    val lit = RegionCodec.encode(region)

    // (a) a table whose pixelId column is a string ON DISK: no injection
    // (the column cannot be a graft pixel index; a projection-level cast
    // would be pushed through, so the variant is materialized)
    val strPath = java.nio.file.Files.createTempDirectory("strpix").toString
    spark.read.parquet(objectsPath)
      .withColumn("pixelId", col("pixelId").cast("string"))
      .write.mode("overwrite").parquet(strPath)
    spark.read.parquet(strPath).createOrReplaceTempView("strpix")
    val dfStr = spark.sql(
      s"SELECT sourceIdx FROM strpix WHERE region_contains('$lit', ra, dec)")
    val strPreds = "pixelId#\\d+L? >=".r
      .findAllIn(dfStr.queryExecution.optimizedPlan.toString).length
    assert(strPreds == 0, "rule injected ranges on a string pixelId")
    assert(dfStr.count() > 0)

    // (b) a pixelId genuinely computed AND labeled at a different level
    // (field metadata round-trips through parquet): the column's
    // recorded level wins over the session default — ranges are injected
    // in the level-12 id space and the result is exactly the unpruned
    // region filter (an envelope at the session's level 8 over these ids
    // would drop qualifying rows)
    val pix12 = Pixelization(12)
    val cat12 = DiaSim.genCatalog(spark, 50000L, hemi = 0, seed = 21)
    val (ra12, dec12) = SparkGeo.raDec(col("x"), col("y"), col("z"))
    val lvlPath = java.nio.file.Files.createTempDirectory("lvl12").toString
    cat12.withColumn("ra", ra12).withColumn("dec", dec12)
      .withColumn("pixelId",
        SparkGeo.pixelIndex(pix12, col("x"), col("y"), col("z"))
          .as("pixelId", new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(PixelPruneRule.LevelMetadataKey, 12L).build()))
      .select("sourceIdx", "ra", "dec", "pixelId")
      .write.mode("overwrite").parquet(lvlPath)
    spark.read.parquet(lvlPath).createOrReplaceTempView("lvl12")
    val dfLvl = spark.sql(
      s"SELECT sourceIdx FROM lvl12 WHERE region_contains('$lit', ra, dec)")
    val lvlPreds = "pixelId#\\d+L? >=".r
      .findAllIn(dfLvl.queryExecution.optimizedPlan.toString).length
    assert(lvlPreds > 0, "rule did not inject ranges at the column's level")
    val lvlExpected = spark.read.parquet(lvlPath).collect().filter { r =>
      region.contains(r.getAs[Double]("ra"), r.getAs[Double]("dec"))
    }.map(_.getAs[Long]("sourceIdx")).toSet
    val lvlGot = dfLvl.collect().map(_.getLong(0)).toSet
    assert(lvlGot == lvlExpected,
      "level-12 pruning changed the region result")

    // (b2) an unknown scheme label → not prunable, no injection (the
    // rule must never guess an id space; and never throw mid-optimizer)
    val unkPath = java.nio.file.Files.createTempDirectory("unkscheme").toString
    spark.read.parquet(objectsPath)
      .withColumn("pixelId", col("pixelId")
        .as("pixelId", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(PixelPruneRule.LevelMetadataKey, 8L)
          .putString(PixelPruneRule.ModeMetadataKey, "healpix").build()))
      .write.mode("overwrite").parquet(unkPath)
    spark.read.parquet(unkPath).createOrReplaceTempView("unkscheme")
    val dfUnk = spark.sql(
      s"SELECT sourceIdx FROM unkscheme WHERE region_contains('$lit', ra, dec)")
    val unkPreds = "pixelId#\\d+L? >=".r
      .findAllIn(dfUnk.queryExecution.optimizedPlan.toString).length
    assert(unkPreds == 0, "rule injected ranges for an unknown scheme")
    assert(dfUnk.count() > 0)

    // (c) join output carrying pixelId from the NON-spatial side: the
    // region predicate's ra/dec resolve to a different leaf than
    // pixelId → no injection (pruning by the other table's pixelId
    // would silently drop qualifying rows). The foreign pixelId is a
    // constant OUTSIDE every envelope range, so a wrongly-injected
    // predicate would empty the result — checked behaviorally.
    val coordsPath = java.nio.file.Files.createTempDirectory("coords").toString
    spark.read.parquet(objectsPath).select("sourceIdx", "ra", "dec")
      .write.mode("overwrite").parquet(coordsPath)
    val otherPath = java.nio.file.Files.createTempDirectory("otherpix").toString
    spark.read.parquet(objectsPath)
      .select(col("sourceIdx"),
        org.apache.spark.sql.functions.lit(-1L).as("pixelId"))
      .write.mode("overwrite").parquet(otherPath)
    spark.read.parquet(coordsPath).createOrReplaceTempView("coords")
    spark.read.parquet(otherPath).createOrReplaceTempView("otherpix")
    val dfJoin = spark.sql(
      s"""SELECT c.sourceIdx FROM coords c JOIN otherpix o
         |ON c.sourceIdx = o.sourceIdx
         |WHERE region_contains('$lit', c.ra, c.dec)""".stripMargin)
    val expected = spark.read.parquet(objectsPath)
      .where(SpatialFunctions.region_contains(region, col("ra"), col("dec")))
      .count()
    assert(dfJoin.count() == expected,
      "join with a foreign pixelId column changed the region result")
  }

  test("sky_pixel_index SQL function matches the scheme kernels") {
    spark.read.parquet(objectsPath).createOrReplaceTempView("objs_sky")
    for (mode <- Seq("htm", "q3c", "mq3c")) {
      val pix = SkyPixelization(mode, 8)
      val got = spark.sql(
        s"""SELECT sourceIdx, ra, dec,
           |  sky_pixel_index(cos(radians(dec)) * cos(radians(ra)),
           |                  cos(radians(dec)) * sin(radians(ra)),
           |                  sin(radians(dec)), '$mode', 8) AS pid
           |FROM objs_sky LIMIT 500""".stripMargin).collect()
      got.foreach { r =>
        val v = Vec3.fromRaDec(r.getDouble(1), r.getDouble(2))
        assert(r.getLong(3) == pix.index(v),
          s"$mode mismatch for source ${r.getLong(0)}")
      }
    }
  }

  test("sketch aggregates: typed inputs cast at analysis, bad types fail clean") {
    import spark.implicits._
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
      .createOrReplaceTempView("sk_types")
    // INT value to streaming_histogram / DECIMAL key to topk_sample:
    // implicit casts, not executor ClassCastExceptions
    val h = spark.sql(
      "SELECT streaming_histogram(v, 8) FROM sk_types").collect()
    assert(h.head.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)).sum == 3L)
    val t = spark.sql(
      """SELECT topk_sample(CAST(v AS DECIMAL(10,2)), CAST(v AS INT),
        |  CAST(v AS INT), 2) FROM sk_types""".stripMargin).collect()
    assert(t.head.getSeq[org.apache.spark.sql.Row](0).nonEmpty)
    // a non-castable argument is an ANALYSIS error naming the function,
    // thrown at sql() time — never a runtime CCE mid-job
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT streaming_histogram(named_struct('a', v), 8) " +
        "FROM sk_types").collect()
    }
    assert(e.getMessage.toLowerCase.contains("streaming_histogram"))
  }

  test("region codec round-trips through base64 (C12)") {
    val poly = SphericalPolygon(IndexedSeq(
      Vec3(1, 0, 0), Vec3(0, 1, 0), Vec3(0, 0, 1)))
    for (r <- Seq[Region](region, poly)) {
      val b64 = RegionCodec.encodeB64(r)
      assert(!b64.contains(":")) // opaque transport form
      val back = RegionCodec.decodeB64(b64)
      assert(RegionCodec.encode(back) == RegionCodec.encode(r))
    }
  }

  test("rule does NOT prune negated or disjunctive region predicates") {
    spark.read.parquet(objectsPath).createOrReplaceTempView("objs3")
    val lit = RegionCodec.encode(region)
    // NOT region_contains: almost everything qualifies; injection would
    // shrink the result to the envelope
    val neg = spark.sql(
      s"SELECT count(*) AS n FROM objs3 WHERE NOT region_contains('$lit', ra, dec)")
    assert(!neg.queryExecution.optimizedPlan.toString.matches("(?s).*pixelId#\\d+L? >=.*"))
    val total = spark.read.parquet(objectsPath).count()
    val inRegion = spark.sql(
      s"SELECT count(*) AS n FROM objs3 WHERE region_contains('$lit', ra, dec)")
      .head.getLong(0)
    assert(neg.head.getLong(0) == total - inRegion)

    // OR with an unrelated predicate: injection would drop matches of
    // the other disjunct outside the envelope
    val disj = spark.sql(
      s"SELECT count(*) AS n FROM objs3 WHERE region_contains('$lit', ra, dec) OR sourceIdx < 100")
    assert(!disj.queryExecution.optimizedPlan.toString.matches("(?s).*pixelId#\\d+L? >=.*"))
    assert(disj.head.getLong(0) >= 100)
  }

  test("ZPruneRule: plain SQL box queries on a z-clustered table gain z ranges") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val rows = (0 until 20000).map { i =>
      (i.toLong, rng.nextInt(1024).toLong, rng.nextInt(1024).toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("zprune").toString
    ZOrderLayout.cluster(rows.toDF("id", "u", "t"), col("u"), col("t"),
        numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    // metadata must survive the parquet round-trip
    val table = spark.read.parquet(dir)
    val zField = table.schema("zval")
    assert(zField.metadata.getString(ZOrderLayout.XMetadataKey) == "u")
    assert(zField.metadata.getString(ZOrderLayout.YMetadataKey) == "t")
    table.createOrReplaceTempView("zfacts")

    val q = spark.sql(
      "SELECT id FROM zfacts WHERE u BETWEEN 100 AND 160 AND t >= 200 AND t <= 280")
    // the optimizer injected zval range predicates...
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.matches("(?s).*zval#\\d+L? >=.*"), optimized)
    // ...they reach the scan as pushed data filters...
    val scan = q.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.dataFilters.exists(_.references.exists(_.name == "zval")),
      scan.dataFilters.mkString("; "))
    // ...and the answer equals the un-pruned one
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    val want = rows.collect {
      case (id, u, t) if u >= 100 && u <= 160 && t >= 200 && t <= 280 => id
    }.sorted
    assert(got == want && want.nonEmpty)

    // soundness: an OR-ed box must NOT gain ranges
    val disj = spark.sql(
      "SELECT id FROM zfacts WHERE (u BETWEEN 100 AND 160 AND t BETWEEN 200 AND 280) OR id < 5")
    assert(!disj.queryExecution.optimizedPlan.toString.matches("(?s).*zval#\\d+L? >=.*"))
    assert(disj.collect().length == want.length + 5 -
      want.count(_ < 5))
  }

  test("ZPruneRule property: 60 random boxes — pruned always equals naive") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = (0 until 8000).map { i =>
      (i.toLong, rng.nextInt(700).toLong, rng.nextInt(700).toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("zprop").toString
    ZOrderLayout.cluster(rows.toDF("id", "u", "t"), col("u"), col("t"), 4)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("zprop")
    (1 to 60).foreach { _ =>
      val uLo = rng.nextInt(800); val uHi = uLo + rng.nextInt(200)
      val tLo = rng.nextInt(800); val tHi = tLo + rng.nextInt(200)
      val q = spark.sql(
        s"SELECT id FROM zprop WHERE u >= $uLo AND u <= $uHi AND t >= $tLo AND t <= $tHi")
      // the rule must have fired (both axes bounded, non-empty domain box)
      assert(q.queryExecution.optimizedPlan.toString.matches("(?s).*zval#\\d+L? >=.*"),
        s"rule did not fire for box [$uLo,$uHi]x[$tLo,$tHi]")
      val got = q.collect().map(_.getLong(0)).sorted.toSeq
      val want = rows.collect {
        case (id, u, t) if u >= uLo && u <= uHi && t >= tLo && t <= tHi => id
      }.sorted
      assert(got == want, s"box [$uLo,$uHi]x[$tLo,$tHi]: ${got.size} vs ${want.size}")
    }
  }

  test("z_interleave SQL function matches the Scala kernel") {
    val rows = spark.sql(
      """SELECT z_interleave(x, y) AS z, x, y FROM VALUES
        |  (0L, 0L), (1L, 0L), (0L, 1L), (12345L, 67890L) AS t(x, y)""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == ZCurve.interleave(r.getLong(1), r.getLong(2)))
    }
  }

  test("sketch aggregates are callable from SQL") {
    spark.sql(
      """SELECT explode(space_saving_topk(w, 16)) AS e FROM (
        |  SELECT explode(split('a a a b b c', ' ')) AS w)""".stripMargin)
      .select("e.item", "e.cnt").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq match {
      case got => assert(got == Seq(("a", 3L), ("b", 2L), ("c", 1L)), got)
    }
    val hist = spark.sql(
      """SELECT explode(streaming_histogram(v, 16)) AS b FROM (
        |  SELECT explode(array(5L, 5L, 1L, 9L)) AS v)""".stripMargin)
      .select("b.value", "b.cnt").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(hist == Seq((1.0, 1L), (5.0, 2L), (9.0, 1L)), hist)
    val topk = spark.sql(
      """SELECT explode(topk_sample(k, id, w, 2)) AS e FROM (VALUES
        |  (0.5D, 1L, 10L), (0.9D, 2L, 20L), (0.9D, 3L, 30L), (0.1D, 4L, 40L)
        |) AS t(k, id, w)""".stripMargin)
      .select("e.sample_key", "e.doc_id", "e.weight").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(topk == Seq((0.9, 2L, 20L), (0.9, 3L, 30L)), topk)
    // non-constant capacity must fail fast, not misbehave
    val err = intercept[Exception] {
      spark.sql("SELECT space_saving_topk(w, length(w)) FROM (SELECT 'x' AS w)")
        .collect()
    }
    assert(err.getMessage.contains("capacity"), err.getMessage)
  }

  test("bounded_levenshtein: exact within bound, clamped above, SQL-registered") {
    // reference full DP
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val rnd = new scala.util.Random(7)
    def str() = (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    import org.apache.spark.unsafe.types.UTF8String
    for (_ <- 1 to 3000; k <- 0 to 3) {
      val (a, b) = (str(), str())
      val got = StringKernel.boundedLev(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      val want = math.min(lev(a, b), k + 1)
      assert(got == want, s"boundedLev('$a','$b',$k) = $got, want $want")
    }
    // SQL registration + codegen path
    val rows = spark.sql(
      """SELECT bounded_levenshtein(a, b, 1) AS d FROM (VALUES
        |  ('kitten', 'sitten'), ('kitten', 'mittens'), ('abc', 'abc')
        |) AS t(a, b)""".stripMargin).collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 2, 0), rows)
    // non-literal bound fails fast
    val e2 = intercept[Exception] {
      spark.sql("SELECT bounded_levenshtein('a', 'b', length('ab'))").collect()
    }
    assert(e2.getMessage.contains("bounded_levenshtein"), e2.getMessage)
    // code POINTS, not UTF-16 units: a supplementary-plane char is one
    // edit away from an ASCII char (two code units would say two)
    assert(StringKernel.boundedLev(
      UTF8String.fromString("😀"), UTF8String.fromString("a"), 1)
      == 1)
    // the k=1 fast path (r16) has a separate codepoint branch for
    // non-ASCII input — property-check it against the reference DP
    // over a mixed alphabet including a supplementary-plane char
    def levCp(a: String, b: String): Int = {
      val ac = a.codePoints.toArray; val bc = b.codePoints.toArray
      val dp = Array.tabulate(ac.length + 1)(i => i)
      for (j <- 1 to bc.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to ac.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (ac(i - 1) == bc(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(ac.length)
    }
    val alpha = Seq("a", "b", "é", "漢", new String(Character.toChars(0x1F600)))
    def mstr() = (0 until rnd.nextInt(7)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 3000) {
      val (a, b) = (mstr(), mstr())
      val got = StringKernel.boundedLev(
        UTF8String.fromString(a), UTF8String.fromString(b), 1)
      val want = math.min(levCp(a, b), 2)
      assert(got == want, s"boundedLev k=1 '$a'/'$b' = $got, want $want")
    }
  }
}
