package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving heavy-hitters aggregate: exactness at sufficient
  * capacity, the ±n/capacity bound under eviction, and distributed
  * merge agreement with single-pass results. */
class SketchAggSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Zipf-ish deterministic stream: item `i` appears with frequency
    * proportional to its rank. */
  private def stream(n: Int, items: Int): Seq[String] = {
    val rng = new scala.util.Random(42)
    (0 until n).map { _ =>
      // quadratic skew toward low item ids
      val u = rng.nextDouble()
      s"item${(u * u * items).toInt}"
    }
  }

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def runAgg(xs: Seq[String], capacity: Int,
      partitions: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(xs, partitions).toDF("item")
    val out = df.agg(SketchFunctions.spaceSavingTopK(col("item"), capacity).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("exact when capacity >= distinct items (err 0, counts exact)") {
    val xs = stream(20000, 50)
    val truth = trueCounts(xs)
    val got = runAgg(xs, capacity = 128, partitions = 7)
    assert(got.size == truth.size)
    got.foreach { case (item, cnt, err) =>
      assert(err == 0L, s"$item err=$err")
      assert(cnt == truth(item), s"$item cnt=$cnt truth=${truth(item)}")
    }
    // output sorted (cnt desc, item asc)
    assert(got == got.sortBy { case (i, c, _) => (-c, i) })
  }

  test("eviction path keeps the n/capacity guarantee for every entry") {
    val xs = stream(20000, 500) // distinct >> capacity forces evictions
    val truth = trueCounts(xs)
    val cap = 64
    val got = runAgg(xs, cap, partitions = 5)
    assert(got.size == cap)
    // 5 partitions of a 20k stream: each summary's overestimation is at
    // most its partition's n/cap, so the merged bound is n/cap overall
    val bound = xs.size.toLong / cap
    got.foreach { case (item, cnt, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(cnt >= t, s"$item upper bound $cnt < true $t") // never undercount
      assert(cnt - t <= bound, s"$item overcount ${cnt - t} > $bound")
      assert(err <= bound, s"$item err $err > $bound")
      assert(cnt - err <= t, s"$item guaranteed floor ${cnt - err} > true $t")
    }
    // the true top-5 heavy hitters must all survive (their counts far
    // exceed the error bound by construction of the skewed stream)
    val top5 = truth.toSeq.sortBy(-_._2).take(5).map(_._1).toSet
    assert(top5.subsetOf(got.map(_._1).toSet))
  }

  test("boundary: at-capacity lossless summaries merge with floor 0") {
    import spark.implicits._
    // two partitions, each holding exactly `cap` distinct items with NO
    // evictions: the merge must treat them as lossless (floor 0) — were
    // fullness inferred from size==capacity, every count would inflate
    // by the other side's min and the survivors' errors would be wrong
    val cap = 50
    val p1 = (0 until cap).flatMap(i => Seq.fill(i + 2)(s"a$i"))
    val p2 = (0 until cap).flatMap(i => Seq.fill(i + 2)(s"b$i"))
    val truth = trueCounts(p1 ++ p2)
    val df = spark.sparkContext.parallelize(Seq(p1, p2), 2)
      .flatMap(identity).toDF("item")
    val got = df.agg(SketchFunctions.spaceSavingTopK(col("item"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == cap) // union of 100 truncated to capacity
    got.foreach { case (item, cnt, err) =>
      assert(err == 0L, s"$item err=$err")
      assert(cnt == truth(item), s"$item cnt=$cnt truth=${truth(item)}")
    }
  }

  test("merge of partitioned summaries equals single-partition run when exact") {
    val xs = stream(5000, 40)
    val one = runAgg(xs, 256, partitions = 1)
    val many = runAgg(xs, 256, partitions = 11)
    assert(one == many)
  }

  test("summary serialization round-trips") {
    val s = new SpaceSavingSummary(4)
    Seq("a", "b", "a", "c", "d", "e", "a").foreach(x =>
      s.add(UTF8String.fromString(x), 1L))
    val back = SpaceSavingSummary.deserialize(s.serialize())
    assert(back.capacity == s.capacity)
    assert(back.items == s.items)
  }

  test("streaming histogram: exact bins when capacity >= distinct values") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val xs = Seq.fill(5000)(rng.nextInt(300).toLong)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = spark.sparkContext.parallelize(xs, 6).toDF("v")
      .agg(SketchFunctions.streamingHistogram(col("v"), 512).as("h"))
      .select(explode(col("h")).as("b"))
      .select(col("b.value"), col("b.cnt")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.length == truth.size)
    got.foreach { case (v, c) =>
      assert(v == v.toLong.toDouble) // no bin ever merged
      assert(c == truth(v.toLong))
    }
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }

  test("streaming histogram under compression: mass conserved, ranks bounded") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val xs = Seq.fill(20000)(math.abs(rng.nextGaussian() * 1000).toLong)
    val cap = 64
    val got = spark.sparkContext.parallelize(xs, 5).toDF("v")
      .agg(SketchFunctions.streamingHistogram(col("v"), cap).as("h"))
      .select(explode(col("h")).as("b"))
      .select(col("b.value"), col("b.cnt")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.length <= cap)
    assert(got.map(_._2).sum == xs.size) // no mass lost
    // median estimate from the histogram lands within a few percent of
    // the true rank (coarse sanity bound: compression is local)
    val sorted = xs.sorted
    val trueMedian = sorted(xs.size / 2).toDouble
    var cum = 0L
    val est = got.collectFirst {
      case (v, c) if { cum += c; cum >= xs.size / 2 } => v
    }.get
    val trueRankOfEst = sorted.count(_ <= est).toDouble / xs.size
    assert(math.abs(trueRankOfEst - 0.5) < 0.1,
      s"median est $est (rank $trueRankOfEst) too far from $trueMedian")
  }

  test("bloom build + might_contain: no false negatives, few false positives") {
    import spark.implicits._
    val members = (0L until 2000L).map(i => s"m$i")
    val bloomBytes = members.toDF("g")
      .agg(SketchFunctions.bloomAgg(xxhash64(col("g")), 10000L, 0.01).as("b"))
      .head().getAs[Array[Byte]](0)
    val probe = (members ++ (0L until 2000L).map(i => s"x$i")).toDF("g")
      .withColumn("hit", SketchFunctions.mightContain(bloomBytes, xxhash64(col("g"))))
    val hits = probe.where(col("hit")).select("g").as[String].collect().toSet
    assert(members.forall(hits.contains), "bloom false negative")
    val fp = hits.count(_.startsWith("x"))
    assert(fp <= 100, s"false-positive count $fp way over the 1% target")
  }
}
