package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generic as-of join semantics: latest right row ≤ left time per key,
  * inclusive ties, NULL when nothing precedes, keys isolated. */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("as-of picks the latest preceding version, inclusively") {
    import spark.implicits._
    val versions = Seq(
      (1L, 10L, "v10"), (1L, 20L, "v20"), (1L, 30L, "v30"),
      (2L, 15L, "w15")).toDF("key", "vt", "payload")
    val probes = Seq(
      (1L, 5L), // before any version → NULL
      (1L, 20L), // exact tie → inclusive match v20
      (1L, 25L), // between → v20
      (1L, 99L), // after all → v30
      (2L, 16L), // other key isolated → w15
      (3L, 50L) // key with no versions → NULL
    ).toDF("key", "pt")
    val out = AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        Option(r.get(r.fieldIndex("payload"))))).toMap
    assert(out((1L, 5L)).isEmpty)
    assert(out((1L, 20L)).contains("v20"))
    assert(out((1L, 25L)).contains("v20"))
    assert(out((1L, 99L)).contains("v30"))
    assert(out((2L, 16L)).contains("w15"))
    assert(out((3L, 50L)).isEmpty)
  }

  test("forward direction picks the earliest following version, inclusively") {
    import spark.implicits._
    val versions = Seq(
      (1L, 10L, "v10"), (1L, 20L, "v20"), (1L, 30L, "v30"),
      (2L, 15L, "w15")).toDF("key", "vt", "payload")
    val probes = Seq(
      (1L, 5L), // before any version → v10 (next up)
      (1L, 20L), // exact tie → inclusive match v20
      (1L, 25L), // between → v30
      (1L, 99L), // after all → NULL
      (2L, 10L), // other key isolated → w15
      (3L, 50L) // key with no versions → NULL
    ).toDF("key", "pt")
    val out = AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt",
        direction = "forward")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        Option(r.get(r.fieldIndex("payload"))))).toMap
    assert(out((1L, 5L)).contains("v10"))
    assert(out((1L, 20L)).contains("v20"))
    assert(out((1L, 25L)).contains("v30"))
    assert(out((1L, 99L)).isEmpty)
    assert(out((2L, 10L)).contains("w15"))
    assert(out((3L, 50L)).isEmpty)
  }

  test("NULL probe times match nothing in either direction") {
    import spark.implicits._
    val versions = Seq((1L, 10L, "v10"), (1L, 20L, "v20"))
      .toDF("key", "vt", "payload")
    val probes = Seq((1L, Some(15L)), (1L, None))
      .toDF("key", "pt")
    Seq("backward", "forward").foreach { dir =>
      val out = AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt",
          direction = dir)
        .collect().map(r => (Option(r.get(r.fieldIndex("pt"))),
          Option(r.get(r.fieldIndex("payload"))))).toMap
      assert(out(Some(15L)).contains(if (dir == "backward") "v10" else "v20"))
      assert(out(None).isEmpty, s"direction $dir fabricated a match")
    }
  }

  test("right rows with NULL times are ignored in both directions") {
    import spark.implicits._
    // a NULL-time version sorts first in BOTH scan orders; unless it is
    // dropped, its non-null payload carries onto every probe in the key
    // partition (DuckDB ASOF ignores such rows → NULL match)
    val versions = Seq(
      (1L, Option.empty[Long], "ghost"), (1L, Some(20L), "v20"))
      .toDF("key", "vt", "payload")
    val probes = Seq((1L, 5L), (1L, 25L)).toDF("key", "pt")
    Seq("backward", "forward").foreach { dir =>
      val out = AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt",
          direction = dir)
        .collect().map(r => (r.getLong(r.fieldIndex("pt")),
          Option(r.get(r.fieldIndex("payload"))))).toMap
      assert(!out.values.flatten.exists(_ == "ghost"),
        s"direction $dir matched a NULL-time version")
      if (dir == "backward") {
        assert(out(5L).isEmpty && out(25L).contains("v20"))
      } else {
        assert(out(5L).contains("v20") && out(25L).isEmpty)
      }
    }
  }

  test("forward random instances match a local reference implementation") {
    import spark.implicits._
    val rng = new scala.util.Random(177)
    (1 to 8).foreach { trial =>
      val nKeys = 1 + rng.nextInt(4)
      val versions = (for {
        k <- 0 until nKeys
        t <- Seq.fill(1 + rng.nextInt(6))(rng.nextInt(100)).distinct
      } yield (k.toLong, t.toLong,
        if (rng.nextBoolean()) Some(s"v${k}_$t") else None)).toSeq
      val probes = Seq.fill(20)(
        (rng.nextInt(nKeys + 1).toLong, rng.nextInt(120).toLong))
      val got = AsOfJoin.leftAsOf(
          probes.toDF("key", "pt"), versions.toDF("key", "vt", "payload"),
          "key", "pt", "vt", direction = "forward")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getString(3))))
        .toSeq.sorted.groupBy(identity).view.mapValues(_.size).toMap
      val expected = probes.map { case (k, pt) =>
        val best = versions.filter(v => v._1 == k && v._2 >= pt)
          .sortBy(_._2).headOption
        (k, pt) -> (best.map(_._2), best.flatMap(_._3))
      }.sorted.groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("NULL fields in the matched version stay NULL (no cross-version mixing)") {
    import spark.implicits._
    // v20's payload is NULL: a per-column carry would resurrect v10's
    // "old" into the v20 match; the struct carry must keep it NULL
    val versions = Seq(
      (1L, 10L, Option("old")), (1L, 20L, Option.empty[String]))
      .toDF("key", "vt", "payload")
    val probes = Seq((1L, 25L)).toDF("key", "pt")
    val r = AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt")
      .collect().head
    assert(r.getLong(r.fieldIndex("matched_vt")) == 20L,
      "matched the wrong version")
    assert(r.isNullAt(r.fieldIndex("payload")),
      "NULL payload field resurrected an older version's value")
  }

  test("colliding right payload names fail fast") {
    import spark.implicits._
    val versions = Seq((1L, 10L, "x")).toDF("key", "vt", "pt") // pt collides
    val probes = Seq((1L, 12L)).toDF("key", "pt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("payload named matched_<rightTime> fails fast, not ambiguous-field") {
    import spark.implicits._
    val versions = Seq((1L, 10L, "x")).toDF("key", "vt", "matched_vt")
    val probes = Seq((1L, 12L)).toDF("key", "pt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt")
    }
    assert(e.getMessage.contains("matched_vt"))
  }

  test("random instances match a local reference implementation") {
    import spark.implicits._
    val rng = new scala.util.Random(77)
    (1 to 8).foreach { trial =>
      val nKeys = 1 + rng.nextInt(4)
      // unique (key, time) on the right per the operator's contract
      val versions = (for {
        k <- 0 until nKeys
        t <- Seq.fill(1 + rng.nextInt(6))(rng.nextInt(100)).distinct
      } yield (k.toLong, t.toLong,
        if (rng.nextBoolean()) Some(s"v${k}_$t") else None)).toSeq
      val probes = Seq.fill(20)(
        (rng.nextInt(nKeys + 1).toLong, rng.nextInt(120).toLong))
      val got = AsOfJoin.leftAsOf(
          probes.toDF("key", "pt"), versions.toDF("key", "vt", "payload"),
          "key", "pt", "vt")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getString(3))))
        .toSeq.sorted.groupBy(identity).view.mapValues(_.size).toMap
      val expected = probes.map { case (k, pt) =>
        val best = versions.filter(v => v._1 == k && v._2 <= pt)
          .sortBy(_._2).lastOption
        (k, pt) -> (best.map(_._2), best.flatMap(_._3))
      }.sorted.groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("matched time column is carried; plan is one shuffle by key") {
    import spark.implicits._
    val versions = Seq((1L, 10L, 1.5)).toDF("key", "vt", "score")
    val probes = Seq((1L, 12L)).toDF("key", "pt")
    val joined = AsOfJoin.leftAsOf(probes, versions, "key", "pt", "vt")
    val r = joined.collect().head
    assert(r.getLong(r.fieldIndex("matched_vt")) == 10L)
    assert(r.getDouble(r.fieldIndex("score")) == 1.5)
    // single Exchange: union + window shuffles once on the key (the
    // adaptive plan repr prints the tree twice — count distinct ids)
    val exchanges = "Exchange hashpartitioning.*?plan_id=(\\d+)".r
      .findAllMatchIn(joined.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSet
    assert(exchanges.size == 1, s"expected one key shuffle, saw $exchanges")
  }
}
