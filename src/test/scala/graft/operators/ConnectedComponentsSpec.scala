package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Star-contraction connected components vs a local union-find ground
  * truth — random graphs plus the adversarial shapes (long chains) that
  * make min-label propagation take O(n) rounds. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // union-by-min above ⇒ find returns the component minimum
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  /** Force one of the two paths: limit 0 disables the single-task
    * finish (pure distributed rounds), a huge limit forces it. */
  private def withLimit[T](limit: Long)(body: => T): T = {
    spark.conf.set("graft.cc.localEdgeLimit", limit.toString)
    try body
    finally spark.conf.unset("graft.cc.localEdgeLimit")
  }

  private def viaSpark(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    ConnectedComponents.starContract(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs match union-find (seeded trials, both paths)") {
    val rng = new scala.util.Random(2026)
    (1 to 15).foreach { trial =>
      val n = 2 + rng.nextInt(40)
      val m = 1 + rng.nextInt(80)
      val es = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (es.nonEmpty) {
        val want = unionFind(es)
        // default limit ⇒ the single-task finish on graphs this small
        assert(viaSpark(es) == want, s"trial $trial (local) failed: $es")
        // limit 0 ⇒ the distributed contraction rounds
        assert(withLimit(0)(viaSpark(es)) == want,
          s"trial $trial (distributed) failed: $es")
      }
    }
  }

  test("single-task finish engages below the edge limit and not above") {
    import spark.implicits._
    val es = (0L until 40L).map(i => (i, i + 1)) // 40 edges, one chain
    val df = es.toDF("a", "b")
    val (_, localRounds) = withLimit(1000)(
      ConnectedComponents.starContractWithRounds(spark, df))
    assert(localRounds == 0, "below the limit must take the 0-round path")
    val (_, distRounds) = withLimit(10)(
      ConnectedComponents.starContractWithRounds(spark, df))
    assert(distRounds > 0, "above the limit must run contraction rounds")
  }

  test("long chain (propagation's worst case) converges in few rounds") {
    // a 300-node path: min-label propagation needs ~300 rounds; star
    // contraction must stay inside its 32-round bound. Limit 0 pins the
    // DISTRIBUTED rounds (the default limit would finish it in-task).
    val chain = (0L until 300L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = withLimit(0)(viaSpark(chain))
    assert(got.values.toSet == Set(0L), "chain must collapse to root 0")
    assert(got.size == 300)
  }

  test("double-parent trap converges fully (structural checks are not enough)") {
    // (6,5),(6,0),(7,5),(7,1): one large+small round yields the
    // chain-free but under-merged {(5,0),(6,0),(5,1),(7,1)} — node 5
    // holds two parents. Only the edge-set fixpoint certifies stars;
    // everything here is one component rooted at 0. Limit 0 pins the
    // distributed rounds (the trap is a contraction property).
    val es = Seq((6L, 5L), (6L, 0L), (7L, 5L), (7L, 1L))
    val got = withLimit(0)(viaSpark(es))
    assert(got == Map(0L -> 0L, 1L -> 0L, 5L -> 0L, 6L -> 0L, 7L -> 0L))
  }

  test("sparse high-fanout graphs match union-find (seeded trials)") {
    // shapes that breed multi-parent intermediate states: few hubs with
    // many leaves plus random cross links
    val rng = new scala.util.Random(909)
    (1 to 8).foreach { trial =>
      val hubs = 2 + rng.nextInt(3)
      val leaves = 5 + rng.nextInt(20)
      val es = (0 until leaves).flatMap { l =>
        val leaf = 100L + l
        (0 until hubs).filter(_ => rng.nextBoolean())
          .map(h => (leaf, h.toLong))
      } ++ Seq.fill(3)((rng.nextInt(hubs).toLong, 100L + rng.nextInt(leaves)))
      val clean = es.filter(e => e._1 != e._2)
      if (clean.nonEmpty)
        assert(viaSpark(clean) == unionFind(clean), s"trial $trial: $clean")
    }
  }

  test("reliable-checkpoint round state is result-identical to the local path") {
    // Checkpoints.stable routes iterative round state through
    // Dataset.checkpoint when the session owns a checkpoint dir (the
    // cluster posture where executor loss must not kill round k) and
    // through localCheckpoint otherwise. Same graph, both paths, same
    // labels -- and the reliable run must actually write checkpoint
    // files (the path was exercised, not skipped).
    import spark.implicits._
    val rng = new scala.util.Random(77)
    val es = Seq.fill(300)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val df = es.toDF("a", "b")
    // limit 0: this test pins the ROUND-STATE checkpointing machinery,
    // which only exists on the distributed path
    spark.conf.set("graft.cc.localEdgeLimit", "0")
    val (localDf, localRounds) =
      ConnectedComponents.starContractWithRounds(spark, df)
    val local = localDf
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckptDir = java.nio.file.Files.createTempDirectory("ccckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val (reliableDf, reliableRounds) =
        ConnectedComponents.starContractWithRounds(spark, df)
      val reliable = reliableDf
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      // the convergence sketch must work identically on the reliable
      // path: a double-executed observe self-cancels its bit_xor and
      // costs at least one extra round (ADVICE r13)
      assert(reliableRounds == localRounds,
        s"reliable path took $reliableRounds rounds vs local $localRounds " +
          "— the convergence sketch degraded under reliable checkpointing")
      val wrote = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        try s.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s.close()
      }
      assert(wrote > 0, "no reliable checkpoint files written - the stable path was not exercised")
      // rotation: the loop keeps 2 rounds + the loop-invariant `nodes`
      // checkpoint — superseded rounds' files must be gone
      val rddLeft = graft.CkptDirs.rddDirs(ckptDir)
      assert(rddLeft.size <= 3,
        s"superseded round checkpoints not rotated: ${rddLeft.size} rdd dirs remain")
    } finally {
      // reset to the local-path default: the SparkContext is JVM-wide
      // (getOrCreate), so a leaked checkpoint dir would silently flip
      // every later suite onto the reliable path.
      // setCheckpointDir(null) maps to None in local mode.
      spark.sparkContext.setCheckpointDir(null)
      spark.conf.unset("graft.cc.localEdgeLimit")
    }
  }

  test("disjoint components keep per-component minima") {
    val es = Seq((10L, 3L), (7L, 3L), (3L, 9L), // comp min 3
      (100L, 42L), (42L, 77L), // comp min 42
      (5L, 6L)) // comp min 5
    val got = viaSpark(es)
    assert(got == Map(10L -> 3L, 7L -> 3L, 3L -> 3L, 9L -> 3L,
      100L -> 42L, 42L -> 42L, 77L -> 42L, 5L -> 5L, 6L -> 5L))
  }
}
