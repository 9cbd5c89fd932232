package graft.operators

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ADVICE-r13 checkpoint fixes:
  *  - the reliable path executes a round's plan ONCE (persist-bracketed
  *    checkpoint — `observe` metrics must not accumulate the eager
  *    count plus the checkpoint-write recompute);
  *  - [[Checkpoints.Loop]] rotates superseded reliable checkpoint
  *    FILES (bounded store growth, the PeriodicCheckpointer pattern)
  *    and releases superseded LOCAL round blocks;
  *  - the Loop latches its strategy at construction — a concurrent
  *    `setCheckpointDir` flip mid-loop must not flip the release
  *    decisions of an in-flight loop. */
class CheckpointsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tempCkptDir(): String =
    java.nio.file.Files.createTempDirectory("graftckpt").toString

  /** rdd-* directories under a checkpoint dir = one per live reliable
    * checkpoint. */
  private def rddDirs(dir: String): Seq[String] = graft.CkptDirs.rddDirs(dir)

  private def withCkptDir[T](dir: String)(body: => T): T = {
    spark.sparkContext.setCheckpointDir(dir)
    // reset to the local-path default: the SparkContext is JVM-wide
    // (getOrCreate), so a leaked dir would flip every later suite
    try body finally spark.sparkContext.setCheckpointDir(null)
  }

  test("reliable stable() fires observe metrics exactly once") {
    withCkptDir(tempCkptDir()) {
      val obs = Observation("ckpt_single_fire")
      val df = spark.range(1000).toDF("id")
        .observe(obs, count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(id))"), lit(0L)).as("h"))
      val cp = Checkpoints.stable(df)
      assert(cp.count() === 1000)
      val m = obs.get
      // an unbracketed eager Dataset.checkpoint executes the plan twice
      // (count action + checkpoint-write job): n doubles to 2000 and
      // the bit_xor sketch self-cancels to 0 (ADVICE r13)
      assert(m("n") === 1000L,
        s"observe saw ${m("n")} rows for a 1000-row frame — the " +
          "reliable checkpoint executed the plan more than once")
      assert(m("h") !== 0L,
        "bit_xor fingerprint self-cancelled — double execution")
    }
  }

  test("Loop rotates reliable checkpoint files down to `keep`") {
    val dir = tempCkptDir()
    withCkptDir(dir) {
      val loop = new Checkpoints.Loop(spark, keep = 2)
      assert(loop.useReliable)
      var ds = spark.range(100).toDF("id")
      for (_ <- 1 to 6) ds = loop.stable(ds.withColumn("id", col("id") + 1))
      // 6 rounds wrote 6 checkpoints; rotation must have deleted all
      // but the last `keep`, and the survivors must still serve
      assert(ds.agg(sum(col("id"))).head().getLong(0) === 5550L)
      val left = rddDirs(dir)
      assert(left.size <= 2,
        s"expected <= 2 surviving checkpoint dirs, found ${left.size}: $left")
      assert(left.nonEmpty, "rotation deleted the LIVE round state")
    }
  }

  test("Loop releases superseded LOCAL round blocks as it advances") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val loop = new Checkpoints.Loop(spark, keep = 1)
    assert(!loop.useReliable)
    var ds = loop.stable(spark.range(50).toDF("id"))
    for (_ <- 1 to 5) ds = loop.stable(ds.withColumn("id", col("id") + 1))
    assert(ds.count() === 50)
    val after = spark.sparkContext.getPersistentRDDs.size
    // 6 localCheckpoints total; only the newest may remain persisted
    assert(after - before <= 1,
      s"local round blocks leaked: $before persistent RDDs before, $after after")
  }

  test("Loop latches its strategy against a mid-loop checkpoint-dir flip") {
    val loop = new Checkpoints.Loop(spark, keep = 1) // constructed local
    assert(!loop.useReliable)
    var ds = loop.stable(spark.range(40).toDF("id"))
    val dir = tempCkptDir()
    withCkptDir(dir) {
      // another session user flips the dir mid-loop (the shared-session
      // hazard ConnectedComponentsSpec's dir mutation models): this
      // loop must STAY on the local path — mixed strategies would
      // either skip releasing local blocks or call the local release
      // on a reliably-checkpointed round
      ds = loop.stable(ds.withColumn("id", col("id") + 1))
      assert(ds.count() === 40)
      assert(rddDirs(dir).isEmpty,
        "a latched-local Loop wrote reliable checkpoint files after a " +
          "mid-loop setCheckpointDir flip")
    }
  }
}
