package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss chaos probe (VERDICT r13 next #1): kill a REAL
  * executor JVM mid-job on `local-cluster` and prove the recovery
  * claims that were, until now, designed-for and spec-pinned for
  * result identity but never demonstrated under actual loss.
  *
  * Three arms (each prints one `[chaos]` JSON line; any hard-claim
  * violation aborts the probe nonzero):
  *
  *  1. `iterative` — an iterative round-state job (star contraction on
  *     a long chain, the worst-case many-round shape) with a RELIABLE
  *     checkpoint dir configured ([[operators.Checkpoints.stable]]'s
  *     cluster posture). One executor JVM is destroyed mid-contraction;
  *     the job MUST complete and the labeling MUST hash-match the
  *     no-kill run on the same cluster: lost tasks retry, the lost
  *     executor's shuffle blocks recompute from the previous round's
  *     checkpoint FILES (shared store), and the standalone worker
  *     relaunches a replacement executor.
  *  2. `iterative-local` — the SAME job without a checkpoint dir, so
  *     round state is `localCheckpoint` executor blocks. Killing an
  *     executor now loses round-k blocks whose truncated lineage cannot
  *     be recomputed — the DESIGNED failure `Checkpoints.stable` exists
  *     to remove (Checkpoints.scala:9-27). The arm documents the
  *     observed outcome rather than asserting it: the failure needs the
  *     lost executor to hold live round blocks, which the kill cannot
  *     guarantee on every run. Either outcome is reported honestly.
  *  3. `stream` — [[TextIndex.ingest]] micro-batches on the cluster
  *     with one executor destroyed while a trigger is ACTIVE.
  *     Exactly-once must hold through Spark task retry alone (no
  *     driver restart, no checkpoint replay): every fed doc present
  *     exactly once, and the final lengths table hash-identical to a
  *     clean run over the same feed. (Plus the same claim for
  *     [[graft.streaming.VectorIngest]] — `stream-vec`.)
  *  4. `visit` — the flagship APDB visit pipeline with an executor
  *     destroyed mid-visit. Whether the visit survives via task retry
  *     or fails (the designed single-retry exposure of its
  *     localCheckpoint FOV state) and is REDONE through the round-14
  *     retry fence, the final warehouse must hash-identical to a
  *     never-killed run across all four store tables.
  *  5. `maintenance` — `consolidateNight` with an executor destroyed
  *     mid-compaction. Static overwrite used to delete each table dir
  *     BEFORE the write job ran, so this loss destroyed the table; on
  *     the dynamic-overwrite + stable-checkpoint rewrite the
  *     compaction either completes through the loss or fails with the
  *     store byte-identical and a rerun converging — contents must
  *     hash-identical to pre-compaction in every outcome.
  *
  * A kill that misses its window (job already finished, no executor
  * process found, no `ExecutorRemoved` event observed) FAILS the probe
  * — same standard as contention scenario F: a chaos arm that did not
  * actually exercise the loss must not read as a pass.
  *
  * Run: `SPARK_SCALA_VERSION=2.13 sbt "runMain graft.ChaosProbe"`,
  * or `scripts/chaos.sh`. ~4 min on local-cluster[2,4,3072].
  */
object ChaosProbe {

  private def log(s: String): Unit = println(s"[chaos] $s")

  /** Executor JVMs of this driver's local-cluster: the standalone
    * Workers run inside the driver JVM and spawn each executor
    * (`CoarseGrainedExecutorBackend`) as a CHILD PROCESS — visible,
    * and killable, through the process tree. */
  private def executorProcs(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    import scala.jdk.OptionConverters._
    ProcessHandle.current().descendants().iterator().asScala
      .filter(p => p.info().commandLine().toScala
        .exists(_.contains("CoarseGrainedExecutorBackend")))
      .toSeq
  }

  /** Destroy one live executor JVM; returns its pid. */
  private def killOneExecutor(): Long = {
    val procs = executorProcs()
    require(procs.nonEmpty,
      "chaos kill found no CoarseGrainedExecutorBackend child process " +
        "— is the master really local-cluster?")
    val victim = procs.head
    val pid = victim.pid()
    victim.destroyForcibly()
    // wait for the OS-level death so the loss is real before we return
    victim.onExit().get(30, java.util.concurrent.TimeUnit.SECONDS)
    pid
  }

  /** (rows, bit_xor fingerprint) of a two-column result — the probe's
    * result-identity hash. */
  private def hashOf(df: DataFrame, a: String, b: String): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      coalesce(expr(s"bit_xor(xxhash64($a, $b))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Run `body` with a killer thread that fires after `delayMs`,
    * requiring the body to still be in flight at the kill instant.
    * Returns (body result or thrown, killed pid). */
  private def withKill[T](delayMs: Long)(body: => T)
      : (scala.util.Try[T], Long) =
    // fixed-delay arming is the degenerate always-ready condition —
    // ONE copy of the kill-race protocol, not two that can drift
    withKillWhen(() => true, delayMs)(body)

  /** Like [[withKill]] but fires once `ready()` holds (polled every
    * 20 ms) plus `postReadyDelayMs` — host-speed-proof for SHORT
    * bodies, where any fixed delay either misses the window on a fast
    * host or lands before real work on a slow one. The maintenance arm
    * arms it on "a Spark job is active", so the kill always lands
    * mid-compaction.
    *
    * No vacuous passes, enforced TWO ways: the killer flags a miss if
    * the body finished before it armed, and the main thread ALSO
    * compares the kill-initiation timestamp against the body-end
    * timestamp — a kill that raced past `done` but actually fired
    * after the last task completed must not read as
    * "survived the loss". */
  private def withKillWhen[T](ready: () => Boolean, postReadyDelayMs: Long)
      (body: => T): (scala.util.Try[T], Long) = {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pid = new java.util.concurrent.atomic.AtomicLong(-1L)
    val killAt = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
    val raceMissed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val killer = new Thread(() => {
      while (!done.get() && !ready()) Thread.sleep(20)
      Thread.sleep(postReadyDelayMs)
      if (done.get()) raceMissed.set(true)
      else {
        killAt.set(System.nanoTime())
        pid.set(killOneExecutor())
      }
    }, "chaos-killer")
    killer.setDaemon(true)
    killer.start()
    val out = scala.util.Try(body)
    val bodyEnd = System.nanoTime()
    done.set(true)
    killer.join(60000)
    require(!raceMissed.get() && killAt.get() <= bodyEnd,
      "chaos kill missed its window (job finished before the kill " +
        "fired) — retune the workload; a no-op kill must not read as a pass")
    require(pid.get() > 0, "chaos killer did not kill (thread raced)")
    (out, pid.get())
  }

  /** The iterative workload: star-contract a `n`-node chain — the
    * many-round worst case, every round a full shuffle of the edge
    * set, round state through [[operators.Checkpoints]]. */
  private def chainLabels(spark: SparkSession, n: Long): DataFrame =
    operators.ConnectedComponents.starContract(spark,
      spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b")))

  def main(args: Array[String]): Unit = {
    val arms: Seq[String] =
      if (args.isEmpty)
        Seq("iterative", "iterative-local", "stream", "visit", "maintenance")
      else args.toSeq
    val n = sys.env.getOrElse("CHAOS_NODES", "200000").toLong
    val spark = MasterConf(SparkSession.builder(), "local-cluster[2,4,3072]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // the iterative arms exist to kill an executor MID-ROUND: disable
      // the single-task small-graph finish (r15) so the chain workload
      // keeps its many-round distributed shape and the kill window
      // stays non-vacuous
      .config("graft.cc.localEdgeLimit", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    require(spark.sparkContext.master.startsWith("local-cluster"),
      "ChaosProbe needs REAL executor JVMs (local-cluster master)")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet(): Unit
      }
    })
    // make sure both executors are up before any timing calibration
    spark.range(1000000L).agg(sum(col("id"))).count()

    val ckptRoot = java.nio.file.Files
      .createTempDirectory("chaos_ckpt").toString

    // ---- arm 1: reliable round state survives executor loss -------------
    if (arms.contains("iterative")) {
      spark.sparkContext.setCheckpointDir(s"$ckptRoot/reliable")
      try {
        val t0 = System.nanoTime()
        val clean = hashOf(chainLabels(spark, n), "node", "root")
        val cleanSec = (System.nanoTime() - t0) / 1e9
        require(clean._1 == n, s"clean run labeled ${clean._1} of $n nodes")
        val removedBefore = removed.get()
        val killDelayMs = math.max(2000L, (cleanSec * 0.4 * 1000).toLong)
        val t1 = System.nanoTime()
        val (res, pid) = withKill(killDelayMs) {
          hashOf(chainLabels(spark, n), "node", "root")
        }
        val chaosSec = (System.nanoTime() - t1) / 1e9
        val got = res.get // a reliable-path job MUST complete through the loss
        require(removed.get() > removedBefore,
          "no ExecutorRemoved event observed — the kill did not register " +
            "as an executor loss")
        require(got == clean,
          s"result diverged under executor loss: $got vs clean $clean")
        // Locale.US like arm 4: the f-interpolator's %.1f is locale-
        // dependent and a comma decimal separator breaks the JSON line
        log(s"""{"arm":"iterative","outcome":"survived_identical","nodes":$n,"clean_sec":${
          "%.1f".formatLocal(java.util.Locale.US, cleanSec)},"chaos_sec":${
          "%.1f".formatLocal(java.util.Locale.US, chaosSec)},"kill_at_ms":$killDelayMs,"killed_pid":$pid,"executors_removed":${removed.get() - removedBefore},"rows":${got._1},"hash":${got._2}}""")
      } finally spark.sparkContext.setCheckpointDir(null)
    }

    // ---- arm 2: local round state (the designed failure) ----------------
    if (arms.contains("iterative-local")) {
      require(spark.sparkContext.getCheckpointDir.isEmpty)
      val t0 = System.nanoTime()
      val clean = hashOf(chainLabels(spark, n), "node", "root")
      val cleanSec = (System.nanoTime() - t0) / 1e9
      val removedBefore = removed.get()
      val killDelayMs = math.max(2000L, (cleanSec * 0.5 * 1000).toLong)
      val (res, pid) = withKill(killDelayMs) {
        hashOf(chainLabels(spark, n), "node", "root")
      }
      require(removed.get() > removedBefore,
        "no ExecutorRemoved event observed on the local arm")
      res match {
        case scala.util.Failure(e) =>
          // the designed failure: locally-checkpointed round state died
          // with the executor and cannot be recomputed
          log(s"""{"arm":"iterative-local","outcome":"failed_as_designed","nodes":$n,"kill_at_ms":$killDelayMs,"killed_pid":$pid,"error":"${
            e.getMessage.takeWhile(_ != '\n').replace("\"", "'").take(160)}"}""")
        case scala.util.Success(got) =>
          // possible when the lost executor happened to hold no live
          // round blocks at the kill instant — report, don't assert
          log(s"""{"arm":"iterative-local","outcome":"survived_this_run","note":"kill landed when the lost executor held no unrecoverable round blocks","nodes":$n,"killed_pid":$pid,"match_clean":${got == clean}}""")
      }
    }

    // ---- arm 3: streaming exactly-once through task retry ---------------
    if (arms.contains("stream")) {
      val root = java.nio.file.Files
        .createTempDirectory("chaos_stream").toString
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      def docText(id: Long): String =
        s"doc$id " + (0 until 9)
          .map(j => words(((id + j * 7) % words.size).toInt)).mkString(" ")
      val nBase = 500
      val docsPerBatch = 30000
      val batches = 6
      // One runner for BOTH streaming estates (text + vector): the feed
      // loop, the kill-while-trigger-ACTIVE race (the loss must land
      // inside a micro-batch's write jobs), and the exactly-once
      // assertion are protocol, not estate-specific — a fix to the kill
      // window or the 120 s deadline must not have to land twice.
      def streamArm(arm: String, tag: String,
          feedBatch: Int => org.apache.spark.sql.DataFrame,
          startIngest: String => org.apache.spark.sql.streaming.StreamingQuery,
          committedRows: () => org.apache.spark.sql.DataFrame,
          idCol: String, valCol: String,
          expected: Long, kill: Boolean): (Long, Long) = {
        val in = s"$root/in_${arm}_$tag"
        EstateFs.mkdirs(in)
        (0 until batches).foreach { b =>
          val stage = s"$root/stage_${arm}_$tag"
          feedBatch(b).coalesce(1).write.mode("overwrite").parquet(stage)
          new java.io.File(stage).listFiles()
            .filter(_.getName.endsWith(".parquet")).zipWithIndex
            .foreach { case (f, i) =>
              require(f.renameTo(new java.io.File(in, s"b$b-$i.parquet")))
            }
          EstateFs.deleteRecursive(stage)
        }
        val q = startIngest(in)
        if (kill) {
          val removedBefore = removed.get()
          val deadline = System.nanoTime() + 120L * 1000000000L
          var killedPid = -1L
          while (killedPid < 0 && System.nanoTime() < deadline) {
            val progressed = q.recentProgress.count(_.numInputRows > 0)
            if (progressed >= 2 && q.status.isTriggerActive)
              killedPid = killOneExecutor()
            else Thread.sleep(50)
          }
          require(killedPid > 0,
            s"$arm chaos kill never fired (no active trigger within " +
              "120 s) — the race was not exercised")
          q.processAllAvailable()
          require(removed.get() > removedBefore,
            s"no ExecutorRemoved event observed on the $arm arm")
          log(s"""{"arm":"$arm","event":"killed_mid_trigger","killed_pid":$killedPid}""")
        } else q.processAllAvailable()
        q.stop()
        // every fed row exactly once across base ∪ committed deltas
        val rows = committedRows()
        val distinct = rows.select(col(idCol)).distinct().count()
        val h = hashOf(rows, idCol, valCol)
        require(h._1 == expected && distinct == expected,
          s"$arm/$tag: exactly-once violated — ${h._1} rows / " +
            s"$distinct distinct vs $expected expected")
        h
      }
      def runIngest(tag: String, kill: Boolean): (Long, Long) = {
        val dir = s"$root/text_$tag"
        TextIndex.build(spark, dir,
          (0 until nBase).map(i => (i.toLong, docText(i.toLong)))
            .toDF("doc_id", "text"))
        streamArm("stream", tag,
          feedBatch = b => (0 until docsPerBatch).map { j =>
            val id = nBase.toLong + b.toLong * docsPerBatch + j
            (id, docText(id))
          }.toDF("doc_id", "text"),
          startIngest = in => TextIndex.ingest(spark, dir,
            spark.readStream.schema("doc_id LONG, text STRING")
              .option("maxFilesPerTrigger", "1").parquet(in),
            s"$root/ckpt_$tag"),
          committedRows = () => {
            val textBatches = TextIndex.committedBatches(dir)
            val base = spark.read.parquet(TextIndex.tablePaths(dir)._2)
              .select(col("doc_id"), col("dl"))
            if (textBatches.isEmpty) base
            else base.unionByName(
              spark.read.parquet(s"$dir/lengths_delta")
                .where(col("ingest_batch").isin(textBatches: _*))
                .select(col("doc_id"), col("dl")))
          },
          idCol = "doc_id", valCol = "dl",
          expected = nBase.toLong + batches.toLong * docsPerBatch, kill)
      }
      val clean = runIngest("clean", kill = false)
      val chaos = runIngest("chaos", kill = true)
      require(chaos == clean,
        s"streamed index diverged under executor loss: $chaos vs $clean")
      log(s"""{"arm":"stream","outcome":"exactly_once_identical","docs":${clean._1},"hash":${clean._2}}""")

      // -- same claim for the VECTOR estate (VectorIngest — the other
      // streaming mutator the r13 verdict names): PQ-encode batches
      // into ivf_codes_stream partitions, executor killed mid-trigger,
      // code assignment must come out exactly-once and identical
      def embedding(id: Long): Array[Float] = {
        val r = new scala.util.Random(id * 2654435761L)
        Array.fill(64)(r.nextGaussian().toFloat * 0.1f)
      }
      val vecsPerBatch = 12000
      def runVecIngest(tag: String, kill: Boolean): (Long, Long) = {
        val dir = s"$root/vec_$tag"
        VectorIndex.buildIvfPq(spark, dir,
          (0 until nBase).map(i => (i.toLong, embedding(i.toLong)))
            .toDF("vec_id", "embedding"))
        streamArm("stream-vec", tag,
          feedBatch = b => (0 until vecsPerBatch).map { j =>
            val id = nBase.toLong + b.toLong * vecsPerBatch + j
            (id, embedding(id))
          }.toDF("vec_id", "embedding"),
          startIngest = in => graft.streaming.VectorIngest.ingest(spark, dir,
            spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
              .option("maxFilesPerTrigger", "1").parquet(in),
            s"$root/vckpt_$tag"),
          committedRows = () => {
            val base = spark.read.parquet(s"$dir/ivf_codes")
              .select(col("cand_id"), col("list"))
            if (EstateFs.exists(s"$dir/ivf_codes_stream"))
              base.unionByName(spark.read
                .schema("ingest_batch LONG, list INT, cand_id LONG, code ARRAY<INT>")
                .parquet(s"$dir/ivf_codes_stream")
                .select(col("cand_id"), col("list")))
            else base
          },
          idCol = "cand_id", valCol = "list",
          expected = nBase.toLong + batches.toLong * vecsPerBatch, kill)
      }
      val vClean = runVecIngest("clean", kill = false)
      val vChaos = runVecIngest("chaos", kill = true)
      require(vChaos == vClean,
        s"vector index diverged under executor loss: $vChaos vs $vClean")
      log(s"""{"arm":"stream-vec","outcome":"exactly_once_identical","vectors":${vClean._1},"hash":${vClean._2}}""")
      EstateFs.deleteRecursive(root)
    }

    // ---- shared APDB fixtures (visit + maintenance arms) -----------------
    lazy val apdbPointing = graft.geom.Vec3(0.1, -0.2, -0.97).normalized
    var apdbCatalogInit = false
    lazy val apdbCatalog = {
      val c = apdb.DiaSim.genCatalog(spark, 2000000L, hemi = -1, seed = 42)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      c.count(): Unit
      apdbCatalogInit = true
      c
    }
    def warehouseHash(a: apdb.ApdbSpark): Seq[(Long, Long)] = Seq(
      hashOf(a.getDiaObjectsHistory
        .select(col("diaObjectId"), col("validityStart")),
        "diaObjectId", "validityStart"),
      hashOf(a.objectsLast, "diaObjectId", "nDiaSources"),
      hashOf(a.sources, "diaSourceId", "diaObjectId"),
      hashOf(a.forcedSources, "diaObjectId", "visit"))

    // ---- arm 4: the flagship visit pipeline under executor loss ---------
    // A mid-visit loss is the designed single-retry exposure (the visit
    // localCheckpoints FOV state), and the round-14 retry fence makes
    // the redo exactly-once (ApdbSpark's retry-exactness protocol).
    // Claim proven here: kill an executor mid-visit; whether the visit
    // survives via task retry or fails and is REDONE, the final
    // warehouse state must hash-identical to a never-killed run.
    if (arms.contains("visit")) {
      import java.sql.Timestamp
      import graft.apdb._
      val pointing = apdbPointing
      val catalog = apdbCatalog
      var v2CleanSec = 0.0
      def runVisits(tag: String, kill: Boolean): Seq[(Long, Long)] = {
        val wh = java.nio.file.Files
          .createTempDirectory(s"chaos_wh_$tag").toString
        val apdb = new ApdbSpark(spark, ApdbConfig(warehouseDir = wh,
          transientPerVisit = 10, falsePerVisit = 90))
        apdb.makeSchema(drop = true)
        VisitPipeline.visitTimes(
          Timestamp.valueOf("2026-01-01 01:00:00"), 3).foreach {
          case (2, ts) if kill =>
            val removedBefore = removed.get()
            // armed on job activity, not a fixed fraction of the clean
            // duration: the warm chaos re-run can finish in well under
            // 0.4x clean (the hot-path cleanups made exactly that
            // happen and the missed-window guard caught it), so the
            // kill waits for the visit's first Spark job and lands a
            // beat into it
            val postReadyMs = math.max(300L, (v2CleanSec * 0.15 * 1000).toLong)
            val tracker = spark.sparkContext.statusTracker
            val (res, pid) = withKillWhen(
              () => tracker.getActiveJobIds().nonEmpty, postReadyMs) {
              VisitPipeline.visit(apdb, catalog, 2, ts, pointing)
            }
            require(removed.get() > removedBefore,
              "no ExecutorRemoved event observed on the visit arm")
            res match {
              case scala.util.Success(_) =>
                log(s"""{"arm":"visit","event":"survived_kill_via_task_retry","killed_pid":$pid}""")
              case scala.util.Failure(e) =>
                log(s"""{"arm":"visit","event":"visit_failed_then_redone","killed_pid":$pid,"error":"${
                  e.getMessage.takeWhile(_ != '\n').replace("\"", "'").take(120)}"}""")
                // the operational redo — the retry fence must make it
                // exactly-once against whatever the crash left behind
                val stats = VisitPipeline.visit(apdb, catalog, 2, ts, pointing)
                log(s"""{"arm":"visit","event":"redo_complete","recovered":${stats.recovered}}""")
            }
          case (id, ts) =>
            val t0 = System.nanoTime()
            VisitPipeline.visit(apdb, catalog, id, ts, pointing)
            if (id == 2 && !kill) v2CleanSec = (System.nanoTime() - t0) / 1e9
        }
        warehouseHash(apdb)
      }
      val clean = runVisits("clean", kill = false)
      val chaos = runVisits("chaos", kill = true)
      require(chaos == clean,
        s"warehouse diverged under mid-visit executor loss: $chaos vs $clean")
      log(s"""{"arm":"visit","outcome":"store_identical","v2_clean_sec":${
        "%.1f".formatLocal(java.util.Locale.US, v2CleanSec)},"tables_hashed":4}""")
    }

    // ---- arm 5: nightly maintenance compaction under executor loss ------
    // consolidateNight rewrites every store table. With STATIC
    // overwrite (pre-round-14-fix) Spark deleted each table dir BEFORE
    // the write job ran, so an executor loss mid-compaction — killing
    // the lineage-break blocks the job reads — destroyed the table.
    // Round 15 moved the verb to SIDE-DIR staging + per-partition
    // metadata commits behind maintenance intents (the write job never
    // touches the table, so the r14 lineage-break/checkpoint machinery
    // is no longer even needed). Claims proven here: the kill lands
    // mid-compaction, and EITHER the compaction completes through the
    // loss (task retry inside the side-write job) OR it fails with the
    // store byte-identical (only the side dir was written) and a rerun
    // — which first runs recoverMaintenance over any crashed commit —
    // converges. In every outcome the final contents must
    // hash-identical to pre-compaction.
    if (arms.contains("maintenance")) {
      import java.sql.Timestamp
      import graft.apdb._
      def build(tag: String): ApdbSpark = {
        val wh = java.nio.file.Files
          .createTempDirectory(s"chaos_mnt_$tag").toString
        val a = new ApdbSpark(spark, ApdbConfig(warehouseDir = wh,
          transientPerVisit = 10, falsePerVisit = 90))
        a.makeSchema(drop = true)
        // 8 visits fragment the tables enough that consolidation is a
        // multi-second 4-job sequence — a kill window wide enough to
        // land reliably (3 visits compacted in <1.5 s and the probe
        // failed its own missed-race guard)
        VisitPipeline.visitTimes(
          Timestamp.valueOf("2026-01-01 01:00:00"), 8).foreach {
          case (id, ts) =>
            VisitPipeline.visit(a, apdbCatalog, id, ts, apdbPointing): Unit
        }
        a
      }
      val ckpt = java.nio.file.Files
        .createTempDirectory("chaos_mnt_ckpt").toString
      spark.sparkContext.setCheckpointDir(ckpt)
      try {
        val clean = build("clean")
        val pre = warehouseHash(clean)
        val t0 = System.nanoTime()
        clean.consolidateNight()
        val cleanSec = (System.nanoTime() - t0) / 1e9
        require(warehouseHash(clean) == pre,
          "clean consolidation changed table contents")
        val victim = build("chaos")
        require(warehouseHash(victim) == pre,
          "fixture warehouses diverged before the chaos run")
        val removedBefore = removed.get()
        // arm the kill on "a compaction job is ACTIVE" rather than a
        // fixed delay: consolidateNight is a short multi-job sequence,
        // so any fixed delay misses on a fast host; the post-ready
        // delay pushes the kill ~20% into the clean duration
        val postReadyMs = math.min(1000L, (cleanSec * 0.2 * 1000).toLong)
        val tracker = spark.sparkContext.statusTracker
        val (res, pid) = withKillWhen(
          () => tracker.getActiveJobIds().nonEmpty, postReadyMs) {
          victim.consolidateNight()
        }
        require(removed.get() > removedBefore,
          "no ExecutorRemoved event observed on the maintenance arm")
        res match {
          case scala.util.Success(_) =>
            log(s"""{"arm":"maintenance","outcome":"survived_identical","clean_sec":${
              "%.1f".formatLocal(java.util.Locale.US, cleanSec)},"post_ready_ms":$postReadyMs,"killed_pid":$pid}""")
          case scala.util.Failure(e) =>
            // the property the static-overwrite hazard violated: a
            // FAILED compaction must leave every table byte-identical
            require(warehouseHash(victim) == pre,
              "a failed compaction mutated the store (the static-" +
                "overwrite data-loss hazard)")
            victim.consolidateNight()
            log(s"""{"arm":"maintenance","outcome":"failed_intact_then_rerun_identical","post_ready_ms":$postReadyMs,"killed_pid":$pid,"error":"${
              e.getMessage.takeWhile(_ != '\n').replace("\"", "'").take(120)}"}""")
        }
        require(warehouseHash(victim) == pre,
          "consolidation under executor loss changed table contents")
      } finally spark.sparkContext.setCheckpointDir(null)
    }

    if (apdbCatalogInit) apdbCatalog.unpersist(): Unit
    log(s"""{"probe":"done","arms":"${arms.mkString(",")}","executors_removed_total":${removed.get()}}""")
    spark.stop()
  }
}
