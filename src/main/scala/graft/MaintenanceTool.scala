package graft

import org.apache.spark.sql.SparkSession


/** The unified nightly maintenance job over the index estate
  * (VERDICT r8 #4): the reference runs ONE end-of-night consolidation
  * pass per night (`log2influx.py:197-204` — DiaObjectNightly
  * copy/delete plus the retention deletes it times); graft's estate
  * spans four independently-invocable verbs, composed here so an
  * operator schedules a single job:
  *
  *  1. IVF drift check → [[VectorIndex.rebalanceIvf]] iff the metric
  *     exceeds the bound (x106's trigger semantics),
  *  2. [[TextIndex.maintain]] — tier-gated BM25 consolidation
  *     (O(deltas) merge on ordinary nights; the O(base) fold only when
  *     accumulated deltas reach [[TextIndex.FullFoldRatio]] of the
  *     base — the lexical analog of verb 1's drift gate),
  *  3. APDB chunk retention ([[graft.apdb.ApdbSpark.dropExpiredChunks]],
  *     T8) as of the nightly cut,
  *  4. APDB file consolidation ([[graft.apdb.ApdbSpark.consolidateNight]]
  *     — the DiaObjectNightly analog itself).
  *
  * Every verb is crash-safe on its own (marker-last / two-phase /
  * partition-drop protocols); the composition adds no cross-verb state,
  * so a kill mid-job is repaired by re-running it — each verb either
  * no-ops (nothing left to do) or finishes its own pending work
  * (TextIndex.compact resumes a committed cycle). Serving stays
  * available throughout except inside each verb's own documented
  * windows.
  *
  * Estate members are all optional: a deployment passes the dirs it
  * actually runs. Returns a machine-readable [[MaintenanceTool.Report]]
  * (the nightly job's log line).
  */
object MaintenanceTool {

  final case class Report(
      ivfDrift: Option[Double],
      ivfRebalanced: Boolean,
      textAction: String,
      textBatchesFolded: Int,
      apdbChunksDropped: Map[String, Long],
      apdbTablesConsolidated: Boolean,
      // per-verb wall seconds (r10): the nightly budget decomposed, so
      // an operator sees WHICH estate's consolidation grew night-over-
      // night without re-running anything. Keys: ivf/text/retention/
      // consolidate — absent estate members simply report ~0.
      verbSecs: Map[String, Double] = Map.empty) {
    private def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", d)
    def json: String = {
      val drops = apdbChunksDropped.toSeq.sortBy(_._1)
        .map { case (t, n) => s""""$t":$n""" }.mkString("{", ",", "}")
      // Locale.ROOT: the default locale's decimal comma would make the
      // nightly log line invalid JSON
      val drift = ivfDrift
        .map(d => String.format(java.util.Locale.ROOT, "%.4f", d))
        .getOrElse("null")
      val verbs = verbSecs.toSeq.sortBy(_._1)
        .map { case (v, s) => s""""$v":${fmt(s)}""" }.mkString("{", ",", "}")
      s"""{"ivf_drift":$drift,""" +
        s""""ivf_rebalanced":$ivfRebalanced,""" +
        s""""text_action":"$textAction",""" +
        s""""text_batches_folded":$textBatchesFolded,""" +
        s""""apdb_chunks_dropped":$drops,""" +
        s""""apdb_consolidated":$apdbTablesConsolidated,""" +
        s""""verb_secs":$verbs}"""
    }
  }

  /** Run the nightly pass over whichever estate members are present.
    *
    * @param vectorDir  IVF-PQ [[VectorIndex]] dir (verb 1), if any
    * @param textDir    [[TextIndex]] dir (verb 2), if any
    * @param apdbStore  APDB engine (verbs 3 + 4), if any
    * @param asOf       the nightly cut for chunk retention; required
    *                   when `apdbStore` is passed
    * @param driftBound rebalance trigger (x106's default) */
  def runNightly(spark: SparkSession,
      vectorDir: Option[String] = None,
      textDir: Option[String] = None,
      apdbStore: Option[graft.apdb.ApdbSpark] = None,
      asOf: Option[java.sql.Timestamp] = None,
      driftBound: Double = VectorIndex.DefaultDriftBound): Report = {
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((drift, rebalanced), ivfSec) = timed {
      val d = vectorDir.map(v => VectorIndex.ivfDrift(spark, v))
      val r = d.exists(_ > driftBound)
      if (r) VectorIndex.rebalanceIvf(spark, vectorDir.get)
      (d, r)
    }
    // tier-gated, like the drift gate above: one tiny nightly delta
    // must not trigger an O(index) base rewrite (TextIndex.maintain
    // decides none/merge/full from marker metadata alone)
    val (text, textSec) = timed {
      textDir.map(d => TextIndex.maintain(spark, d))
        .getOrElse(TextIndex.MaintainResult("none", 0))
    }
    require(apdbStore.isEmpty || asOf.isDefined,
      "MaintenanceTool.runNightly: an APDB estate needs the nightly cut " +
        "time (asOf) for chunk retention")
    val (dropped, retSec) = timed {
      (apdbStore, asOf) match {
        case (Some(a), Some(t)) => a.dropExpiredChunks(t)
        case _ => Map.empty[String, Long]
      }
    }
    val (_, conSec) = timed { apdbStore.foreach(_.consolidateNight()) }
    Report(drift, rebalanced, text.action, text.batchesFolded, dropped,
      apdbStore.isDefined,
      Map("ivf" -> ivfSec, "text" -> textSec,
        "retention" -> retSec, "consolidate" -> conSec))
  }

  /** CLI: `runMain graft.MaintenanceTool [--vector <dir>] [--text <dir>]
    * [--drift-bound <d>]` — the APDB verbs need an engine config and run
    * through [[ApSim]]/library callers, not this thin CLI. */
  def main(args: Array[String]): Unit = {
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val report = runNightly(spark,
        vectorDir = opt("--vector"),
        textDir = opt("--text"),
        driftBound = opt("--drift-bound").map(_.toDouble)
          .getOrElse(VectorIndex.DefaultDriftBound))
      println(report.json)
    } finally spark.stop()
  }
}
