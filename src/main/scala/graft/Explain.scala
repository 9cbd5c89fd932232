package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: print the formatted physical plan of the
  * given query keys (default: a representative set covering scan
  * pruning, broadcast joins, window and aggregation shapes).
  *
  * Usage: runMain graft.Explain [sfDir] [key ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("s1_catalog_scan", "s2_region_scan", "s3_source_history",
        "j1_s2o_match", "j3_pixel_range_join", "w1_latest_version",
        "a4_stat_avg", "x3_topk_similarity",
        // round-4 flagships: sketch aggregate, bloom probe, curve scan
        "x35_topk_sketch", "x34_decontaminate_bloom", "x36_zorder_scan",
        // round-7 flagships: hilbert access path, binary two-stage ANN
        "x91_hilbert_scan", "x92_ann_bin_rescore")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // pseudo-keys for subtrees that an eager localCheckpoint hides from
    // the registry key's own formatted plan (the checkpoint materializes
    // during construction, so the declared plan shows only a Scan
    // ExistingRDD above it)
    val extras: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "x30_pairscan" -> ((s, d) => graft.queries.DedupQueries
        .x30PairScan(s, graft.queries.Tables.embeddings(s, d))),
      // r16b pseudo-keys: the two construction subtrees the session's
      // optimization touched, printable without their eager checkpoints
      "x7_keptgrams" -> ((s, d) => graft.queries.DedupQueries
        .x7KeptGrams(s, d, materialize = false)),
      "x60_spanruns" -> ((s, d) => graft.queries.DedupQueries
        .spanRunsOf(graft.queries.Tables.documents(s, d),
          materialize = false)))
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries.get(k).orElse(extras.get(k))
        .getOrElse(sys.error(s"unknown key: $k (not a registry key " +
          "or an Explain pseudo-key)"))(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
