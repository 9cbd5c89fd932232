package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene guard over the whole query registry: no query may plan
  * a CartesianProduct (unbounded all-pairs), and nested-loop joins may
  * only appear where a tiny broadcast build side makes them the right
  * plan. Catches the classic regression where an equi-join condition
  * stops being recognized and silently degrades to all-pairs. */
class PlanHygieneSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // non-equi range probes / literal grids where a broadcast nested loop
  // against a handful of rows is the intended physical plan
  private val bnljAllowed = Set("j3_pixel_range_join", "j3_range_join_htm",
    "j3_range_join_q3c", "j4_tile_pixel_overlap",
    "a8_mc_summary", "u3_camera_tiles", "w5_asof_lookup",
    "x18_length_quantiles")

  test("no registered query plans a CartesianProduct") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (!bnljAllowed.contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected BroadcastNestedLoopJoin")
    }
  }
}
