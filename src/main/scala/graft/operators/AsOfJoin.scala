package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic left as-of join — an operator Spark's built-ins lack: for
  * each left row, attach the latest right row whose time is ≤ the left
  * row's time, per key. The reference's validity-interval lookup
  * ("which DiaObject version was current at visit time",
  * `/root/reference/README.md:157-166`, W3) is exactly this shape, as
  * are training-data joins like "latest model score at crawl time".
  *
  * Implementation is the scale-correct union + ordered-window form:
  * both sides shuffle ONCE by key; within each key, rows sort by
  * (time, side) and a running last-non-null carries the most recent
  * right payload forward onto left rows. No per-key loops, no
  * range-join row explosion, and ties (right time == left time) match
  * inclusively because the right side orders first.
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise
  * (nondeterministic tie-winners are the caller's bug to avoid, same
  * contract as DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** Left as-of join. Output: all left columns plus the right payload
    * columns (right key/time columns renamed `matched_<time>`), NULL
    * payload where no right row precedes (direction "backward") or
    * follows ("forward") the left row. Right payload names must not
    * collide with left column names (rename before joining — a silent
    * duplicate would poison downstream references).
    *
    * Directions (both tie-inclusive, like DuckDB's ASOF):
    *  - "backward" (default): latest right with rightTime ≤ leftTime —
    *    "version current at T".
    *  - "forward": earliest right with rightTime ≥ leftTime — "next
    *    scheduled/observed event at or after T". Same single-shuffle
    *    union+window plan, ordered descending. */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be backward|forward, got '$direction'")
    val payloadCols = right.columns.filter(c => c != key && c != rightTime).toSeq
    val leftCols = left.columns.toSeq
    val outNames = s"matched_$rightTime" +: payloadCols
    val clash = outNames.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"as-of right payload columns collide with left columns: " +
        s"${clash.mkString(", ")} — rename one side before joining")
    // a payload column named matched_<rightTime> would duplicate the
    // carried time's field inside the version struct (ambiguous struct
    // field downstream) — fail here with the rename hint instead
    require(!payloadCols.contains(s"matched_$rightTime"),
      s"as-of reserves output name matched_$rightTime; rename the " +
        "right payload column of that name before joining")
    // the union layout reserves three internal names; a left column
    // with one of them would alias-collide deep in the plan (ambiguous
    // reference) instead of failing here with a rename hint
    val reserved = Set("_t", "_side", "_v")
    val resClash = reserved.intersect(leftCols.toSet ++ payloadCols)
    require(resClash.isEmpty,
      s"as-of reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename: ${resClash.mkString(", ")}")

    // the matched version travels as ONE struct so the window carries it
    // atomically: per-column last(ignoreNulls) would resurrect an OLDER
    // version's value for any field that is NULL in the matched version,
    // mixing fields across versions (DuckDB ASOF never does)
    val vType = org.apache.spark.sql.types.StructType(
      right.schema(rightTime).copy(name = s"matched_$rightTime") +:
        payloadCols.map(c => right.schema(c).copy(nullable = true)))

    // a right row with NULL time would sort first in BOTH scan orders
    // (nulls-first either way, by the probe-guard below) and its
    // non-null payload struct would then carry onto every probe in the
    // key partition — fabricating matches DuckDB's ASOF ignores such
    // rows for. Drop them up front: a version with no timestamp can
    // never be "current at T".
    val rightT = right.where(col(rightTime).isNotNull)
    // common layout: key, t, side (0 = right sorts first on ties),
    // matched-version struct, left columns
    val rightU = rightT.select(
      (col(key) +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(col(rightTime).as(s"matched_$rightTime") +:
          payloadCols.map(col): _*).cast(vType).as("_v") +:
        leftCols.filter(_ != key).map(c => lit(null).as(c))): _*)
    val leftU = left.select(
      Seq(col(key),
        col(leftTime).cast(right.schema(rightTime).dataType).as("_t"),
        lit(1).as("_side"),
        lit(null).cast(vType).as("_v")) ++
        leftCols.filter(_ != key).map(col): _*)

    // backward scans time ascending (carry the latest past version
    // forward); forward scans descending (carry the nearest future
    // version backward). Right sorts first on equal times either way →
    // tie-inclusive match. NULL probe times must order BEFORE every
    // right row in scan order so they match nothing (asc defaults to
    // NULLS FIRST; desc defaults to NULLS LAST and would hand a NULL
    // probe the smallest-time version — fabricating a match DuckDB's
    // ASOF returns NULL for).
    val timeOrder =
      if (direction == "backward") col("_t").asc else col("_t").desc_nulls_first
    val w = Window.partitionBy(col(key)).orderBy(timeOrder, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightU.unionByName(leftU)
      .select(col(key) +: col("_side") +:
        last(col("_v"), ignoreNulls = true).over(w).as("_v") +:
        leftCols.filter(_ != key).map(col): _*)
    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        outNames.map(c => col("_v")(c).as(c)): _*)
  }
}
