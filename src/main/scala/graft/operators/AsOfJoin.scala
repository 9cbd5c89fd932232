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
    * payload where no right row precedes the left row. */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTime).toSeq
    val leftCols = left.columns.toSeq

    // common layout: key, t, side (0 = right sorts first on ties),
    // right payload (+ matched time), left columns
    val rightU = right.select(
      (col(key) +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        col(rightTime).as(s"matched_$rightTime") +:
        payloadCols.map(col)) ++
        leftCols.filter(_ != key).map(c => lit(null).as(c)): _*)
    val leftU = left.select(
      (col(key) +: col(leftTime).cast(right.schema(rightTime).dataType).as("_t") +:
        lit(1).as("_side") +:
        lit(null).cast(right.schema(rightTime).dataType).as(s"matched_$rightTime") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
        leftCols.filter(_ != key).map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightU.unionByName(leftU)
      .select(col(key) +: col("_side") +:
        (s"matched_$rightTime" +: payloadCols)
          .map(c => last(col(c), ignoreNulls = true).over(w).as(c)) ++:
        leftCols.filter(_ != key).map(col): _*)
    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        (s"matched_$rightTime" +: payloadCols).map(col): _*)
  }
}
