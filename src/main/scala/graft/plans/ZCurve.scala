package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve over two 32-bit axes: the multi-dimensional
  * data-layout primitive (interleave at write time, sort by z, and a
  * 2-D box query becomes a handful of 1-D z ranges that push down to
  * parquet row-group min/max pruning). The same quad-tree descent the
  * spatial envelope code uses (`geom/SkyPix.scala`), applied to generic
  * (key, time) layout instead of sky coordinates — the standard
  * clustering trick for "filter by user AND time window" scans over
  * 100 TB fact tables. */
object ZCurve {

  /** Spread the low 32 bits of `x` onto even bit positions (0,2,4,…). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 64-bit Morton code: `x` on even bits, `y` on odd bits. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Axis domain for the RANGE layer: 31 bits, so every z code and
    * every range bound stays a POSITIVE signed long. A 32-bit y would
    * put its top bit at z bit 63 — negative codes whose signed
    * comparisons (the injected predicates, `coarsen`'s sort) silently
    * scramble, and a fully-contained top quadrant's `hi` bound would
    * overflow to Long.MinValue. 2^31 values per axis is the contract
    * [[ZOrderLayout.cluster]] enforces at write time. */
  val AxisBits = 31
  val AxisMax: Long = (1L << AxisBits) - 1

  /** Decompose the inclusive box [xLo,xHi] × [yLo,yHi] (31-bit axes)
    * into sorted disjoint half-open z ranges covering EXACTLY the box's
    * cells — quad-tree descent emitting a full range per fully-contained
    * quadrant, recursing on boundary quadrants (children visited in
    * ascending z, so the output needs no sort). `maxRanges` coarsens by
    * merging the smallest inter-range gaps: a coarser cover scans a few
    * false-positive rows (removed by the refine predicate) in exchange
    * for fewer pushed-down disjuncts — the same two-phase
    * prune-then-refine contract as the spatial reads
    * (`apdb/ApdbSpark.scala` region scan). */
  def boxRanges(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(xLo <= xHi && yLo <= yHi, s"empty box: [$xLo,$xHi]x[$yLo,$yHi]")
    require(xLo >= 0 && yLo >= 0 && xHi <= AxisMax && yHi <= AxisMax,
      s"box must lie within [0, 2^$AxisBits) axes")
    val bits = AxisBits
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    def rec(cx: Long, cy: Long, level: Int, zbase: Long): Unit = {
      val size = 1L << (bits - level)
      val cxHi = cx + size - 1
      val cyHi = cy + size - 1
      if (cx > xHi || cxHi < xLo || cy > yHi || cyHi < yLo) return
      // level > 0 guard: the whole-plane cell's z span (1 << 64) would
      // overflow; the root always descends instead
      if (level > 0 && cx >= xLo && cxHi <= xHi && cy >= yLo && cyHi <= yHi) {
        buf += ((zbase, zbase + (1L << (2 * (bits - level)))))
        return
      }
      if (level == bits) { buf += ((zbase, zbase + 1)); return }
      val h = size >> 1
      val cellZ = 1L << (2 * (bits - level - 1))
      rec(cx, cy, level + 1, zbase)
      rec(cx + h, cy, level + 1, zbase + cellZ)
      rec(cx, cy + h, level + 1, zbase + 2 * cellZ)
      rec(cx + h, cy + h, level + 1, zbase + 3 * cellZ)
    }
    rec(0L, 0L, 0, 0L)
    // merge touching neighbors (children emitted in z order ⇒ sorted)
    val merged = mutable.ArrayBuffer.empty[(Long, Long)]
    for (r <- buf) {
      if (merged.nonEmpty && merged.last._2 == r._1)
        merged(merged.size - 1) = (merged.last._1, r._2)
      else merged += r
    }
    graft.apdb.SparkGeo.coarsen(merged.toIndexedSeq, maxRanges)
  }
}

/** Write-side companion of [[ZCurve]]: cluster a frame along the curve
  * so each output file owns one contiguous z segment — parquet min/max
  * stats on the z column then prune row groups for any
  * [[ZCurve.boxRanges]] predicate. */
object ZOrderLayout {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.MetadataBuilder

  /** Column metadata recording WHICH source columns a z column
    * interleaves — the provenance [[ZPruneRule]] requires before
    * injecting range predicates (persisted through parquet round-trips
    * in the Spark schema property, like the pixel index metadata). */
  val XMetadataKey = "graft.z.x"
  val YMetadataKey = "graft.z.y"
  /** Which space-filling curve produced the column ("z" / "hilbert") —
    * [[ZPruneRule]] must decompose boxes with the SAME curve the write
    * used or the injected ranges select the wrong rows. Absent on
    * tables written before the key existed ⇒ treated as "z" (the only
    * curve that ever wrote without it). */
  val CurveMetadataKey = "graft.z.curve"
  val CurveZ = "z"
  val CurveHilbert = "hilbert"

  /** Add the interleaved `zName` column, range-partition by it into
    * `numFiles` curve segments, sort within each: ready for
    * `.write.parquet` (per-file z ranges come out disjoint, so file- and
    * row-group-level skipping both engage on z-range filters). The
    * source-column names must be plain attributes — they are recorded in
    * the z column's metadata so [[ZPruneRule]] can later prove box
    * filters against them prunable.
    *
    * The write FAILS on any coordinate outside [0, 2^31): a wrapped or
    * sign-bit-reaching value would land on an unrelated (or negative)
    * curve position, and a later pruned read would then DROP the row —
    * the metadata is a provenance contract ("zval interleaves x,y AND
    * both are in-domain"), so it must not be stamped on data that
    * violates it. */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int,
      zName: String = "zval"): DataFrame = {
    import org.apache.spark.sql.functions.{lit, raise_error, when}
    def guarded(c: Column, label: String): Column = {
      val l = c.cast("long")
      when(l < 0L || l > ZCurve.AxisMax,
        raise_error(lit(s"ZOrderLayout.cluster: $label outside " +
          s"[0, 2^${ZCurve.AxisBits}) — an out-of-domain coordinate " +
          "would silently break pruned reads"))
          .cast("long"))
        .otherwise(l)
    }
    val meta = new MetadataBuilder()
      .putString(XMetadataKey, x.toString)
      .putString(YMetadataKey, y.toString)
      .putString(CurveMetadataKey, CurveZ)
      .build()
    df.withColumn(zName,
        SpatialFunctions.z_interleave(
          guarded(x, x.toString), guarded(y, y.toString)).as(zName, meta))
      .repartitionByRange(numFiles, col(zName))
      .sortWithinPartitions(col(zName))
  }
}

/** `z_interleave(x, y)` — codegen'd 64-bit Morton code of two long
  * columns (each masked to 32 bits). The write-time companion of
  * [[ZCurve.boxRanges]]: sort/partition by this column for
  * multi-dimensional locality. */
case class ZInterleaveExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "z_interleave"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZCurve.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.plans.ZCurve.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
