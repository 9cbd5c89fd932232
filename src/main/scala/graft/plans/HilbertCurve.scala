package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve over two 31-bit axes — [[ZCurve]]'s sibling layout
  * with strictly better locality: consecutive curve positions are
  * always GRID NEIGHBORS (the property Morton lacks — z order jumps
  * across the plane at every power-of-two boundary), so an average box
  * decomposes into ~½ the contiguous ranges a z cover needs
  * (HilbertSpec measures the ratio). The trade is a costlier index
  * function (bit rotations per level vs pure interleave) — paid once
  * per row at WRITE time, never at read. Same two-phase contract as
  * [[ZCurve.boxRanges]]: coarse pushable curve ranges + exact refine.
  */
object HilbertCurve {

  /** 31-bit axes for the same reason as [[ZCurve.AxisBits]]: every
    * index and range bound stays a positive signed long. */
  val AxisBits: Int = 31
  val AxisMax: Long = (1L << AxisBits) - 1

  /** Hilbert index of (x, y) on the 2^bits × 2^bits grid — the
    * standard top-down bit descent (quadrant digit + dihedral rotation
    * of the remaining low bits per level). */
  def index(x: Long, y: Long): Long = index(x, y, AxisBits)

  def index(x: Long, y: Long, bits: Int): Long = {
    var xx = x
    var yy = y
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((xx & s) != 0) 1L else 0L
      val ry = if ((yy & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // keep only the sub-square bits, then rotate/reflect them into
      // the child frame
      xx &= s - 1
      yy &= s - 1
      if (ry == 0) {
        if (rx == 1) { xx = s - 1 - xx; yy = s - 1 - yy }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }

  /** Decompose the inclusive box [xLo,xHi] × [yLo,yHi] into sorted
    * disjoint half-open Hilbert ranges covering exactly the box's
    * cells. Quad-tree descent tracking each sub-square's dihedral
    * orientation as an affine frame (corner + two ±axis unit vectors):
    * a fully-contained sub-square at size s contributes the contiguous
    * range [dbase, dbase + s²) — contiguity per sub-square is the
    * defining property of the curve. Children are visited in curve
    * order, so ranges emerge sorted; `maxRanges` coarsens exactly like
    * the z cover (merge smallest gaps; the refine predicate removes
    * the false positives). */
  def boxRanges(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      maxRanges: Int = 64, bits: Int = AxisBits): Seq[(Long, Long)] = {
    require(xLo <= xHi && yLo <= yHi, s"empty box: [$xLo,$xHi]x[$yLo,$yHi]")
    val axisMax = (1L << bits) - 1
    require(xLo >= 0 && yLo >= 0 && xHi <= axisMax && yHi <= axisMax,
      s"box must lie within [0, 2^$bits) axes")
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    // frame: original cell of local (0,0) = (cx, cy); local +u axis =
    // (ux, uy); local +v axis = (vx, vy) (each a ±1 unit vector)
    def rec(cx: Long, cy: Long, ux: Long, uy: Long, vx: Long, vy: Long,
        size: Long, dbase: Long): Unit = {
      val du = size - 1
      val xMin = cx + math.min(0L, du * ux) + math.min(0L, du * vx)
      val xMax = cx + math.max(0L, du * ux) + math.max(0L, du * vx)
      val yMin = cy + math.min(0L, du * uy) + math.min(0L, du * vy)
      val yMax = cy + math.max(0L, du * uy) + math.max(0L, du * vy)
      if (xMin > xHi || xMax < xLo || yMin > yHi || yMax < yLo) return
      if (xMin >= xLo && xMax <= xHi && yMin >= yLo && yMax <= yHi) {
        buf += ((dbase, dbase + size * size)); return
      }
      // size == 1 is always fully inside or outside — handled above
      val h = size >> 1
      val hh = h * h
      // children in curve order, frames derived from the index()
      // descent: Q0 swaps the axes, Q1/Q2 keep them, Q3 negates the
      // swapped axes and anchors at the far corner
      rec(cx, cy, vx, vy, ux, uy, h, dbase)
      rec(cx + h * vx, cy + h * vy, ux, uy, vx, vy, h, dbase + hh)
      rec(cx + h * (ux + vx), cy + h * (uy + vy), ux, uy, vx, vy, h,
        dbase + 2 * hh)
      rec(cx + (2 * h - 1) * ux + (h - 1) * vx,
        cy + (2 * h - 1) * uy + (h - 1) * vy,
        -vx, -vy, -ux, -uy, h, dbase + 3 * hh)
    }
    rec(0L, 0L, 1L, 0L, 0L, 1L, 1L << bits, 0L)
    val merged = mutable.ArrayBuffer.empty[(Long, Long)]
    for (r <- buf) {
      if (merged.nonEmpty && merged.last._2 == r._1)
        merged(merged.size - 1) = (merged.last._1, r._2)
      else merged += r
    }
    graft.apdb.SparkGeo.coarsen(merged.toIndexedSeq, maxRanges)
  }
}

/** Write-side companion, mirroring [[ZOrderLayout.cluster]]: cluster a
  * frame along the Hilbert curve and stamp the same provenance
  * metadata plus `graft.z.curve = hilbert`, so [[ZPruneRule]] injects
  * HILBERT ranges for plain SQL box queries over the clustered table. */
object HilbertLayout {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.MetadataBuilder

  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int,
      hName: String = "hval"): DataFrame = {
    import org.apache.spark.sql.functions.{lit, raise_error, when}
    def guarded(c: Column, label: String): Column = {
      val l = c.cast("long")
      when(l < 0L || l > HilbertCurve.AxisMax,
        raise_error(lit(s"HilbertLayout.cluster: $label outside " +
          s"[0, 2^${HilbertCurve.AxisBits}) — an out-of-domain coordinate " +
          "would silently break pruned reads"))
          .cast("long"))
        .otherwise(l)
    }
    val meta = new MetadataBuilder()
      .putString(ZOrderLayout.XMetadataKey, x.toString)
      .putString(ZOrderLayout.YMetadataKey, y.toString)
      .putString(ZOrderLayout.CurveMetadataKey, ZOrderLayout.CurveHilbert)
      .build()
    df.withColumn(hName,
        SpatialFunctions.hilbert_index(
          guarded(x, x.toString), guarded(y, y.toString)).as(hName, meta))
      .repartitionByRange(numFiles, col(hName))
      .sortWithinPartitions(col(hName))
  }
}

/** `hilbert_index(x, y)` — codegen'd Hilbert position of two long
  * columns on the 2^31 grid; [[HilbertLayout.cluster]]'s write-time
  * kernel (one static call per row, same codegen shape as
  * [[ZInterleaveExpr]]). */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertCurve.index(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.plans.HilbertCurve.index($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
