package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.apdb.{PixelKernel, RegionCodec}
import graft.geom.Region

/** Native Catalyst expressions for the spatial kernel (SURVEY §2.9/§7.3):
  * stay inside whole-stage codegen by emitting static calls into
  * [[PixelKernel]] — no UDF wrapping, no serialization per row.
  */

/** `pixel_index(ra, dec)` at a fixed quad-cube level. */
case class PixelIndexExpr(left: Expression, right: Expression, level: Int)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "pixel_index"

  override protected def nullSafeEval(ra: Any, dec: Any): Any =
    PixelKernel.indexRaDec(ra.asInstanceOf[Double], dec.asInstanceOf[Double], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ra, dec) =>
      s"graft.apdb.PixelKernel.indexRaDec($ra, $dec, $level)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `sky_pixel_index(x, y, z)` for a scheme-parametrized pixelization
  * (htm / q3c / mq3c). The iterative HTM descent can't be pure column
  * math, so codegen emits one static call into the cached kernel —
  * still inside whole-stage codegen, no UDF serialization. */
case class PixelIndexXyzExpr(first: Expression, second: Expression,
    third: Expression, mode: String, level: Int)
    extends TernaryExpression with Serializable {

  // the mode string is spliced into generated Java — restrict it to the
  // known scheme names so a malformed SQL literal cannot break codegen
  require(Set("htm", "q3c", "mq3c").contains(mode),
    s"unknown pixelization mode '$mode' (htm, q3c, mq3c)")

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "sky_pixel_index"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    PixelKernel.indexXyz(x.asInstanceOf[Double], y.asInstanceOf[Double],
      z.asInstanceOf[Double], mode, level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) =>
      s"""graft.apdb.PixelKernel.indexXyz($x, $y, $z, "$mode", $level)""")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `region_contains('<region-literal>', ra, dec)` — the region is a
  * compile-time constant (RegionCodec form), parsed once and shipped as
  * a codegen reference object. */
case class RegionContainsExpr(regionStr: String, left: Expression,
    right: Expression) extends BinaryExpression with Serializable {

  @transient lazy val region: Region = PixelKernel.parseRegion(regionStr)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "region_contains"

  override protected def nullSafeEval(ra: Any, dec: Any): Any =
    PixelKernel.contains(region, ra.asInstanceOf[Double], dec.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val regionRef = ctx.addReferenceObj("graftRegion", region,
      classOf[Region].getName)
    defineCodeGen(ctx, ev, (ra, dec) =>
      s"graft.apdb.PixelKernel.contains($regionRef, $ra, $dec)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[DotScaledExpr]] — operates on Catalyst
  * ArrayData directly so generated code makes ONE static call per row
  * (no per-row array copy into JVM objects). */
object VectorKernel {
  def dotScaled(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val v = a.getDouble(i) * b.getDouble(i) * 1000000d
      // half-away-from-zero, the SQL round() rule (Math.round is half-up)
      s += (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
      i += 1
    }
    s
  }
}

/** Static kernel for [[JlProjectExpr]]: one call projects the whole
  * embedding row to `outDims` scaled-long sums. Rounding per TERM is
  * half-away-from-zero (the SQL `round()` rule), then terms sum as
  * longs — identical arithmetic to the unrolled
  * `Σ round(xⱼ·sgnᵢⱼ·1e6)` literal-tree form, but the 1024-term tree
  * (≈3 s of one-time Janino codegen) becomes a single static call. */
object JlKernel {
  def project(a: org.apache.spark.sql.catalyst.util.ArrayData,
      signs: Array[Byte], outDims: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val inDims = signs.length / outDims
    val out = new Array[Long](outDims)
    var i = 0
    while (i < outDims) {
      val base = i * inDims
      var s = 0L
      var j = 0
      while (j < inDims) {
        val v = a.getDouble(j) * signs(base + j) * 1000000d
        s += (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        j += 1
      }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `jl_project(embedding)` — seeded ±1 Johnson–Lindenstrauss projection
  * to `outDims` scaled longs (÷1e6 for the real value). The sign matrix
  * rides the plan as a codegen reference object (flat row-major bytes),
  * so plan size and codegen time are independent of dims — the
  * Catalyst-native replacement for unrolling dims×dims `round()` terms
  * into the plan (x72's original form, which paid ~3 s of one-time
  * whole-stage-codegen compilation for a 16×64 matrix and would not
  * scale to 1024-dim embeddings at all). */
case class JlProjectExpr(child: Expression, signs: Array[Byte], outDims: Int)
    extends UnaryExpression with Serializable {
  require(outDims > 0 && signs.length % outDims == 0,
    s"sign matrix length ${signs.length} not divisible by outDims $outDims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project"

  override protected def nullSafeEval(a: Any): Any =
    JlKernel.project(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      signs, outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jlSigns", signs, "byte[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.JlKernel.project($a, $ref, $outDims)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array[Byte] compares by reference under case-class equality, which
  // would make two structurally identical jl_project expressions never
  // canonicalize (defeating Catalyst CSE/reuse). Compare matrix CONTENT.
  override def equals(other: Any): Boolean = other match {
    case that: JlProjectExpr =>
      child == that.child && outDims == that.outDims &&
        java.util.Arrays.equals(signs, that.signs)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + outDims) + java.util.Arrays.hashCode(signs)
}

/** `dot_scaled(a, b)` — THE exact-integer scaled dot product of the
  * engine (Σ round(aᵢ·bᵢ·1e6) as a long; summation-order-independent,
  * so every engine computes the identical value — the property all
  * embedding oracles rely on). A native codegen'd expression: the
  * Catalyst-preferred form of the same arithmetic the Dataset kernels
  * ([[graft.queries.DedupQueries.dotScaled]]) use on the block-GEMM
  * paths where rows are already primitive arrays. Array elements must
  * be non-null doubles (cast the float embedding column first). */
case class DotScaledExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "dot_scaled"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dotScaled(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorKernel.dotScaled($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static codegen entry point for [[BoundedLevenshteinExpr]] — banded
  * O(k·min(n,m)) edit-distance with early exit, vs the O(n·m) full DP
  * of the built-in `levenshtein`. For a similarity join that only asks
  * "is ED ≤ k" (k tiny), the bound is the whole cost model: a band of
  * 2k+1 cells per row and a bail-out the moment a row's minimum
  * exceeds k. Distances above k all collapse to k+1. */
object StringKernel {
  def boundedLev(ua: org.apache.spark.unsafe.types.UTF8String,
      ub: org.apache.spark.unsafe.types.UTF8String, k: Int): Int = {
    // length screen BEFORE any allocation (numChars counts CODE POINTS
    // over the raw bytes — no String materialization)
    val nc = ua.numChars(); val mc = ub.numChars()
    if (math.abs(nc - mc) > k) return k + 1
    // k = 1 — the similarity-join case (x69 refines ~Σ|group|² pairs
    // through this) — has a closed-form O(len) decision: ED ≤ 1 ⟺ the
    // strings align after skipping at most one position. The r15 ×10
    // probe put 75% of x69 in this kernel, nearly all of it the SIX
    // allocations per call below (two Strings, two codepoint arrays,
    // two DP rows); this path allocates NOTHING on ASCII input and the
    // result is bit-equal to the banded DP (min(lev, 2)).
    if (k == 1) return lev1(ua, ub, nc, mc)
    // CODE POINTS, not UTF-16 code units: the builtin levenshtein (and
    // DuckDB's) count supplementary-plane characters as one edit, and
    // the "<= k iff levenshtein <= k" contract must hold there too
    val a = ua.toString.codePoints.toArray
    val b = ub.toString.codePoints.toArray
    val n = a.length; val m = b.length
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        var c = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        if (prev(j) + 1 < c) c = prev(j) + 1
        if (cur(j - 1) + 1 < c) c = cur(j - 1) + 1
        if (c > inf) c = inf
        cur(j) = c
        if (c < rowMin) rowMin = c
        j += 1
      }
      if (rowMin >= inf) return inf
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), inf)
  }

  /** min(levenshtein, 2) by two-pointer alignment — exact for every
    * value the k=1 contract can return (0, 1, 2). `nc`/`mc` are the
    * precomputed code-point counts with |nc − mc| ≤ 1. ASCII strings
    * (code points == bytes) compare on the raw UTF8String bytes with
    * zero allocations; anything else falls back to codepoint arrays
    * and the same two-pointer. */
  private def lev1(ua: org.apache.spark.unsafe.types.UTF8String,
      ub: org.apache.spark.unsafe.types.UTF8String, nc: Int, mc: Int): Int = {
    if (ua.numBytes == nc && ub.numBytes == mc) {
      // ASCII fast path: one code point per byte
      if (nc == mc) {
        var i = 0
        while (i < nc && ua.getByte(i) == ub.getByte(i)) i += 1
        if (i == nc) return 0
        var j = i + 1
        while (j < nc && ua.getByte(j) == ub.getByte(j)) j += 1
        if (j == nc) 1 else 2
      } else {
        // wlog a = longer (n = m + 1): ED = 1 ⟺ skipping one char of
        // a aligns the rest
        val (la, lb, m) = if (nc > mc) (ua, ub, mc) else (ub, ua, nc)
        var i = 0
        while (i < m && la.getByte(i) == lb.getByte(i)) i += 1
        var j = i
        while (j < m && la.getByte(j + 1) == lb.getByte(j)) j += 1
        if (j == m) 1 else 2
      }
    } else {
      val a = ua.toString.codePoints.toArray
      val b = ub.toString.codePoints.toArray
      if (a.length == b.length) {
        val n = a.length
        var i = 0
        while (i < n && a(i) == b(i)) i += 1
        if (i == n) return 0
        var j = i + 1
        while (j < n && a(j) == b(j)) j += 1
        if (j == n) 1 else 2
      } else {
        val (la, lb) = if (a.length > b.length) (a, b) else (b, a)
        val m = lb.length
        var i = 0
        while (i < m && la(i) == lb(i)) i += 1
        var j = i
        while (j < m && la(j + 1) == lb(j)) j += 1
        if (j == m) 1 else 2
      }
    }
  }
}

/** `bounded_levenshtein(a, b, k)` — edit distance clamped at k+1 with
  * a banded DP and per-row early exit; the refine kernel for ED≤k
  * similarity joins (x69). Semantically: equal to `levenshtein(a, b)`
  * whenever that is ≤ k, and exactly k+1 otherwise — so
  * `bounded_levenshtein(a, b, k) <= k` ⟺ `levenshtein(a, b) <= k`,
  * at O(k·len) instead of O(len²). */
case class BoundedLevenshteinExpr(left: Expression, right: Expression,
    bound: Int) extends BinaryExpression with Serializable {
  require(bound >= 0, s"bounded_levenshtein bound must be >= 0, got $bound")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bounded_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringKernel.boundedLev(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.StringKernel.boundedLev($a, $b, $bound)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpatialFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column-API access to the native expressions (angles coerced to
    * double; the expressions can't use ExpectsInputTypes since
    * AbstractDataType is private[sql] in Spark 4). */
  def pixel_index(ra: Column, dec: Column, level: Int = 8): Column =
    column(PixelIndexExpr(expression(ra.cast("double")),
      expression(dec.cast("double")), level))

  def region_contains(region: Region, ra: Column, dec: Column): Column =
    column(RegionContainsExpr(RegionCodec.encode(region),
      expression(ra.cast("double")), expression(dec.cast("double"))))

  def sky_pixel_index(x: Column, y: Column, z: Column, mode: String,
      level: Int): Column =
    column(PixelIndexXyzExpr(expression(x.cast("double")),
      expression(y.cast("double")), expression(z.cast("double")),
      mode, level))

  def dot_scaled(a: Column, b: Column): Column =
    column(DotScaledExpr(expression(a.cast("array<double>")),
      expression(b.cast("array<double>"))))

  def z_interleave(x: Column, y: Column): Column =
    column(ZInterleaveExpr(expression(x.cast("long")),
      expression(y.cast("long"))))

  def hilbert_index(x: Column, y: Column): Column =
    column(HilbertIndexExpr(expression(x.cast("long")),
      expression(y.cast("long"))))

  def bounded_levenshtein(a: Column, b: Column, k: Int): Column =
    column(BoundedLevenshteinExpr(expression(a.cast("string")),
      expression(b.cast("string")), k))

  def jl_project(emb: Column, signs: Array[Byte], outDims: Int): Column =
    column(JlProjectExpr(expression(emb.cast("array<double>")), signs, outDims))
}
