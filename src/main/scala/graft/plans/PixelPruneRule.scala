package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.apdb.{PixelKernel, SparkGeo}

/** Optimizer rule: a `Filter(region_contains(r, ra, dec))` over a
  * relation that exposes a `pixelId` column gains the region's
  * pixel-range predicates (README.md:118-124 — the reference does this
  * by hand at its API layer; the rule makes it automatic for SQL users).
  * The injected ranges reach the parquet scan as pushed filters →
  * row-group / partition pruning without touching user queries.
  */
object PixelPruneRule extends Rule[LogicalPlan] {

  /** Pixelization level/scheme assumed for UNLABELED pixelId columns;
    * session-configurable (`graft.pixel.level` / `graft.pixel.mode`),
    * defaults 8 / mq3c. Columns labeled by the engine's schemas carry
    * their own (level, mode) metadata, which always wins — range
    * injection is only sound in the id space the column was computed
    * in. */
  def level: Int = org.apache.spark.sql.internal.SQLConf.get
    .getConfString("graft.pixel.level", "8").toInt
  def mode: String = org.apache.spark.sql.internal.SQLConf.get
    .getConfString("graft.pixel.mode", "mq3c")
  def maxRanges: Int = org.apache.spark.sql.internal.SQLConf.get
    .getConfString("graft.pixel.maxRanges", "32").toInt

  /** Split a condition into its top-level conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Metadata keys marking a column as a graft pixel index; written by
    * the engine's schemas. When present they pin the (level, scheme) the
    * envelope must be computed with; an unlabeled Long pixelId is
    * assumed to be a graft index at the session level/mode (documented
    * contract for SQL users registering external tables). */
  val LevelMetadataKey = "graft.pixel.level"
  val ModeMetadataKey = "graft.pixel.mode"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // SOUNDNESS: the envelope restricts rows only when the region
      // predicate must hold for the row to qualify — i.e. when
      // region_contains appears as a TOP-LEVEL CONJUNCT. A negated or
      // OR-ed region predicate must not prune.
      val regionExprs = conjuncts(cond).collect { case rc: RegionContainsExpr => rc }
      // guard: pixelId must be a LongType column (a non-Long pixelId is
      // not a graft index; comparing it to Long literals would also be
      // unsound/unresolvable)
      val pixAttr = child.output.find(a => a.name == "pixelId" &&
        a.dataType == org.apache.spark.sql.types.LongType)
      // guard: skip when no conjunct-level region predicate, no usable
      // pixelId column, or the condition already constrains pixelId
      // (incl. a previous injection)
      if (regionExprs.isEmpty || pixAttr.isEmpty ||
        cond.references.exists(_.name == "pixelId")) f
      else {
        val attr = pixAttr.get
        // guard: pixelId and the region predicate's ra/dec arguments must
        // resolve to the SAME leaf relation — a join output carrying
        // pixelId from the non-spatial side must not prune rows by the
        // other side's coordinates
        val pixLeaf = child.collectLeaves().find(_.outputSet.contains(attr))
        val regions = regionExprs.filter { rc =>
          val refs = rc.references
          refs.nonEmpty && pixLeaf.exists(l => refs.forall(l.outputSet.contains))
        }.map(_.regionStr)
        // the column's recorded (level, scheme) wins over the session
        // defaults: envelopes must be computed in the id space the
        // column was indexed with (an mq3c envelope over an htm column
        // would silently drop qualifying rows)
        val colLevel =
          if (attr.metadata.contains(LevelMetadataKey))
            attr.metadata.getLong(LevelMetadataKey).toInt
          else level
        val colMode =
          if (attr.metadata.contains(ModeMetadataKey))
            attr.metadata.getString(ModeMetadataKey)
          else mode
        // unknown scheme label → not prunable; never throw in the optimizer
        val sky = scala.util.Try(
          graft.geom.SkyPixelization(colMode, colLevel)).toOption
        if (regions.isEmpty || sky.isEmpty) f
        else {
          val rangePreds = regions.map { rs =>
            val ranges = SparkGeo.coarsen(
              sky.get.envelope(PixelKernel.parseRegion(rs)),
              maxRanges)
            ranges.map { case (lo, hi) =>
              And(GreaterThanOrEqual(attr, Literal(lo)), LessThan(attr, Literal(hi)))
            }.reduceLeft[Expression]((a, b) => Or(a, b))
          }.reduceLeft[Expression]((a, b) => And(a, b))
          Filter(And(rangePreds, cond), child)
        }
      }
  }
}

/** Session extensions: native spatial functions for SQL + the pixel
  * pruning rule. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def requireFoldableString(e: Expression, fn: String): String =
    e match {
      case lit @ Literal(_, StringType) => lit.eval().toString
      case other if other.foldable && other.dataType == StringType =>
        other.eval().toString
      case _ => throw new IllegalArgumentException(
        s"$fn: first argument must be a constant region string")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // wrap angle args in Cast(DoubleType): the expressions cannot mix in
    // ExpectsInputTypes (AbstractDataType is private[sql] in Spark 4), so
    // implicit numeric coercion happens here instead
    def dbl(e: Expression): Expression =
      Cast(e, org.apache.spark.sql.types.DoubleType) // no-op cast is folded
    ext.injectFunction((
      new FunctionIdentifier("pixel_index"),
      new ExpressionInfo(classOf[PixelIndexExpr].getName, "pixel_index"),
      (args: Seq[Expression]) => args match {
        case Seq(ra, dec) => PixelIndexExpr(dbl(ra), dbl(dec), PixelPruneRule.level)
        case Seq(ra, dec, Literal(l, _)) =>
          PixelIndexExpr(dbl(ra), dbl(dec), l.toString.toInt)
        case _ => throw new IllegalArgumentException(
          "pixel_index(ra, dec[, level])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sky_pixel_index"),
      new ExpressionInfo(classOf[PixelIndexXyzExpr].getName, "sky_pixel_index"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y, z, Literal(m, StringType)) =>
          PixelIndexXyzExpr(dbl(x), dbl(y), dbl(z), m.toString,
            PixelPruneRule.level)
        case Seq(x, y, z, Literal(m, StringType), Literal(l, _)) =>
          PixelIndexXyzExpr(dbl(x), dbl(y), dbl(z), m.toString,
            l.toString.toInt)
        case _ => throw new IllegalArgumentException(
          "sky_pixel_index(x, y, z, 'htm'|'q3c'|'mq3c'[, level])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("region_contains"),
      new ExpressionInfo(classOf[RegionContainsExpr].getName, "region_contains"),
      (args: Seq[Expression]) => args match {
        case Seq(r, ra, dec) =>
          RegionContainsExpr(requireFoldableString(r, "region_contains"),
            dbl(ra), dbl(dec))
        case _ => throw new IllegalArgumentException(
          "region_contains(regionLiteral, ra, dec)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[ZInterleaveExpr].getName, "z_interleave"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => ZInterleaveExpr(
          Cast(x, org.apache.spark.sql.types.LongType),
          Cast(y, org.apache.spark.sql.types.LongType))
        case _ => throw new IllegalArgumentException("z_interleave(x, y)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndexExpr].getName, "hilbert_index"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => HilbertIndexExpr(
          Cast(x, org.apache.spark.sql.types.LongType),
          Cast(y, org.apache.spark.sql.types.LongType))
        case _ => throw new IllegalArgumentException("hilbert_index(x, y)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bounded_levenshtein"),
      new ExpressionInfo(classOf[BoundedLevenshteinExpr].getName,
        "bounded_levenshtein"),
      (args: Seq[Expression]) => args match {
        // only integral literals: a NULL or fractional bound must hit
        // the contract error below, not NPE/NumberFormatException
        case Seq(a, b, Literal(k: Int, _)) => BoundedLevenshteinExpr(
          Cast(a, StringType), Cast(b, StringType), k)
        case Seq(a, b, Literal(k: Long, _)) => BoundedLevenshteinExpr(
          Cast(a, StringType), Cast(b, StringType), k.toInt)
        case _ => throw new IllegalArgumentException(
          "bounded_levenshtein(a, b, kLiteral) — k must be an integer literal")
      }))
    def requireFoldableInt(e: Expression, fn: String): Int = e match {
      case other if other.foldable && (other.dataType match {
        case _: org.apache.spark.sql.types.IntegerType |
             _: org.apache.spark.sql.types.LongType |
             _: org.apache.spark.sql.types.ShortType |
             _: org.apache.spark.sql.types.ByteType => true
        case _ => false
      }) && other.eval() != null && {
        // a NULL literal or an out-of-Int-range long must fall through
        // to the clean error, not NPE / NumberFormatException
        val v = other.eval().asInstanceOf[Number].longValue()
        v >= 1 && v <= Int.MaxValue
      } => other.eval().asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException(
        s"$fn: capacity must be a constant positive integer")
    }
    ext.injectFunction((
      new FunctionIdentifier("space_saving_topk"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "space_saving_topk"),
      (args: Seq[Expression]) => args match {
        case Seq(item, cap) =>
          SpaceSavingAgg(item, requireFoldableInt(cap, "space_saving_topk"))
        case _ => throw new IllegalArgumentException(
          "space_saving_topk(item, capacity)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("streaming_histogram"),
      new ExpressionInfo(classOf[StreamingHistogramAgg].getName,
        "streaming_histogram"),
      (args: Seq[Expression]) => args match {
        case Seq(value, cap) =>
          StreamingHistogramAgg(value,
            requireFoldableInt(cap, "streaming_histogram"))
        case _ => throw new IllegalArgumentException(
          "streaming_histogram(value, capacity)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_sample"),
      new ExpressionInfo(classOf[TopKSampleAgg].getName, "topk_sample"),
      (args: Seq[Expression]) => args match {
        case Seq(key, id, weight, cap) =>
          TopKSampleAgg(key, id, weight,
            requireFoldableInt(cap, "topk_sample"))
        case _ => throw new IllegalArgumentException(
          "topk_sample(key, id, weight, k)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_scaled"),
      new ExpressionInfo(classOf[DotScaledExpr].getName, "dot_scaled"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotScaledExpr(
          Cast(a, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
          Cast(b, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))
        case _ => throw new IllegalArgumentException("dot_scaled(a, b)")
      }))
    ext.injectOptimizerRule(_ => PixelPruneRule)
    ext.injectOptimizerRule(_ => ZPruneRule)
  }
}
