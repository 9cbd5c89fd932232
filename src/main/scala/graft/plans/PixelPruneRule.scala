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

  /** Must match the pixelId production level (Pixelization.default). */
  val Level = 8
  val MaxRanges = 32

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val regions = cond.collect { case rc: RegionContainsExpr => rc.regionStr }
      val pixAttr = child.output.find(_.name == "pixelId")
      // guard: skip when no region predicate, no pixelId column, or the
      // condition already constrains pixelId (incl. a previous injection)
      if (regions.isEmpty || pixAttr.isEmpty ||
        cond.references.exists(_.name == "pixelId")) f
      else {
        val attr = pixAttr.get
        val rangePreds = regions.map { rs =>
          val ranges = SparkGeo.coarsen(
            PixelKernel.pixAt(Level).envelope(PixelKernel.parseRegion(rs)),
            MaxRanges)
          ranges.map { case (lo, hi) =>
            And(GreaterThanOrEqual(attr, Literal(lo)), LessThan(attr, Literal(hi)))
          }.reduceLeft[Expression]((a, b) => Or(a, b))
        }.reduceLeft[Expression]((a, b) => And(a, b))
        Filter(And(rangePreds, cond), child)
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
    ext.injectFunction((
      new FunctionIdentifier("pixel_index"),
      new ExpressionInfo(classOf[PixelIndexExpr].getName, "pixel_index"),
      (args: Seq[Expression]) => args match {
        case Seq(ra, dec) => PixelIndexExpr(ra, dec, PixelPruneRule.Level)
        case Seq(ra, dec, Literal(l, _)) =>
          PixelIndexExpr(ra, dec, l.toString.toInt)
        case _ => throw new IllegalArgumentException(
          "pixel_index(ra, dec[, level])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("region_contains"),
      new ExpressionInfo(classOf[RegionContainsExpr].getName, "region_contains"),
      (args: Seq[Expression]) => args match {
        case Seq(r, ra, dec) =>
          RegionContainsExpr(requireFoldableString(r, "region_contains"), ra, dec)
        case _ => throw new IllegalArgumentException(
          "region_contains(regionLiteral, ra, dec)")
      }))
    ext.injectOptimizerRule(_ => PixelPruneRule)
  }
}
