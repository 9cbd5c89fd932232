package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, ByteType}

/** Optimizer rule: a filter bounding BOTH source dimensions of a
  * z-interleaved column gains the equivalent z-range predicates — so a
  * table written once with [[ZOrderLayout.cluster]] turns every plain
  * SQL box query (`WHERE u BETWEEN … AND t BETWEEN …`) into parquet
  * row-group/file skipping on the sorted z column, with zero query
  * changes. The layout-side metadata ([[ZOrderLayout.XMetadataKey]] /
  * `YMetadataKey`, persisted through parquet round-trips in the Spark
  * schema property) is the provenance proof that `zval =
  * z_interleave(x, y)` for THIS relation — the same
  * metadata-pins-the-id-space contract [[PixelPruneRule]] uses for
  * pixel indexes.
  *
  * Soundness mirrors PixelPruneRule: only TOP-LEVEL conjuncts
  * contribute bounds (a negated or OR-ed bound must not prune); the
  * bound attributes and the z column must resolve to the same leaf
  * relation; the original predicates stay in place as the exact refine,
  * so the injected cover may be coarse but never lossy. */
object ZPruneRule extends Rule[LogicalPlan] {

  /** Range-cover budget, from session conf `graft.zorder.maxRanges`.
    * Parsed defensively: the optimizer is the worst place to throw a
    * bare NumberFormatException, and a value < 1 would degenerate the
    * quad-tree cover (`boxRanges` with no room for any range). */
  def maxRanges: Int = {
    val key = "graft.zorder.maxRanges"
    val raw = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(key, "32")
    val parsed = scala.util.Try(raw.trim.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"$key must be a positive int, got '$raw'"))
    if (parsed < 1) throw new IllegalArgumentException(
      s"$key must be >= 1, got $parsed")
    parsed
  }

  private val AxisMax = ZCurve.AxisMax

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v, LongType) => Some(v.asInstanceOf[Long])
    case Literal(v, IntegerType) => Some(v.asInstanceOf[Int].toLong)
    case Literal(v, ShortType) => Some(v.asInstanceOf[Short].toLong)
    case Literal(v, ByteType) => Some(v.asInstanceOf[Byte].toLong)
    case Cast(inner, _, _, _) => litLong(inner)
    case _ => None
  }

  /** Tightest [lo, hi] box for `name` from the top-level conjuncts
    * (unbounded sides default to the full axis). Returns None when no
    * conjunct bounds the attribute at all. */
  private def boundsOf(name: String, cs: Seq[Expression],
      leaf: Option[LogicalPlan]): Option[(Long, Long)] = {
    def sameLeaf(a: Attribute): Boolean =
      a.name == name && leaf.exists(_.outputSet.contains(a))
    var lo = 0L
    var hi = AxisMax
    var found = false
    cs.foreach {
      case GreaterThanOrEqual(a: Attribute, l) if sameLeaf(a) =>
        litLong(l).foreach { v => lo = math.max(lo, v); found = true }
      case GreaterThan(a: Attribute, l) if sameLeaf(a) =>
        litLong(l).foreach { v => lo = math.max(lo, v + 1); found = true }
      case LessThanOrEqual(a: Attribute, l) if sameLeaf(a) =>
        litLong(l).foreach { v => hi = math.min(hi, v); found = true }
      case LessThan(a: Attribute, l) if sameLeaf(a) =>
        litLong(l).foreach { v => hi = math.min(hi, v - 1); found = true }
      case EqualTo(a: Attribute, l) if sameLeaf(a) =>
        litLong(l).foreach { v =>
          lo = math.max(lo, v); hi = math.min(hi, v); found = true
        }
      // mirrored literal-first forms
      case GreaterThanOrEqual(l, a: Attribute) if sameLeaf(a) =>
        litLong(l).foreach { v => hi = math.min(hi, v); found = true }
      case GreaterThan(l, a: Attribute) if sameLeaf(a) =>
        litLong(l).foreach { v => hi = math.min(hi, v - 1); found = true }
      case LessThanOrEqual(l, a: Attribute) if sameLeaf(a) =>
        litLong(l).foreach { v => lo = math.max(lo, v); found = true }
      case LessThan(l, a: Attribute) if sameLeaf(a) =>
        litLong(l).foreach { v => lo = math.max(lo, v + 1); found = true }
      case EqualTo(l, a: Attribute) if sameLeaf(a) =>
        litLong(l).foreach { v =>
          lo = math.max(lo, v); hi = math.min(hi, v); found = true
        }
      case _ =>
    }
    // clamp into the curve's domain; an empty box means the original
    // predicates already reject every row — nothing useful to inject
    if (!found || lo > hi || hi < 0 || lo > AxisMax) None
    else Some((math.max(lo, 0L), math.min(hi, AxisMax)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val zAttr = child.output.find { a =>
        a.dataType == LongType &&
          a.metadata.contains(ZOrderLayout.XMetadataKey) &&
          a.metadata.contains(ZOrderLayout.YMetadataKey)
      }
      if (zAttr.isEmpty || cond.references.exists(_.name == zAttr.get.name)) f
      else {
        val attr = zAttr.get
        val xName = attr.metadata.getString(ZOrderLayout.XMetadataKey)
        val yName = attr.metadata.getString(ZOrderLayout.YMetadataKey)
        val leaf = child.collectLeaves().find(_.outputSet.contains(attr))
        val cs = conjuncts(cond)
        (boundsOf(xName, cs, leaf), boundsOf(yName, cs, leaf)) match {
          // require BOTH axes bounded: a half-open box degenerates to
          // stripes covering most of the curve — not worth a predicate
          case (Some((xLo, xHi)), Some((yLo, yHi))) =>
            // decompose with the curve the WRITE used (metadata-pinned;
            // absent = z, the only curve that ever wrote without the key)
            val curve =
              if (attr.metadata.contains(ZOrderLayout.CurveMetadataKey))
                attr.metadata.getString(ZOrderLayout.CurveMetadataKey)
              else ZOrderLayout.CurveZ
            val ranges = curve match {
              case ZOrderLayout.CurveHilbert =>
                Some(HilbertCurve.boxRanges(xLo, xHi, yLo, yHi, maxRanges))
              case ZOrderLayout.CurveZ =>
                Some(ZCurve.boxRanges(xLo, xHi, yLo, yHi, maxRanges))
              // unknown curve: provenance we cannot honor — never
              // inject ranges computed in the wrong id space
              case _ => None
            }
            ranges.fold(f: LogicalPlan) { rs =>
              val zPred = rs.map { case (lo, hi) =>
                And(GreaterThanOrEqual(attr, Literal(lo)),
                  LessThan(attr, Literal(hi)))
              }.reduceLeft[Expression]((a, b) => Or(a, b))
              Filter(And(zPred, cond), child)
            }
          case _ => f
        }
      }
  }
}
