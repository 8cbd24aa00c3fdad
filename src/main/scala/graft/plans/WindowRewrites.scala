package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrite sliding-RANGE window COUNTs into a difference of two
  * cumulative counts.
  *
  * `count(x) OVER (... ORDER BY k RANGE BETWEEN lo PRECEDING AND hi
  * FOLLOWING)` re-aggregates the frame from scratch for every row in
  * Spark's sliding-frame processor — O(rows x frame width). The same
  * number is `cum(k <= v+hi) - cum(k <= v+lo-1)`, and both
  * UNBOUNDED-PRECEDING frames advance incrementally in ONE pass over
  * the same sort — O(rows), no new Exchange, no second WindowExec
  * (WindowExec evaluates multiple frames of one (partition, order) in
  * a single node). Measured on the catalog's value-neighborhood query:
  * 4.9-7.4 s -> 1.2 s at sf0.1 (~870-row frames); the decade sweep in
  * BASELINE.md shows the win growing with frame width (~14x on the
  * window compute at 20k-row frames) and a tie, not a loss, on narrow
  * frames — so the rewrite is unconditional when it is exact.
  *
  * Exactness conditions (anything else is left untouched):
  *  - the function is a plain COUNT — no DISTINCT, no FILTER clause.
  *    Count never returns null, so the subtraction is total; additive
  *    SUM is deliberately NOT rewritten (an empty sliding frame yields
  *    NULL, while the difference of two equal cumulative sums yields
  *    0 — the one observable divergence).
  *  - a single ASCENDING, NULLS FIRST, integral-typed ordering key:
  *    integer keys make the open bound `v+lo-1` exact; nulls-first
  *    puts every null peer in BOTH cumulative prefixes of a non-null
  *    row, so they cancel. For a NULL row Spark degenerates every
  *    RANGE frame to the null peer group, so `cumLo` is zeroed via an
  *    IS NULL guard (both cumulative frames equal the peer-group count
  *    there — subtracting would yield 0, not the peer count).
  *  - both bounds are literals (or CURRENT ROW); a literal lower bound
  *    at the type's minimum cannot be decremented and is skipped.
  *
  * Installed by [[GraftExtensions]]; disable per session with
  * `spark.graft.window.cumulativeRangeRewrite=false`.
  */
case class SlidingRangeCountRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import SlidingRangeCountRewrite.ConfKey

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf.getOption(ConfKey).forall(v =>
      scala.util.Try(v.trim.toBoolean).getOrElse(true))
    if (!enabled) plan
    else plan.transformDown {
      case w: Window =>
        val rewritten = w.windowExpressions.map {
          case a @ Alias(WindowExpression(
              agg @ AggregateExpression(_: Count, Complete, false, None, _),
              spec @ WindowSpecDefinition(_,
                Seq(SortOrder(key, Ascending, NullsFirst, _)),
                SpecifiedWindowFrame(RangeFrame, lower, upper))), _)
              if integral(key.dataType) && upperOk(upper) =>
            decrementedBound(lower, key.dataType).map { loMinus1 =>
              val cumHi = WindowExpression(agg, spec.copy(frameSpecification =
                SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, upper)))
              val cumLo = WindowExpression(agg, spec.copy(frameSpecification =
                SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, loMinus1)))
              val loTerm =
                if (key.nullable) If(IsNull(key), Literal(0L), cumLo) else cumLo
              Alias(Subtract(cumHi, loTerm), a.name)(
                a.exprId, a.qualifier, a.explicitMetadata,
                a.nonInheritableMetadataKeys)
            }.getOrElse(a)
          case other => other
        }
        if (rewritten eq w.windowExpressions) w
        else w.copy(windowExpressions = rewritten)
    }
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def upperOk(e: Expression): Boolean = e match {
    case l: Literal => integral(l.dataType)
    case CurrentRow => true
    case _ => false // unbounded / expression bounds: leave untouched
  }

  /** `lo - 1` as a literal of the original bound's type, or None when
    * the bound shape is ineligible or the decrement would underflow.
    * CURRENT ROW is offset 0, typed like the ordering key. */
  private def decrementedBound(lower: Expression, keyType: DataType): Option[Literal] =
    lower match {
      case Literal(v: Long, LongType) if v != Long.MinValue => Some(Literal(v - 1))
      case Literal(v: Int, IntegerType) if v != Int.MinValue => Some(Literal(v - 1))
      case Literal(v: Short, ShortType) if v != Short.MinValue =>
        Some(Literal((v - 1).toShort))
      case Literal(v: Byte, ByteType) if v != Byte.MinValue =>
        Some(Literal((v - 1).toByte))
      case CurrentRow => keyType match {
        case LongType => Some(Literal(-1L))
        case IntegerType => Some(Literal(-1))
        case ShortType => Some(Literal((-1).toShort))
        case ByteType => Some(Literal((-1).toByte))
        case _ => None
      }
      case _ => None // unbounded-preceding (already cumulative) or expression
    }
}

object SlidingRangeCountRewrite {
  val ConfKey = "spark.graft.window.cumulativeRangeRewrite"
}
