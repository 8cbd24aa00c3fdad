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
  *  - a single ASCENDING, NULLS FIRST, LONG-typed ordering key:
  *    integer keys make the open bound `v+lo-1` exact; nulls-first
  *    puts every null peer in BOTH cumulative prefixes of a non-null
  *    row, so they cancel. For a NULL row Spark degenerates every
  *    RANGE frame to the null peer group, so `cumLo` is zeroed via an
  *    IS NULL guard (both cumulative frames equal the peer-group count
  *    there — subtracting would yield 0, not the peer count).
  *    Narrower integral keys (byte/short/int) are deliberately NOT
  *    rewritten: the cumulative form evaluates `key + (lo-1)` per row,
  *    one closer to the type minimum than anything the original frame
  *    computes, so a key within |lo|+1 of the minimum would overflow
  *    (ANSI throw / wrapped bound) where the original succeeds — and
  *    min-adjacent sentinel values are REALISTIC in 32-bit-and-under
  *    domains. For longs the divergence window is
  *    (Long.MinValue, Long.MinValue+|lo|], keys no real ordering
  *    domain (ids, cents, epoch times) produces, and one step from
  *    where the ORIGINAL query's own `key + lo` bound overflows too.
  *  - both bounds are literals (or CURRENT ROW); a literal lower bound
  *    at Long.MinValue cannot be decremented and is skipped.
  *
  * Installed by [[GraftExtensions]]; disable per session with
  * `spark.graft.window.cumulativeRangeRewrite=false`.
  */
case class SlidingRangeCountRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import SlidingRangeCountRewrite.ConfKey

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // accept the common falsy/truthy spellings; an unparsable value must
    // NOT silently keep the rewrite on (the user typed it to disable) —
    // warn once PER VALUE (the rule fires per query per fixed-point
    // iteration; an unguarded warning floods the log) and treat it as
    // disabled, the conservative reading
    val enabled = spark.conf.getOption(ConfKey).forall { v =>
      v.trim.toLowerCase match {
        case "true" | "1" | "on" | "yes" | "enabled" => true
        case "false" | "0" | "off" | "no" | "disabled" => false
        case other =>
          if (SlidingRangeCountRewrite.warnedValues.add(other))
            logWarning(s"unrecognized $ConfKey value '$other' — treating as " +
              "disabled; use true/false")
          false
      }
    }
    if (!enabled) plan
    else plan.transformDown {
      case w: Window =>
        var changed = false
        val rewritten = w.windowExpressions.map {
          case a @ Alias(WindowExpression(
              agg @ AggregateExpression(_: Count, Complete, false, None, _),
              spec @ WindowSpecDefinition(_,
                Seq(SortOrder(key, Ascending, NullsFirst, _)),
                SpecifiedWindowFrame(RangeFrame, lower, upper))), _)
              if key.dataType == LongType && upperOk(upper) =>
            decrementedBound(lower).map { loMinus1 =>
              val cumHi = WindowExpression(agg, spec.copy(frameSpecification =
                SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, upper)))
              val cumLo = WindowExpression(agg, spec.copy(frameSpecification =
                SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, loMinus1)))
              val loTerm =
                if (key.nullable) If(IsNull(key), Literal(0L), cumLo) else cumLo
              changed = true
              Alias(Subtract(cumHi, loTerm), a.name)(
                a.exprId, a.qualifier, a.explicitMetadata,
                a.nonInheritableMetadataKeys)
            }.getOrElse(a)
          case other => other
        }
        if (!changed) w else w.copy(windowExpressions = rewritten)
    }
  }

  private def upperOk(e: Expression): Boolean = e match {
    case Literal(_: Long, LongType) => true
    case CurrentRow => true
    case _ => false // unbounded / expression / non-long bounds: untouched
  }

  /** `lo - 1` as a long literal, or None when the bound shape is
    * ineligible or the decrement would underflow. CURRENT ROW is
    * offset 0. (Long-typed keys take long-typed bounds, so no other
    * literal type can appear on an eligible frame.) */
  private def decrementedBound(lower: Expression): Option[Literal] =
    lower match {
      case Literal(v: Long, LongType) if v != Long.MinValue => Some(Literal(v - 1))
      case CurrentRow => Some(Literal(-1L))
      case _ => None // unbounded-preceding (already cumulative) or expression
    }
}

object SlidingRangeCountRewrite {
  val ConfKey = "spark.graft.window.cumulativeRangeRewrite"
  /** Unparsable conf values already warned about (once per value). */
  private[plans] val warnedValues =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
