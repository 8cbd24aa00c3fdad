package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge, DoubleUnaryInput}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-preserving reinterpretation of a double as a signed long —
  * the bridge that lets the k-bounded LONG aggregates
  * ([[graft.operators.GroupTopK]], ExactKnn's heap) rank double-valued
  * keys without a per-group window sort. IEEE-754 doubles compare like
  * their sign-magnitude bit patterns, so the standard total-order map
  * (flip all bits of negatives, flip only the sign bit of
  * non-negatives) makes SIGNED long comparison agree with double
  * comparison for every finite value, -0.0 < +0.0, and NaN above all
  * finites (Java's doubleToLongBits canonicalizes NaN). The map is the
  * SIGNED-sortable form (Lucene's doubleToSortableLong): negatives flip
  * every bit except the sign, positives pass through — NOT the
  * unsigned-comparable variant (bits ^ ((bits>>63)|MIN)), whose two
  * branches invert under signed comparison. Exactly invertible, no
  * precision loss — unlike any scale-and-truncate integerization, two
  * distinct doubles NEVER collapse, so rank tie-breaks fire exactly
  * when the oracle's ORDER BY sees a tie — with ONE caveat for
  * SQL-oracle parity: the map distinguishes -0.0 < +0.0 (Java's total
  * order) while SQL ORDER BY treats them equal and falls through to
  * the tie-break column, so oracle-checked callers must feed keys that
  * cannot be negative zero (any u/w with u >= 0, w > 0 qualifies). */
case class DoubleOrderBits(child: Expression)
    extends UnaryExpression with DoubleUnaryInput {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_order_bits"

  override def nullSafeEval(v: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    bits ^ ((bits >> 63) & java.lang.Long.MAX_VALUE)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits")
      s"""
         |long $bits = java.lang.Double.doubleToLongBits($v);
         |${ev.value} = $bits ^ (($bits >> 63) & java.lang.Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object OrderBitsFunctions {
  /** Column form: monotone double -> long (see [[DoubleOrderBits]]). */
  def doubleOrderBits(d: Column): Column =
    Bridge.column(DoubleOrderBits(Bridge.expression(d)))
}
