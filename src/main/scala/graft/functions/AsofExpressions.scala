package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, LongArrayLongInput}
import org.apache.spark.sql.types._

/** Binary search over a SORTED ascending array<long> — the kernel of the
  * broadcast as-of join (graft.operators.AsofJoin.backwardBroadcast):
  * each probe is O(log ticks) inside whole-stage codegen, vs the O(ticks)
  * per-row scan a higher-order `aggregate(...)` lambda would cost (and
  * higher-order functions are CodegenFallback besides).
  *
  * Returns the COUNT of elements <= v (strict=false) or < v (strict=true)
  * — i.e. the 1-based index of the greatest element <= v, and the 0-based
  * lower-bound insertion point, respectively. Callers turn these into
  * backward ("latest tick at or before t") and forward ("earliest tick at
  * or after t") match indices. The array must be sorted ascending and
  * null-free (the as-of builder constructs it that way); elements out of
  * order make the result meaningless but never unsafe.
  */
case class SortedCountLE(left: Expression, right: Expression, strict: Boolean)
    extends BinaryExpression with LongArrayLongInput {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (strict) "sorted_count_lt" else "sorted_count_le"

  override def nullSafeEval(a: Any, v: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val t = v.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val x = arr.getLong(mid)
      if (if (strict) x < t else x <= t) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) => {
      val cmp = if (strict) "<" else "<="
      // freshName: with non-nullable children nullSafeCodeGen inlines
      // this code UNBRACED, so two probes in one projection (e.g. the
      // le and lt forms side by side) would redeclare fixed locals and
      // fail Janino compilation
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getLong($mid) $cmp $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AsofFunctions {
  /** 1-based index of the greatest element <= v in a sorted array (0 = none). */
  def countLE(sortedArr: Column, v: Column): Column =
    Bridge.column(SortedCountLE(Bridge.expression(sortedArr), Bridge.expression(v), strict = false))

  /** Count of elements < v (the lower-bound insertion point). */
  def countLT(sortedArr: Column, v: Column): Column =
    Bridge.column(SortedCountLE(Bridge.expression(sortedArr), Bridge.expression(v), strict = true))
}
