package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge, StringPairInput}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded edit distance — the kernel entity resolution actually
  * runs at scale. Full Levenshtein is O(n*m) per pair; under a match
  * threshold k the DP only ever needs the band of cells within k of the
  * diagonal, which is O(min(n,m) * k) with an early exit when the whole
  * band exceeds k — for k=3 over 32-char prefixes that is ~10x fewer
  * cells than the square DP, and the asymptotic gap widens with string
  * length.
  *
  * Contract: returns the EXACT Levenshtein distance when it is <= k,
  * and k+1 otherwise (the standard "bounded" form — a `<= k` filter on
  * the result is exactly a filter on the true distance, and kept rows
  * carry the true distance). Comparison is per UTF-16 char, which
  * equals code-point semantics for BMP text and byte semantics for
  * ASCII — the regime the catalog query restricts itself to (see
  * t_fuzzy_prefix's octet_length guard).
  */
object EditDistanceKernels {

  def boundedLevenshtein(a: UTF8String, b: UTF8String, k: Int): Int = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    val inf = k + 1
    if (math.abs(n - m) > k) return inf
    if (n == 0) return math.min(m, inf)
    if (m == 0) return math.min(n, inf)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf // the whole band is past k: bail
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }
}

/** `levenshtein_le(a, b)` with a compile-time threshold k: exact
  * distance if <= k, else k+1. */
case class LevenshteinLe(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with StringPairInput {
  require(k >= 0, s"threshold must be >= 0, got $k")
  override def prettyName: String = "levenshtein_le"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceKernels.boundedLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistanceKernels.boundedLevenshtein($a, $b, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object EditDistanceFunctions {
  def levenshteinLe(a: Column, b: Column, k: Int): Column =
    Bridge.column(LevenshteinLe(Bridge.expression(a), Bridge.expression(b), k))
}
