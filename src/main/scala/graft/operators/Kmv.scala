package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al., "On Synopses for Distinct-Value Estimation", SIGMOD'07)
  * as a bounded AGGREGATE: per group, the k smallest distinct 48-bit
  * hashes of the key, kept in one sorted primitive array. Map-side
  * partial aggregation caps every task's contribution at k values per
  * group, so the shuffle moves O(#groups x k x #partitions) rows while
  * the exact `countDistinct` plan shuffles one row per distinct key —
  * billions at 100 TB. Same family as [[CountMin]] (frequency) and
  * HLL (`e_hll_users`), but with two properties neither has here:
  *
  *  - **Exactly mergeable AND SQL-reproducible**: the hash is an
  *    md5-prefix (`conv(substring(md5(x),1,12),16,10)` ==
  *    `CAST('0x'||substring(md5(x),1,12) AS BIGINT)`), and the
  *    estimator is pure BIGINT arithmetic — so a KMV catalog row gets a
  *    FULL hash oracle, where HLL (engine-private registers) is
  *    rows-only. Union of two sketches (k smallest of the merged sets)
  *    is BIT-IDENTICAL to the sketch of the unioned inputs (spec-pinned)
  *    — pre-aggregate per day/shard, answer any range later.
  *  - **Set algebra**: two groups' sketches estimate their UNION and
  *    JACCARD (Beyer et al. §5: of the k smallest union hashes, the
  *    fraction present in both sketches estimates J), which HLL/CMS
  *    cannot. The catalog uses this for cross-source overlap.
  *
  * Estimator: with `h_k` = k-th smallest hash in a space of size H=2^48,
  * est = (k-1) * H div h_k (the unbiased KMV estimator, floored to
  * BIGINT); groups with fewer than k distinct hashes are EXACT (the
  * sketch saw every value). Relative error ~ 1/sqrt(k-2).
  *
  * Hash collisions only merge keys (48-bit space: ~n^2/2^49 expected
  * collisions — immaterial below ~1e12 distinct; the estimator's own
  * k-vs-accuracy tradeoff dominates far earlier), and the oracle computes
  * the SAME collisions, so parity is unaffected.
  */
object Kmv {

  /** Hash width: 12 hex chars = 48 bits. (k-1)*2^48 must fit a BIGINT,
    * so k <= 32767 — far above any useful accuracy point. */
  val HashHexChars = 12
  val HashSpace: Long = 1L << (4 * HashHexChars)

  /** The sketch's hash: first 48 bits of md5 of the key's string form.
    * Engine-portable by construction — DuckDB spells it
    * `CAST('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 12) AS BIGINT)`. */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, HashHexChars), 16, 10).cast("long")

  /** Sorted ascending, distinct, length <= k. */
  final case class KmvBuf(hs: Array[Long])

  class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {
    require(k >= 2 && k <= 32767, s"k in [2, 32767], got $k")

    override def zero: KmvBuf = KmvBuf(Array.empty)

    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val a = b.hs; val n = a.length
      // full buffer and h no better than the current k-th: drop (>=
      // also rejects a duplicate of the last element without a search)
      if (n >= k && h >= a(n - 1)) b
      else {
        val i = java.util.Arrays.binarySearch(a, h)
        if (i >= 0) b // duplicate hash: KMV state is a SET
        else {
          val ins = -i - 1
          val m = math.min(n + 1, k)
          val out = new Array[Long](m)
          System.arraycopy(a, 0, out, 0, ins)
          out(ins) = h
          val tail = m - ins - 1
          if (tail > 0) System.arraycopy(a, ins, out, ins + 1, tail)
          KmvBuf(out)
        }
      }
    }

    override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
      val x = b1.hs; val y = b2.hs
      if (x.isEmpty) b2
      else if (y.isEmpty) b1
      else {
        val cap = math.min(x.length + y.length, k)
        val out = new Array[Long](cap)
        var i = 0; var j = 0; var o = 0
        while (o < cap && (i < x.length || j < y.length)) {
          val takeX = j >= y.length || (i < x.length && x(i) <= y(j))
          val v = if (takeX) x(i) else y(j)
          if (takeX) i += 1 else j += 1
          if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
        }
        KmvBuf(if (o == cap) out else java.util.Arrays.copyOf(out, o))
      }
    }

    override def finish(b: KmvBuf): KmvBuf = b
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  }

  /** Column form over a PRE-HASHED long column (see [[hash48]]):
    * `sketchAgg(k)(hcol)` aggregates to a struct with field `hs`
    * (array<bigint>, sorted ascending, distinct, length <= k). */
  def sketchAgg(k: Int): Column => Column = {
    val fn = udaf(new KmvAgg(k), Encoders.scalaLong)
    (h: Column) => fn(h)
  }

  /** Sketch `df` grouped by `groupCols`: the k smallest distinct hashes
    * of `key` per group, as column `kmv` (array<bigint> asc). Null keys
    * are excluded (a null is not a value of the set). */
  def sketch(df: DataFrame, key: Column, groupCols: Seq[Column], k: Int): DataFrame =
    df.filter(key.isNotNull)
      .select(groupCols :+ hash48(key).as("__h"): _*)
      .groupBy(groupCols: _*)
      .agg(sketchAgg(k)(col("__h")).getField("hs").as("kmv"))

  /** Exact BIGINT integer division (Spark's `/` on longs is double —
    * a 256-ulp trap at 2^60 scale; `div` is the exact IntegralDivide). */
  private def idiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  /** Distinct-count estimate from a sketch array: exact (= size) below
    * k values, else (k-1)*2^48 div h_k. No divide-by-zero guard is
    * needed: the sketch is sorted, DISTINCT, and non-negative, so its
    * k-th element (1-indexed) is >= k-1 >= 1 for the enforced k >= 2 —
    * h_k = 0 is impossible by construction, not just improbable. */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(idiv(lit((k - 1).toLong * HashSpace), element_at(kmv, k)))

  /** Union sketch of two sketch arrays: k smallest of the merged sets —
    * bit-identical to sketching the unioned inputs (array_union dedups;
    * both inputs are distinct-element arrays). */
  def unionK(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard estimate in basis points between the sets behind sketches
    * `a` and `b`: of the union sketch's values (a uniform sample of the
    * union), the fraction present in BOTH sketches. Integer-exact.
    *
    * Kernel (round-11 advice): `x ∈ u ∧ x ∈ a ∧ x ∈ b` is equivalent to
    * `x ∈ a∩b ∧ x <= last(u)` — u is the k smallest DISTINCT union
    * values, so it contains EVERY union value <= its last element. One
    * hash-based `array_intersect` (O(|a|+|b|)) plus an O(k) threshold
    * filter replaces the old per-element `array_contains` scans (O(k²)
    * on two sorted arrays) — immaterial at k=256, the right kernel at
    * the 32767 bound (KmvSpec pins sub-second at k=4096). */
  def jaccardBp(a: Column, b: Column, k: Int): Column = {
    // referencing the full union sketch `unionK(a,b,k)` several times
    // duplicates its O(n log n) sort per reference (higher-order-function
    // trees miss codegen CSE) — only its SIZE and LAST element are
    // needed, each derivable with one union pass
    val uSize = least(size(array_union(a, b)), lit(k))
    val uLast = element_at(array_sort(array_union(a, b)), uSize)
    val both = when(uSize === 0, lit(0)).otherwise(
      size(filter(array_intersect(a, b), x => x <= uLast)))
    idiv(both.cast("long") * lit(10000L),
      greatest(uSize.cast("long"), lit(1L)))
  }
}
