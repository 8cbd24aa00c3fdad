package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the classic shuffle-reduction move
  * for big⋈selective-dim joins at 100 TB: build a Bloom filter over the
  * (already filtered) dimension keys, push it into the fact-side scan as a
  * cheap codegen'd predicate, and only THEN shuffle for the real join.
  * The shuffle carries ~selectivity x |fact| rows instead of |fact|; false
  * positives (a tunable fraction) ride along and are eliminated by the
  * exact join, false negatives cannot occur — so the composed result is
  * bit-identical to the plain join.
  *
  * Spark's AQE-era runtime row-level filtering does this automatically
  * only when statistics line up; this is the explicit, composable form
  * (mirroring [[SkewJoin]]'s relationship to AQE skew handling), built on
  * the engine's own codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` kernels rather than a hand-rolled bitset.
  *
  * The reference has no relational joins (SURVEY §2.7); this belongs to
  * the relational shell's at-scale posture.
  */
object BloomJoin {

  /** Number of filter bits for a target false-positive rate:
    * m = -n ln(p) / (ln 2)^2, clamped to [64, 2^26] (8 MiB — small enough
    * to ship to every task like any broadcast). */
  def numBitsFor(expectedKeys: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val ln2sq = math.log(2.0) * math.log(2.0)
    val m = math.ceil(-expectedKeys.max(1L) * math.log(fpp) / ln2sq).toLong
    m.max(64L).min(1L << 26)
  }

  /** Builds the Bloom filter bitset over `keys(keyCol)` (nulls skipped —
    * they can never equi-join). Returns null when `keys` is empty. */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(keyCol))),
      Literal(expectedKeys.max(1L)), Literal(numBitsFor(expectedKeys, fpp)))
    keys.filter(col(keyCol).isNotNull)
      .agg(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
  }

  /** Prunes `fact` to rows whose `factKey` might be in the filter. A null
    * filter (empty key set) yields an empty frame — the exact semantics of
    * an inner join against an empty dimension. The predicate is a
    * codegen'd scan-side filter: no shuffle, no join, evaluated before any
    * exchange the downstream join introduces.
    *
    * Null keys are excluded STRUCTURALLY (isNotNull), not just
    * probabilistically: xxhash64(NULL) is the constant seed hash, so
    * without the guard every null-keyed row would ride on that single
    * hash being a false positive — fine for the exact join, wrong for any
    * standalone semi-join-reduction use of this method. */
  def prune(fact: DataFrame, factKey: String, bloom: Array[Byte]): DataFrame =
    fact.filter(col(factKey).isNotNull && Bridge.column(new BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      Bridge.expression(xxhash64(col(factKey))))))

  /** One-call form: inner-join `fact` with `dim` on factKey = dimKey,
    * bloom-pruning the fact side first. Exactly equals the plain inner
    * join for any inputs. */
  def join(fact: DataFrame, dim: DataFrame,
           factKey: String, dimKey: String,
           expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(dim.select(col(dimKey)), dimKey, expectedKeys, fpp)
    // keys qualified per side: unqualified col(...) throws an
    // ambiguous-reference AnalysisException whenever both sides share
    // the key column name (factKey == dimKey, the commonest shape)
    val pruned = prune(fact, factKey, bloom)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
