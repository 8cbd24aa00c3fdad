package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: the salting counterpart to broadcast (small
  * side) and bucketing (pre-paid shuffle). When BOTH sides are big and a
  * handful of keys are hot, a plain shuffle join lands each hot key in
  * ONE reduce partition — the straggler that stalls the stage at cluster
  * scale no matter how many executors exist. Salting splits every hot
  * key's left rows across `nSalts` sub-keys and replicates only the
  * right side's hot-key rows once per salt: the hot key now occupies
  * nSalts partitions, and the extra input volume is
  * O(|right hot rows| × nSalts), not a full replication.
  *
  * AQE's skew-join handling (on in our sessions) does this adaptively
  * for sort-merge joins at runtime; this operator is the explicit,
  * planner-independent form — usable where AQE can't see the skew (first
  * shuffle of a stage, aggregate-free pipelines) and as the documented
  * pattern. Results are exactly a plain inner equi-join (spec-verified
  * on an adversarially skewed input; the catalog query hash-matches the
  * plain-join oracle).
  */
object SkewJoin {

  /** Hot keys by seeded-sample frequency: keys exceeding `hotFraction`
    * of the sampled rows AND an absolute floor of `minSampleCount`
    * sampled occurrences (small samples are noisy — without the floor a
    * uniform key can clear a fractional threshold on 2 lucky draws).
    * Deterministic given the seed; capped at `maxKeys`. The sample is
    * O(fraction · n) with no full-table shuffle. */
  def detectHotKeys(df: DataFrame, key: String, hotFraction: Double = 0.005,
                    sampleFraction: Double = 0.05, seed: Long = 42L,
                    maxKeys: Int = 64, minSampleCount: Long = 20L): Seq[Any] = {
    // NULL keys never match an inner equi-join — salting them is
    // pointless, and a null in the hot list would poison isInCollection
    // (SQL IN with a null list element is NULL, not false).
    val counts = df.select(col(key)).filter(col(key).isNotNull)
      .sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col(key)).count()
      .persist()
    try {
      // total derived from the grouped counts: ONE scan of the big
      // table, not a separate count() pass over the sample
      val total = math.max(1L,
        counts.agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0))
      counts
        .filter(col("count") > lit(hotFraction) * lit(total.toDouble) &&
          col("count") >= lit(minSampleCount))
        .orderBy(col("count").desc, col(key))
        .limit(maxKeys)
        .select(col(key)).collect().map(_.get(0)).toSeq
    } finally counts.unpersist()
  }

  /** Inner equi-join `left(leftKey) == right(rightKey)`, hot keys salted.
    * Output columns: left's then right's (both key columns kept), exactly
    * like `left.join(right, left(leftKey) === right(rightKey))`. Requires
    * disjoint column names between the two sides (the relational-catalog
    * convention).
    *
    * @param hotKeys explicit hot set; autodetected from `left` if empty.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 nSalts: Int = 16, hotKeys: Seq[Any] = Nil): DataFrame = {
    val hot: Seq[Any] =
      if (hotKeys.nonEmpty) hotKeys else detectHotKeys(left, leftKey)
    // a null in the hot list would turn the cold-side NOT-IN filter into
    // NULL for every row (silently dropping all cold matches); null keys
    // never match an inner equi-join anyway
    require(!hot.contains(null), "hotKeys must not contain null")
    val outCols: Seq[Column] =
      (left.columns.map(left(_)) ++ right.columns.map(right(_))).toSeq
    val plainJoin = left.join(right, left(leftKey) === right(rightKey))
    if (hot.isEmpty) return plainJoin

    val isHotL: Column = col(leftKey).isInCollection(hot)
    val isHotR: Column = col(rightKey).isInCollection(hot)

    // cold keys: the normal shuffle join
    val cold = left.filter(!isHotL)
      .join(right.filter(!isHotR), left(leftKey) === right(rightKey))
      .select(outCols: _*)

    // hot keys: left rows spread across nSalts sub-keys (salt = a
    // deterministic hash of the whole row — no RNG state, re-runs and
    // retries land identically), right rows replicated once per salt.
    val saltedLeft = left.filter(isHotL)
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(nSalts)))
    val saltedRight = right.filter(isHotR)
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    val hotJoined = saltedLeft
      .join(saltedRight, saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"))
      .select(outCols: _*)

    cold.unionByName(hotJoined)
  }
}
