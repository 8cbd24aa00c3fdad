package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase distributed global prefix sum — the scaffolding that turns
  * "one global window" (a single-partition sort at scale) into a
  * distributed plan:
  *
  *  1. range-partition the frame on a TOTAL order and sort within each
  *     partition (range boundaries are sampled, but a prefix over a
  *     total order is boundary-invariant, so results are deterministic);
  *  2. pin that partitioning (localCheckpoint) so the two consumers —
  *     the per-partition totals and the caller's per-partition window —
  *     see the SAME placement;
  *  3. collect ONE row per partition (bounded by parallelism, never by
  *     data) and prefix-scan the totals on the driver;
  *  4. hand back the pinned frame (with its `pid` column) plus an
  *     offset column mapping each partition to the total weight of all
  *     earlier partitions.
  *
  * The caller composes `offset` with its own per-partition window —
  * `row_number().over(byPid) + offset` for a global rank,
  * `sum(w).over(byPidPreceding) + offset` for a global running sum.
  * Used by `e_user_quartiles` (distributed ntile) and
  * `s_curriculum_shards` (token-budget curriculum packing).
  */
object PrefixSum {

  /** The pinned range-partitioned frame (carrying a `pid` column AND the
    * hidden `__ps_offset` column the broadcast join delivered), the
    * per-partition exclusive-prefix offset column, and the grand total
    * of `weight` (free — it's the last prefix plus the last total).
    *
    * CONTRACT: `offset` references `__ps_offset`, so it resolves only
    * against `df` (or a projection of it that keeps that column) —
    * compose your window arithmetic BEFORE projecting columns away. */
  final case class Ranged(df: DataFrame, offset: Column, total: Long)

  /** @param order  a TOTAL order (include a tiebreaker column): both the
    *               range partitioner and the caller's within-partition
    *               window must sort by exactly this
    * @param weight per-row weight summed into the offsets — `lit(1L)`
    *               ranks rows, a token count packs budgets. Must be
    *               integral and non-null. */
  def ranged(df: DataFrame, numPartitions: Int, order: Seq[Column],
             weight: Column): Ranged = {
    require(!df.columns.contains("__ps_offset") && !df.columns.contains("pid"),
      "input frame must not carry reserved columns pid/__ps_offset")
    val spark = df.sparkSession
    // Scale-adaptive partition count (round-20, guide §2): an explicit
    // repartitionByRange is never AQE-coalesced, so a parallelism-sized
    // count over a small frame pays numPartitions near-empty tasks in
    // EVERY downstream stage (range sample, checkpoint, totals, the
    // caller's window — measured 136-task / 12-job rows at sf0.1).
    // Derive the count from the planner's size estimate at the session's
    // advisory partition size, capped by the caller's value — identical
    // at scale (estimate >> advisory), small frames collapse to one
    // partition. Results are partitioning-invariant by the contract
    // above (prefix over a total order).
    val advisory = math.max(1L, spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val effParts = math.max(1, math.min(numPartitions.toLong,
      (est / advisory + 1).min(Int.MaxValue).toLong).toInt)
    // LAZY checkpoint: the totals collect right below is the
    // materializing action (one job instead of checkpoint + collect);
    // the caller's window still reads the pinned blocks.
    val pinned = df
      .repartitionByRange(effParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val totals = pinned.groupBy(col("pid"))
      .agg(sum(weight).cast("long").as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive scan: partition pid's offset = sum of all earlier
    // partitions' totals (empty partitions never surface a pid — no row
    // can reference them, so their absence from the map is harmless)
    val offsets = totals
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, w)) => (pid, acc + w) }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
    // Deliver the offsets as a tiny broadcast-joined (pid, offset) frame,
    // NOT a folded when()-chain: the chain's O(numPartitions) expression
    // depth blows past JIT/codegen method limits at the thousands of
    // partitions a 100x scale-up implies, falling back to interpreted
    // eval. The broadcast side is numPartitions rows — driver-bounded by
    // parallelism, never by data.
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("pid", "__ps_offset")
    val joined = pinned.join(broadcast(offsetsDf), Seq("pid"), "left")
      .withColumn("__ps_offset", coalesce(col("__ps_offset"), lit(0L)))
    Ranged(joined, col("__ps_offset"), totals.map(_._2).sum)
  }
}
