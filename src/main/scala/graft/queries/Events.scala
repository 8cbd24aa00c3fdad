package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.{cents, tsFromNanos}

/** Event-stream analytics over the `events` table (the batch image of the
  * streaming surface; graft.streaming runs the same aggregations through
  * Structured Streaming).
  *
  * `ts` is parquet TIMESTAMP(NANOS): Spark reads it as long nanos
  * (nanosAsLong), DuckDB natively — all exact comparisons stay in integer
  * nanos on both sides.
  */
object Events {
  private def t(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** Pinned pivot columns (see e_pivot_day_type): mirrored in the oracle. */
  val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling-window (hourly) aggregation — the batch shape of the
    // streaming groupBy(window(...)); group count is bounded (
    // hours x event types), partial aggregation collapses each scan
    // partition first.
    "e_hourly_rollup" -> ((s, dir) => {
      t(s, dir)
        .withColumn("hour_s", date_format(tsFromNanos(col("ts")), "yyyy-MM-dd HH"))
        .groupBy(col("hour_s"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_value_c"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("hour_s"), col("event_type"))
    }),

    // Per-user stats + global top-20 by spend. Timestamps are exposed in
    // MICROseconds: the parquet column is TIMESTAMP(NANOS) and DuckDB's
    // reader truncates it to us, so ns-precision output can never
    // hash-match the oracle; floor-div by 1000 is monotone, so it
    // commutes with min/max and both engines see identical values.
    "e_top_users" -> ((s, dir) => {
      t(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("sum_value_c"),
          countDistinct(col("event_type")).as("n_types"),
          expr("min(ts) div 1000").as("first_ts_us"),
          expr("max(ts) div 1000").as("last_ts_us"))
        .orderBy(col("sum_value_c").desc, col("user_id"))
        .limit(20)
    }),

    // Sessionization: a session break is a >30min gap; pure window
    // functions (lag + conditional sum), no driver loop — scales as one
    // shuffle by user_id.
    // Gap math in MICROseconds (see e_top_users note: DuckDB truncates
    // TIMESTAMP(NANOS) to us). The window sorts on RAW nanos: ns -> us is
    // monotone, so the sorted us sequence per user is identical to
    // sorting on us directly (same multiset, sorted) — and the raw-column
    // sort keeps the pre-window projection out of the shuffle.
    "e_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new_session",
          when(col("prev_ts").isNull ||
            (expr("ts div 1000") - expr("prev_ts div 1000")) > lit(1800000000L), 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("is_new_session")).as("n_sessions"))
        .orderBy(col("user_id"))
    }),

    // The same sessionization through the NATIVE session_window operator
    // (graft.streaming.StreamingIngest.sessionize — identical code path
    // serves watermarked streams). Boundary semantics (verified against
    // Spark's MergingSessionsIterator: new session only when the next
    // event starts strictly AFTER the current session end): an event
    // exactly `gap` after the previous one still merges, so the oracle's
    // lag form breaks sessions on diff > gap — same rule as e_sessions.
    // Timestamps in us on both sides (see e_top_users note).
    "e_sessions_native" -> ((s, dir) => {
      val ev = t(s, dir)
        .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("ts"))
      graft.streaming.StreamingIngest.sessionize(ev, "30 minutes")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Semi-structured extraction: JSON props -> typed value histogram.
    "e_json_props" -> ((s, dir) => {
      t(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy(col("k"))
    }),

    // Funnel: users whose first signup precedes a later purchase — the
    // event-sequence shape (conditional aggregation, one shuffle by user;
    // timestamps in us, see e_top_users note).
    "e_funnel" -> ((s, dir) => {
      t(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", expr("ts div 1000"))).as("first_signup_us"),
          max(when(col("event_type") === "purchase", expr("ts div 1000"))).as("last_purchase_us"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(when(col("first_signup_us").isNotNull, 1L).otherwise(0L)).as("n_signed_up"),
          sum(when(col("first_signup_us") < col("last_purchase_us"), 1L).otherwise(0L))
            .as("n_converted"))
    }),

    // Share-of-total by event type: two-level aggregation, the global
    // total broadcast back (no second scan).
    // As-of join (purchase -> latest preceding click per user): the
    // time-series attribution shape Spark lacks natively, via the
    // union + running-window composition (AsofJoin.backward — one key
    // shuffle, no per-key cross product). Clicks pre-aggregated to one
    // per (user, ts): the as-of contract needs unique right timestamps.
    // Oracle: DuckDB's native ASOF JOIN, so the operator is checked
    // against an independent reference implementation of the semantics.
    "e_attribution" -> ((s, dir) => {
      val ev = t(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.AsofJoin.backward(
          purchases, clicks, "user_id", "c_user", "ts", "c_ts")
        .select(col("event_id"), col("user_id"), col("click_id"),
          // integer div, never `/`: 2024-epoch nanos exceed 2^53, double
          // division would round microseconds
          expr("(ts div 1000) - (c_ts div 1000)").as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // The SAME attribution result through AsofJoin.backwardBroadcast —
    // the never-shuffle-the-fact-side strategy (per-key sorted tick
    // arrays broadcast, codegen'd binary-search probe). At 100 TB this
    // is the only acceptable as-of plan against a dimension-sized tick
    // table; hash-matching the identical DuckDB ASOF oracle proves the
    // two physical strategies are row-identical.
    "e_attribution_bcast" -> ((s, dir) => {
      val ev = t(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.AsofJoin.backwardBroadcast(
          purchases, clicks, "user_id", "c_user", "ts", "c_ts")
        .select(col("event_id"), col("user_id"), col("click_id"),
          expr("(ts div 1000) - (c_ts div 1000)").as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // NEAREST as-of (merge_asof direction='nearest'): each error event
    // paired with the closest click by the same user in EITHER
    // direction, symmetric 24-hour tolerance — the diagnostics shape
    // ("what was the user doing around the failure"). Times are
    // projected to microseconds UP FRONT so the |gap| comparison and
    // the oracle's epoch_us arithmetic are the same integers (a raw
    // nanosecond distance could order a micro-tied pair differently
    // than the oracle).
    "e_nearest_click" -> ((s, dir) => {
      val dayUs = 24L * 3600 * 1000 * 1000
      val ev = t(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), expr("ts div 1000").as("c_us"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.AsofJoin.nearest(
          errors, clicks, "user_id", "c_user", "ts_us", "c_us",
          tolerance = Some((lt, rt) => abs(rt - lt) <= lit(dayUs)))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("c_us") - col("ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // The SAME nearest-click result through AsofJoin.nearestBroadcast —
    // the fact side (errors) never shuffles; one countLE binary search
    // per row yields both directional candidates. Hash-matching
    // e_nearest_click's DuckDB two-ASOF oracle proves the broadcast
    // nearest strategy row-identical to the union+window one at
    // catalog scale (AsofJoinSpec pins the adversarial corners).
    "e_nearest_bcast" -> ((s, dir) => {
      val dayUs = 24L * 3600 * 1000 * 1000
      val ev = t(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), expr("ts div 1000").as("c_us"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.AsofJoin.nearestBroadcast(
          errors, clicks, "user_id", "c_user", "ts_us", "c_us",
          tolerance = Some((lt, rt) => abs(rt - lt) <= lit(dayUs)))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("c_us") - col("ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of with a tolerance window: each click -> the next
    // purchase by the same user within one hour (time-to-convert). The
    // tolerance compares MICROsecond-truncated gaps — the parquet column
    // is TIMESTAMP(NANOS) and DuckDB's reader truncates to us, so a raw
    // nanosecond bound could disagree with any oracle at the boundary;
    // (x - pmod(x, 1000)) keeps the arithmetic in exact longs
    // (1000 * us(x)) instead of a 2^53-unsafe double division.
    "e_click_to_purchase" -> ((s, dir) => {
      val hourNs = 3600L * 1000 * 1000 * 1000
      val usTrunc = (c: Column) => c - pmod(c, lit(1000L))
      val ev = t(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      graft.operators.AsofJoin.forward(
          clicks, purchases, "user_id", "p_user", "ts", "p_ts",
          tolerance = Some((lt, rt) => usTrunc(rt) - usTrunc(lt) <= lit(hourNs)))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          expr("(p_ts div 1000) - (ts div 1000)").as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Pivot (wide aggregation): daily counts with one column per event
    // type. The value list is EXPLICIT — .pivot(col) alone runs a
    // distinct-collect job to discover columns and makes the output
    // schema data-dependent; pinning the list keeps the plan one-pass
    // and the schema stable (and is the only scalable form: a pivot's
    // width must be known, not discovered, at 100 TB).
    "e_pivot_day_type" -> ((s, dir) => {
      t(s, dir)
        .withColumn("day_s", date_format(tsFromNanos(col("ts")), "yyyy-MM-dd"))
        .groupBy(col("day_s"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, EventTypes)
        .orderBy(col("day_s"))
    }),

    // Exact percentiles (median / p95) over integer cents — Spark's
    // linear-interpolation percentile matches DuckDB's quantile_cont
    // bit-for-bit on integer inputs (same type-7 formula in doubles).
    "e_value_percentiles" -> ((s, dir) => {
      t(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(CAST(floor(value*100) AS BIGINT), 0.5)").as("p50_c"),
          expr("percentile(CAST(floor(value*100) AS BIGINT), 0.95)").as("p95_c"))
        .orderBy(col("event_type"))
    }),

    "e_type_share" -> ((s, dir) => {
      val byType = t(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      val total = byType.agg(sum(col("n")).as("total_n"))
      byType.join(broadcast(total))
        .withColumn("share_pm", expr("(n * 1000) div total_n"))
        .select(col("event_type"), col("n"), col("sum_value_c"), col("share_pm"))
        .orderBy(col("event_type"))
    }),

    // Top-3 events by value per type as a bounded AGGREGATE (GroupTopK):
    // map-side partial top-k, shuffle O(#groups x k x #partitions) — the
    // window row_number formulation (the oracle) sorts every row of every
    // group. Same answer, scale-safe plan.
    "e_top3_per_type" -> ((s, dir) => {
      val topk = graft.operators.GroupTopK.topK(3)
      t(s, dir)
        // GroupTopK precondition: null values hold no rank (pinned in the
        // oracle's WHERE so both engines agree if nulls ever appear)
        .filter(col("value").isNotNull && col("event_id").isNotNull)
        .select(col("event_type"), cents(col("value")).cast("long").as("v"),
          col("event_id"))
        .groupBy(col("event_type"))
        .agg(topk(col("v"), col("event_id")).as("top"))
        .select(col("event_type"),
          posexplode(arrays_zip(col("top.vs"), col("top.ids"))))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("col.ids").as("event_id"), col("col.vs").as("value_c"))
        .orderBy(col("event_type"), col("rank"))
    }),

    // ntile quartiles over per-user spend: the bucketing window shape —
    // WITHOUT the global single-partition window ntile itself implies.
    // Global rank = PrefixSum.ranged (two-phase distributed prefix sum,
    // weight 1) + row_number within each partition. The quartile is
    // then pure arithmetic on the rank — SQL ntile(k) semantics: with n
    // rows, the first n%k buckets hold n/k+1 rows, the rest n/k.
    "e_user_quartiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pre = graft.operators.PrefixSum.ranged(
        t(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(cents(col("value"))).as("spend_c")),
        s.sparkContext.defaultParallelism,
        Seq(col("spend_c").desc, col("user_id")), lit(1L))
      val n = pre.total
      val (base, rem) = (n / 4, n % 4)
      val localW = Window.partitionBy(col("pid"))
        .orderBy(col("spend_c").desc, col("user_id"))
      pre.df
        .withColumn("rank", row_number().over(localW).cast("long") + pre.offset)
        // first `rem` buckets are one row taller; the otherwise-branch
        // divisor is guarded but unreachable when base == 0 (then every
        // rank <= rem)
        .withColumn("quartile",
          when(col("rank") <= lit(rem * (base + 1)),
            expr(s"(rank - 1) div ${base + 1} + 1"))
            .otherwise(expr(
              s"$rem + (rank - ${rem * (base + 1)} - 1) div ${math.max(base, 1L)} + 1")))
        .select(col("user_id"), col("spend_c"), col("quartile").cast("long").as("quartile"))
        .orderBy(col("user_id"))
    }),

    // Unpivot (wide stats -> long rows) via stack: the reshape dual of
    // e_pivot_day_type, schema-stable and one pass.
    "e_unpivot_stats" -> ((s, dir) => {
      t(s, dir)
        .groupBy(col("event_type"))
        .agg(min(cents(col("value"))).as("min_c"),
          max(cents(col("value"))).as("max_c"),
          count(lit(1)).as("n"))
        .select(col("event_type"), expr(
          "stack(3, 'min_c', min_c, 'max_c', max_c, 'n', n) AS (stat, v)"))
        .orderBy(col("event_type"), col("stat"))
    }),

    // RANGE-frame window (value-based, vs q_moving_window's ROWS frame):
    // per event, how many same-type events fall within +-$10 of its
    // value — density estimation over a sorted attribute. RANGE frames
    // are value-bounded, so the count is deterministic regardless of tie
    // order.
    // Scale shape (round-5): a window partitioned only by the
    // low-cardinality event_type is a PER-TYPE GLOBAL SORT — one
    // partition per type no matter the corpus. Salt the partition key
    // with a value bucket of width W >= the range radius R: every
    // possible neighbor of a row in bucket k lives in buckets
    // {k-1, k, k+1}, so replicating each row into its own bucket (owner)
    // plus both adjacent buckets (contributors) makes the in-bucket
    // range count EXACT — each neighbor contributes exactly one copy to
    // the owner's bucket. 3x replication buys (types x buckets)-way
    // parallelism; counts are kept for owner rows only.
    "e_value_neighbors" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val R = 1000L // range radius, cents (+-$10)
      val W = 2000L // bucket width; W >= R confines neighbors to k-1..k+1
      // null-value rows (if any) bucket at 0: their copies can't leak
      // into non-null counts (the null-cancellation note below), nulls
      // still share one peer group, and is_owner stays non-null so the
      // filter keeps them.
      val b0 = floor(coalesce(col("value_c"), lit(0L)) / W)
      // The sliding count is computed as a DIFFERENCE of two cumulative
      // counts: count[v-R, v+R] = cum(<= v+R) - cum(<= v-R-1) (integer
      // cents make the strict bound exact). Spark re-aggregates a
      // SLIDING range frame from scratch per row — O(rows x frame
      // width), ~870-row frames at sf0.1 — while UNBOUNDED-PRECEDING
      // frames advance incrementally, O(rows); both cumulative frames
      // share one partition+order, so this is still a single sort and a
      // single WindowExec (measured 4.9-7.4 -> ~1.5 s at sf0.1).
      // Nulls sort first, so both cumulative frames of a NON-null row
      // include every null peer and they cancel in the subtraction; for
      // a NULL row both frames degenerate to the null peer group, so
      // cumHi alone IS the old RANGE frame's answer (its own peers).
      val ord = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(col("value_c"))
      val cumHi = count(lit(1)).over(ord.rangeBetween(Window.unboundedPreceding, R))
      val cumLo = count(lit(1)).over(ord.rangeBetween(Window.unboundedPreceding, -(R + 1)))
      t(s, dir)
        .select(col("event_id"), col("event_type"), cents(col("value")).as("value_c"))
        .withColumn("bucket", explode(array(b0 - 1, b0, b0 + 1)))
        .withColumn("is_owner", col("bucket") === b0)
        .withColumn("n_near",
          when(col("value_c").isNull, cumHi).otherwise(cumHi - cumLo))
        .filter(col("is_owner"))
        .select(col("event_id"), col("event_type"), col("value_c"), col("n_near"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // The same +-$10 neighborhood count as e_value_neighbors, computed
    // the way a 100 TB engine actually wants it: SWEEP-LINE PREFIX SUMS
    // instead of a per-row RANGE frame. Spark re-evaluates a sliding
    // RANGE frame's aggregate from scratch per row — O(rows x frame
    // width) (~870-row frames here = 2.6e8 row-touches at sf0.1, the
    // cost e_value_neighbors pays); this formulation is O(n log n):
    //   1. collapse rows to per-(type, value) counts — cardinality is
    //      bounded by the VALUE DOMAIN (integer cents), not the corpus,
    //      so the downstream sweep stays small at any scale;
    //   2. one RUNNING sum per type (unbounded-preceding frames are
    //      incremental in Spark — O(n), no recompute);
    //   3. count[v-R, v+R] = cum(<= v+R) - cum(< v-R), read by 'hi'/'lo'
    //      probe markers merged into the sweep at keys v+R / v-R with a
    //      role tie-break (lo before data = exclusive, hi after = incl).
    // Integer keys and counts end to end — nothing to drift vs the
    // oracle. If the value domain were unbounded, the sweep salts by
    // value bucket with a second pass carrying cross-bucket offsets.
    "e_value_density" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val R = 1000L
      val base = t(s, dir)
        .select(col("event_id"), col("event_type"), cents(col("value")).as("value_c"))
      val g = base.groupBy(col("event_type"), col("value_c"))
        .agg(count(lit(1)).as("c"))
      val sweep = g.select(col("event_type"), col("value_c"), explode(array(
          struct(col("value_c").as("key"), lit(0).as("ord"),
            col("c").as("w"), lit("d").as("role")),
          struct((col("value_c") + R).as("key"), lit(1).as("ord"),
            lit(0L).as("w"), lit("h").as("role")),
          struct((col("value_c") - R).as("key"), lit(-1).as("ord"),
            lit(0L).as("w"), lit("l").as("role")))).as("e"))
        .select(col("event_type"), col("value_c"),
          col("e.key"), col("e.ord"), col("e.w"), col("e.role"))
      val run = Window.partitionBy(col("event_type"))
        .orderBy(col("key"), col("ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cums = sweep.withColumn("cum", sum(col("w")).over(run))
      // BOTH probe readings pivot out of ONE pass over the sweep —
      // filtering hi and lo separately and joining twice makes Catalyst
      // compute the whole scan+agg+window subtree once per branch (the
      // diamond-reuse pitfall); the pivot keeps a single subtree and a
      // single join back to the rows
      val bounds = cums.filter(col("role") =!= "d")
        .groupBy(col("event_type"), col("value_c"))
        .agg(max(when(col("role") === "h", col("cum"))).as("hi"),
          max(when(col("role") === "l", col("cum"))).as("lo"))
      // NULL-SAFE join key: a plain equi-join would silently DROP rows
      // with null value (null != null), while the oracle's window keeps
      // them (n_near = null peer-group size — which the sweep computes
      // correctly: a null group's markers travel with the null key and
      // its contribution cancels out of every non-null reading)
      base.as("r")
        .join(bounds.as("b"), col("r.event_type") === col("b.event_type") &&
          col("r.value_c") <=> col("b.value_c"))
        .select(col("r.event_id"), col("r.event_type"), col("r.value_c"),
          (col("b.hi") - col("b.lo")).as("n_near"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Table-statistics profiling (the ANALYZE shape): per-column null
    // count, exact distinct, min/max — stack each row to
    // (column_name, value) FIRST, then ONE groupBy(column_name) pass.
    // Six countDistincts in a single global agg (the round-4 shape)
    // planned an Expand that replicated every input row x7 before the
    // shuffle — a 700 TB intermediate at corpus scale. Stacked, there is
    // exactly one distinct aggregate, so Spark's two-stage distinct
    // rewrite applies (partial dedup on (column_name, value) map-side,
    // no Expand) — EventsPlanSpec pins the Expand-free plan.
    // The value carries a typed dual slot (v_long, v_str; exactly one
    // non-null per column family) so min/max keep NATIVE ordering —
    // stacking everything to string would order "10" < "9". long <->
    // canonical string is bijective, so the distinct count over the
    // coalesced string equals the native distinct count. Numerics are
    // exposed as integers (cents / epoch-micros) and stringified, so
    // min/max hash-match with no float-formatting hazard. Exact
    // countDistinct because the oracle needs exactness; a 100 TB
    // profiler swaps in approx_count_distinct (see e_hll_users).
    "e_column_stats" -> ((s, dir) => {
      // spread: the stacked-profile aggregate is string-buffered (min/max
      // over v_str) so it plans as SortAggregate — on the single-split
      // catalog scan the 6x-stacked string sort ran on ONE core (2.2 s at
      // sf0.1). Spreading the scan parallelizes the sort+partial agg; a
      // no-op at real scale where the scan already has many splits.
      val src = Tables.spread(t(s, dir)).select(
        col("event_id"), col("user_id"), col("event_type"),
        cents(col("value")).as("value_c"), expr("ts div 1000").as("ts_us"),
        col("props"))
      val longCols = Set("event_id", "user_id", "value_c", "ts_us")
      val cols = Seq("event_id", "user_id", "event_type", "value_c", "ts_us", "props")
      val stackArgs = cols.map { c =>
        if (longCols(c)) s"'$c', CAST($c AS BIGINT), CAST(NULL AS STRING)"
        else s"'$c', CAST(NULL AS BIGINT), $c"
      }.mkString(", ")
      val stacked = src.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, v_long, v_str)"))
      // Round-19 split (guide §2.3/§4: keep the hot path hash-aggregable):
      // the former single agg carried min/max(v_str) STRING buffers, so
      // the WHOLE per-value dedup planned as SortAggregate — two full
      // string sorts of the 6x-stacked stream. Split instead:
      //  - n_nulls: long-buffered HashAggregate over the raw stream;
      //  - the per-value dedup: a keys-only aggregate (no buffer at all,
      //    so it hash-aggregates even with the string key);
      //  - n_distinct/min/max: computed over the DEDUPED rows (min/max
      //    over distinct values == min/max over all values), so the one
      //    remaining string-buffered aggregate runs on |distinct| rows,
      //    not |rows|. Results are identical: (v_long, v_str) with
      //    exactly one non-null slot is bijective with the old
      //    coalesce(cast(v_long as string), v_str) dedup key.
      val nulls = stacked.groupBy(col("column_name"))
        .agg(sum(when(col("v_long").isNull && col("v_str").isNull, 1L)
          .otherwise(0L)).as("n_nulls"))
      val dvals = stacked
        .filter(col("v_long").isNotNull || col("v_str").isNotNull)
        .dropDuplicates("column_name", "v_long", "v_str")
      val stats = dvals.groupBy(col("column_name"))
        .agg(count(lit(1)).as("n_distinct"),
          coalesce(min(col("v_long")).cast("string"), min(col("v_str"))).as("min_s"),
          coalesce(max(col("v_long")).cast("string"), max(col("v_str"))).as("max_s"))
      // left join from nulls: an all-null column has no distinct rows but
      // must still report (n_nulls, 0, null, null) — the old single-agg
      // semantics for that edge (countDistinct over nothing is 0).
      nulls.join(stats, Seq("column_name"), "left")
        .select(col("column_name"), col("n_nulls"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_s"), col("max_s"))
        .orderBy(col("column_name"))
    }),

    // Exact 3-sigma outliers per event type — variance-based filtering
    // with NO floating comparison at the boundary: the test
    // |v*n - sum| > 3*sigma*n cross-multiplies to
    // (v*n - sum)^2 > 9*(n*sum_sq - sum^2), all in DECIMAL(38,0) integer
    // cents (DuckDB mirrors in HUGEINT), so boundary rows are
    // engine-independent — the discipline that makes a statistical filter
    // hash-verifiable. One groupBy for the moments, stats broadcast back,
    // one scan for the filter.
    "e_outliers_3sigma" -> ((s, dir) => {
      // precisions sized so every product fits decimal(38,0) even at
      // 1e12 rows/group (dev^2 and 9*(n*q - s^2) peak ~4e36); DuckDB
      // mirrors in HUGEINT (int128, max ~1.7e38)
      // cast to decimal BEFORE any product/sum: a long*long square or a
      // long running sum would overflow (ANSI throw / silent wrap) before
      // the decimal headroom ever applied — the HUGEINT oracle casts
      // first for the same reason. Sums keep their natural widened
      // precision (23/37 digits); every downstream product then peaks
      // ~4e36 < 10^38 even at 1e12 rows/group.
      val vDec = cents(col("value")).cast("decimal(13,0)")
      val stats = t(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(14,0)").as("n"),
          sum(vDec).as("s"),
          sum(vDec * vDec).as("q"))
      t(s, dir)
        .select(col("event_id"), col("event_type"), cents(col("value")).as("v_c"))
        .join(broadcast(stats), "event_type")
        .withColumn("dev", col("v_c").cast("decimal(13,0)") * col("n") - col("s"))
        .filter(col("dev") * col("dev") >
          lit(9).cast("decimal(2,0)") * (col("n") * col("q") - col("s") * col("s")))
        .select(col("event_type"), col("event_id"), col("v_c"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Gap-filled hourly timeline: the dense (event_type x hour) grid with
    // zero-filled missing cells — the reshape that turns sparse event
    // counts into a complete time series (dashboards, anomaly windows,
    // forecasting inputs). The timeline derives from one 2-value
    // aggregate + a generated sequence (never a scan), the grid is a
    // broadcast cross join of two tiny sides, and the only real shuffle
    // is the (type, hour) count.
    "e_gapfill_hours" -> ((s, dir) => {
      // ONE scan of events: the sparse (type, hour) aggregate is tiny
      // (types x hours rows) and pinned eagerly, then the timeline
      // bounds and the type list both derive from IT — min/max of the
      // hour-truncated column and its distinct types are identical to
      // those of the raw table, so the three consumers cost three reads
      // of the small frame, not three scans of events.
      val counts = t(s, dir)
        .select(col("event_type"),
          date_trunc("hour", expr("timestamp_micros(ts div 1000)")).as("hr"))
        .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val timeline = counts.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hr"))
      val types = counts.select(col("event_type")).distinct()
      types.crossJoin(broadcast(timeline))
        .join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH").as("hour_s"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("event_type"), col("hour_s"))
    }),

    // HLL++ approximate distinct users vs the exact count, with the
    // observed error in basis points — the recall_bp discipline applied
    // to the sketch family: the row itself carries the number the check
    // needs (rows-only; the 2%-rsd bound is asserted in SparkEntrySpec).
    // At 100 TB the sketch is THE distinct-count plan: fixed-size
    // registers merge map-side, no shuffle of distinct keys; the exact
    // count here is the verification column, not the serving path.
    "e_hll_users" -> ((s, dir) => {
      t(s, dir).agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
        .withColumn("err_bp",
          abs(col("n_approx") - col("n_exact")) * lit(10000L) / col("n_exact"))
        .withColumn("err_bp", col("err_bp").cast("long"))
    }),

    // KMV (k-minimum-values) distinct sketch — the sketch family's
    // FULL-hash-oracle member: unlike HLL's engine-private registers,
    // the KMV state (k smallest md5-prefix hashes per group) and its
    // estimator ((k-1)*2^48 div h_k, pure BIGINT) are reproducible in
    // ANSI SQL, so the oracle recomputes the sketch bit-for-bit — the
    // estimate itself is hash-checked, not just audited. At 100 TB the
    // aggregate's map-side buffers cap each task at k longs per group
    // (the exact countDistinct shuffles every distinct key); groups
    // with fewer than k distinct values come out EXACT by construction.
    "e_kmv_users" -> ((s, dir) => {
      import graft.operators.Kmv
      val k = 64
      val ev = t(s, dir).filter(col("user_id").isNotNull)
      val sk = Kmv.sketch(ev, col("user_id"), Seq(col("event_type")), k)
      val ex = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      ex.join(sk, "event_type")
        .withColumn("n_est", Kmv.estimate(col("kmv"), k))
        .select(col("event_type"), col("n_exact"), col("n_est"),
          expr("abs(n_est - n_exact) * 10000 div n_exact").as("err_bp"),
          // ~3 relative standard errors of the KMV estimator, the
          // analog of e_hll_users' 2%-rsd contract (floor in SketchSpec)
          lit((3.0 / math.sqrt(k - 2.0) * 10000).ceil.toLong).as("bound_bp"))
        .orderBy(col("event_type"))
    }),

    // Quantile SKETCH audit — completes the sketch family (HLL =
    // distinct, Count-Min = frequency, this = quantiles): Spark's
    // approx_percentile is a Greenwald-Khanna-style mergeable summary
    // whose guarantee is RANK error <= 1/accuracy, the only
    // fixed-memory quantile plan at 100 TB (the exact percentile
    // aggregates every value). The row self-audits in rank space, the
    // e_hll_users discipline: each sketched quantile value is joined
    // back and its true rank interval [rank_lt, rank_le] compared to
    // the target q*n — err_bp must sit inside bound_bp (SketchSpec
    // floor). Rows-only: DuckDB's approx sketch is a different
    // algorithm, so values can't hash-match.
    "e_value_sketch_quantiles" -> ((s, dir) => {
      // null guard up front: approx_percentile and the rank sums skip
      // nulls, so an unfiltered count(*) would target a rank in a
      // larger universe than the sketch's and inflate the audit
      val base = t(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), cents(col("value")).as("v"))
      val acc = 10000 // rank error <= 1/acc = 1 bp
      val sk = base.groupBy(col("event_type"))
        .agg(expr(s"approx_percentile(v, array(0.5, 0.95), $acc)").as("qs"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          posexplode(col("qs")).as(Seq("qi", "qv")))
        .withColumn("q_pm", when(col("qi") === 0, 500L).otherwise(950L))
        .drop("qi")
      base.join(sk, "event_type")
        .groupBy(col("event_type"), col("q_pm"), col("qv"), col("n"))
        .agg(sum(when(col("v") <= col("qv"), 1L).otherwise(0L)).as("rank_le"),
          sum(when(col("v") < col("qv"), 1L).otherwise(0L)).as("rank_lt"))
        // distance (in rows) from the target rank to the value's true
        // rank interval; 0 when q*n lands inside [rank_lt, rank_le]
        .withColumn("target_x1000", col("q_pm") * col("n"))
        .withColumn("miss_rows_x1000",
          greatest(lit(0L), col("rank_lt") * 1000L - col("target_x1000"),
            col("target_x1000") - col("rank_le") * 1000L))
        .select(col("event_type"), col("q_pm"), col("n"),
          col("qv").as("approx_c"),
          // whole rows of rank miss (the GK guarantee's native unit:
          // must stay <= n/accuracy + 1; the +1 absorbs the ceil in
          // the target-rank definition)
          expr("miss_rows_x1000 div 1000").as("miss_rows"),
          expr("(miss_rows_x1000 * 10) div n").as("err_bp"))
        .orderBy(col("event_type"), col("q_pm"))
    }),

    // Cohort retention triangle: users grouped by first-active date, then
    // distinct-user counts at each day offset — the product-analytics
    // staple. Every shuffle is keyed on user_id (first-touch agg, activity
    // distinct, cohort join all co-partition); the final (cohort, offset)
    // rollup is tiny. Dates go out as strings so the hash compare is
    // engine-neutral.
    "e_retention" -> ((s, dir) => {
      val act = t(s, dir)
        .select(col("user_id"),
          to_date(expr("timestamp_micros(ts div 1000)")).as("d"))
        .distinct()
      val first = act.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
      act.join(first, "user_id")
        .select(col("user_id"), col("cohort_d"),
          datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
        .groupBy(col("cohort_d"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort"), col("day_offset"))
    }),

    // Longest consecutive-day activity streak per user — the
    // gaps-and-islands shape: distinct activity days, then (day -
    // row_number) is constant exactly within a consecutive run, so one
    // window + two aggregations resolve all streaks. Window partitions
    // by user_id (high cardinality, skew-free); no global sort anywhere.
    "e_streak_users" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val act = t(s, dir)
        .select(col("user_id"),
          to_date(expr("timestamp_micros(ts div 1000)")).as("d"))
        .distinct()
      act
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("user_id")).orderBy(col("d"))))
        .withColumn("island", date_sub(col("d"), col("rn")))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_streaks"))
        .orderBy(col("user_id"))
    }),

    // CUBE over (event_type, weekday): all four grouping combinations in
    // one pass (Spark expands grouping sets before the single shuffle).
    // Sentinel coalesces keep the subtotal rows hash-comparable (NULL
    // ordering differs between engines).
    "e_cube_type_day" -> ((s, dir) => {
      t(s, dir)
        .withColumn("dow", dayofweek(tsFromNanos(col("ts"))).cast("long"))
        .cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("dow"), lit(-1L)).as("dow"),
          col("n"), col("sum_value_c"))
        .orderBy(col("etype"), col("dow"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the sketch itself is SQL: per-type k smallest distinct 48-bit
    // md5-prefix hashes (rn <= k window), the k-th one feeding the
    // integer KMV estimator — must match Spark's aggregate bit-for-bit
    "e_kmv_users" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h),
        |kth AS (SELECT event_type, max(nd) AS nd,
        |    max(CASE WHEN rn = 64 THEN hv END) AS hk
        |  FROM r WHERE rn <= 64 GROUP BY 1),
        |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |est AS (SELECT e.event_type, e.n_exact,
        |    CAST(CASE WHEN k.nd < 64 THEN k.nd
        |      ELSE 63 * 281474976710656 // k.hk END AS BIGINT) AS n_est
        |  FROM ex e JOIN kth k ON k.event_type = e.event_type)
        |SELECT event_type, n_exact, n_est,
        |  CAST(abs(n_est - n_exact) * 10000 // n_exact AS BIGINT) AS err_bp,
        |  CAST(3811 AS BIGINT) AS bound_bp
        |FROM est ORDER BY event_type""".stripMargin,

    "e_top3_per_type" ->
      """WITH v AS (SELECT event_type, CAST(floor(value*100) AS BIGINT) AS value_c,
        |            event_id FROM events
        |            WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |r AS (SELECT event_type, value_c, event_id,
        |      CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY value_c DESC, event_id) AS BIGINT) AS rank FROM v)
        |SELECT event_type, rank, event_id, value_c FROM r
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,

    "e_user_quartiles" ->
      """WITH s AS (SELECT user_id,
        |  CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS spend_c
        |  FROM events GROUP BY 1)
        |SELECT user_id, spend_c,
        |  CAST(ntile(4) OVER (ORDER BY spend_c DESC, user_id) AS BIGINT) AS quartile
        |FROM s ORDER BY user_id""".stripMargin,

    "e_unpivot_stats" ->
      """WITH s AS (SELECT event_type,
        |  CAST(min(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS min_c,
        |  CAST(max(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS max_c,
        |  count(*) AS n FROM events GROUP BY 1)
        |SELECT event_type, stat, v FROM (
        |  SELECT event_type, 'min_c' AS stat, min_c AS v FROM s
        |  UNION ALL SELECT event_type, 'max_c', max_c FROM s
        |  UNION ALL SELECT event_type, 'n', n FROM s)
        |ORDER BY event_type, stat""".stripMargin,

    "e_value_neighbors" ->
      """WITH v AS (SELECT event_id, event_type,
        |  CAST(floor(value*100) AS BIGINT) AS value_c FROM events)
        |SELECT event_id, event_type, value_c,
        |  CAST(count(*) OVER (PARTITION BY event_type ORDER BY value_c
        |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS n_near
        |FROM v ORDER BY event_type, event_id""".stripMargin,

    // identical semantics, different plan (sweep-line prefix sums) —
    // the oracle is the window formulation verbatim
    "e_value_density" ->
      """WITH v AS (SELECT event_id, event_type,
        |  CAST(floor(value*100) AS BIGINT) AS value_c FROM events)
        |SELECT event_id, event_type, value_c,
        |  CAST(count(*) OVER (PARTITION BY event_type ORDER BY value_c
        |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS n_near
        |FROM v ORDER BY event_type, event_id""".stripMargin,

    "e_column_stats" -> {
      val cols = Seq("event_id", "user_id", "event_type", "value_c", "ts_us", "props")
      val pieces = cols.map { c =>
        s"""SELECT '$c' AS column_name,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
           |FROM src""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH src AS (SELECT event_id, user_id, event_type,
         |  CAST(floor(value*100) AS BIGINT) AS value_c,
         |  CAST(epoch_us(ts) AS BIGINT) AS ts_us, props FROM events)
         |$pieces
         |ORDER BY column_name""".stripMargin
    },

    "e_outliers_3sigma" ->
      """WITH v AS (SELECT event_id, event_type,
        |  CAST(floor(value*100) AS BIGINT) AS v_c FROM events),
        |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(v_c) AS HUGEINT) AS s,
        |  CAST(sum(CAST(v_c AS HUGEINT) * v_c) AS HUGEINT) AS q
        |  FROM v GROUP BY 1)
        |SELECT v.event_type, v.event_id, v.v_c
        |FROM v JOIN st USING (event_type)
        |WHERE (CAST(v.v_c AS HUGEINT) * st.n - st.s) * (CAST(v.v_c AS HUGEINT) * st.n - st.s)
        |      > 9 * (st.n * st.q - st.s * st.s)
        |ORDER BY v.event_type, v.event_id""".stripMargin,

    "e_gapfill_hours" ->
      """WITH e AS (SELECT event_type,
        |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr FROM events),
        |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e),
        |tl AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr FROM b),
        |ty AS (SELECT DISTINCT event_type FROM e),
        |c AS (SELECT event_type, hr, count(*) AS n FROM e GROUP BY 1, 2)
        |SELECT ty.event_type, strftime(tl.hr, '%Y-%m-%d %H') AS hour_s,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM ty CROSS JOIN tl
        |LEFT JOIN c ON c.event_type = ty.event_type AND c.hr = tl.hr
        |ORDER BY ty.event_type, hour_s""".stripMargin,

    "e_streak_users" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |r AS (SELECT user_id, d,
        |      row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn FROM act),
        |i AS (SELECT user_id, d - CAST(rn AS INTEGER) AS island FROM r),
        |g AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
        |  CAST(count(*) AS BIGINT) AS n_streaks
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_d FROM act GROUP BY 1)
        |SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort,
        |  CAST(act.d - f.cohort_d AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
        |FROM act JOIN f ON act.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,

    // DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday -> +1 aligns
    "e_cube_type_day" ->
      """WITH e AS (SELECT event_type,
        |  CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |  CAST(floor(value*100) AS BIGINT) AS v FROM events)
        |SELECT coalesce(event_type, 'ALL') AS etype, coalesce(dow, -1) AS dow,
        |  count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_value_c
        |FROM e GROUP BY CUBE(event_type, dow) ORDER BY 1, 2""".stripMargin,

    "e_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS c_user, ts AS c_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, c.click_id,
        |  epoch_us(p.ts) - epoch_us(c.c_ts) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.c_user AND p.ts >= c.c_ts
        |ORDER BY p.event_id""".stripMargin,

    "e_attribution_bcast" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS c_user, ts AS c_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, c.click_id,
        |  epoch_us(p.ts) - epoch_us(c.c_ts) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.c_user AND p.ts >= c.c_ts
        |ORDER BY p.event_id""".stripMargin,

    // nearest = the closer of the two directional ASOF matches (ties
    // -> backward, <=); tolerance applied after, in the same epoch_us
    // integers the Spark side pre-projects
    "e_nearest_click" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error'),
        |c AS (
        |  SELECT user_id AS c_user, epoch_us(ts) AS c_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (SELECT e.event_id, c.click_id AS b_id, c.c_us AS b_us
        |      FROM e ASOF LEFT JOIN c ON e.user_id = c.c_user AND e.ts_us >= c.c_us),
        |f AS (SELECT e.event_id, c.click_id AS f_id, c.c_us AS f_us
        |      FROM e ASOF LEFT JOIN c ON e.user_id = c.c_user AND e.ts_us <= c.c_us),
        |m AS (
        |  SELECT e.event_id, e.user_id, e.ts_us,
        |    CASE WHEN b.b_id IS NOT NULL AND (f.f_id IS NULL OR e.ts_us - b.b_us <= f.f_us - e.ts_us)
        |         THEN b.b_id ELSE f.f_id END AS click_id,
        |    CASE WHEN b.b_id IS NOT NULL AND (f.f_id IS NULL OR e.ts_us - b.b_us <= f.f_us - e.ts_us)
        |         THEN b.b_us ELSE f.f_us END AS c_us
        |  FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id))
        |SELECT event_id, user_id,
        |  CASE WHEN abs(c_us - ts_us) <= 86400000000 THEN click_id END AS click_id,
        |  CASE WHEN abs(c_us - ts_us) <= 86400000000 THEN c_us - ts_us END AS gap_us
        |FROM m ORDER BY event_id""".stripMargin,

    // identical oracle to e_nearest_click: the broadcast strategy must
    // be row-identical to the union+window one
    "e_nearest_bcast" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error'),
        |c AS (
        |  SELECT user_id AS c_user, epoch_us(ts) AS c_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (SELECT e.event_id, c.click_id AS b_id, c.c_us AS b_us
        |      FROM e ASOF LEFT JOIN c ON e.user_id = c.c_user AND e.ts_us >= c.c_us),
        |f AS (SELECT e.event_id, c.click_id AS f_id, c.c_us AS f_us
        |      FROM e ASOF LEFT JOIN c ON e.user_id = c.c_user AND e.ts_us <= c.c_us),
        |m AS (
        |  SELECT e.event_id, e.user_id, e.ts_us,
        |    CASE WHEN b.b_id IS NOT NULL AND (f.f_id IS NULL OR e.ts_us - b.b_us <= f.f_us - e.ts_us)
        |         THEN b.b_id ELSE f.f_id END AS click_id,
        |    CASE WHEN b.b_id IS NOT NULL AND (f.f_id IS NULL OR e.ts_us - b.b_us <= f.f_us - e.ts_us)
        |         THEN b.b_us ELSE f.f_us END AS c_us
        |  FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id))
        |SELECT event_id, user_id,
        |  CASE WHEN abs(c_us - ts_us) <= 86400000000 THEN click_id END AS click_id,
        |  CASE WHEN abs(c_us - ts_us) <= 86400000000 THEN c_us - ts_us END AS gap_us
        |FROM m ORDER BY event_id""".stripMargin,

    // forward ASOF (c.ts <= p.p_ts picks the NEXT tick); the 1-hour
    // tolerance is applied after the match — the as-of match is the
    // closest tick, so out-of-window means no in-window tick exists
    "e_click_to_purchase" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id AS p_user, ts AS p_ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |m AS (
        |  SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.p_ts
        |  FROM c ASOF LEFT JOIN p ON c.user_id = p.p_user AND c.ts <= p.p_ts)
        |SELECT event_id, user_id,
        |  CASE WHEN epoch_us(p_ts) - epoch_us(ts) <= 3600000000 THEN purchase_id END
        |    AS purchase_id,
        |  CASE WHEN epoch_us(p_ts) - epoch_us(ts) <= 3600000000
        |    THEN epoch_us(p_ts) - epoch_us(ts) END AS gap_us
        |FROM m ORDER BY event_id""".stripMargin,

    "e_pivot_day_type" -> {
      val cols = EventTypes.map(t =>
        s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"")
        .mkString(",\n ")
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day_s,
         | $cols
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "e_value_percentiles" ->
      """SELECT event_type, count(*) AS n,
        | quantile_cont(CAST(floor(value*100) AS BIGINT), 0.5) AS p50_c,
        | quantile_cont(CAST(floor(value*100) AS BIGINT), 0.95) AS p95_c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "e_hourly_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour_s, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "e_top_users" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        | epoch_us(min(ts)) AS first_ts_us,
        | epoch_us(max(ts)) AS last_ts_us
        |FROM events
        |GROUP BY user_id
        |ORDER BY sum_value_c DESC, user_id
        |LIMIT 20""".stripMargin,

    "e_sessions" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |   lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events) x
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "e_sessions_native" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |   lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events) x
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "e_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | count(*) AS n,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "e_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup_us,
        |    max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase_us
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN first_signup_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
        |  CAST(sum(CASE WHEN first_signup_us < last_purchase_us THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM u""".stripMargin,

    "e_type_share" ->
      """WITH b AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, sum_value_c,
        |  CAST((n * 1000) // (SELECT sum(n) FROM b) AS BIGINT) AS share_pm
        |FROM b ORDER BY event_type""".stripMargin
  )
}
