package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — the time-series joins Spark lacks natively.
  *
  *  - [[backward]]: for every left row, the single right row with the
  *    greatest `rightTime <= leftTime` in the same key group (null-padded
  *    when none exists). Canonical shapes: trade→latest-quote,
  *    purchase→latest-preceding-click attribution, reading→latest-config.
  *  - [[forward]]: the single right row with the SMALLEST
  *    `rightTime >= leftTime` — next-purchase-after-click
  *    (time-to-convert), next-maintenance-after-reading.
  *  - Both take an optional `tolerance` predicate over
  *    `(leftTime, rightTime)`: a matched tick failing it null-pads the
  *    row instead. This is exact, not a post-hoc approximation — the
  *    as-of match is the CLOSEST tick, so if it fails a monotone gap
  *    bound every other tick does too.
  *
  * Two physical strategies, same semantics (specs pin parity):
  *
  *  - [[backward]]/[[forward]] — union + running-window composition: tag
  *    both sides, union, `last(right payload, ignoreNulls)` over a
  *    (key, time)-ordered running window, keep left rows. ONE shuffle on
  *    the key — same cost as a plain equi join — and no range-condition
  *    explosion: the naive formulation (`l.k = r.k AND r.t <= l.t` theta
  *    join + max filter) degenerates to a per-key cross product,
  *    O(|l|·|r|) within every key; this is O((|l|+|r|) log) via the
  *    window sort. The right choice when BOTH sides are large.
  *  - [[backwardBroadcast]]/[[forwardBroadcast]] — dimension-sized right:
  *    group the right into per-key sorted tick arrays (one small shuffle
  *    of the right only), broadcast, and probe by codegen'd binary search
  *    ([[graft.functions.SortedCountLE]]). The LEFT SIDE IS NEVER
  *    SHUFFLED — at 100 TB this is the only acceptable plan for a
  *    petabyte fact stream against thousands of config/price ticks; the
  *    union variant would shuffle the fact table just to sort ticks into
  *    it. Requires an integral (long) time axis; the catalog's nanosecond
  *    timestamps are exactly that.
  *
  * Tie semantics both directions: a tick at exactly `leftTime` is matched
  * (`>=`/`<=` semantics, mirroring DuckDB's ASOF JOIN, our oracle).
  *
  * Contract: (rightKey, rightTime) pairs must be unique on the right (the
  * standard as-of contract — with duplicates "the latest tick" is
  * ill-defined); pre-aggregate the right side otherwise. Column names
  * must be disjoint between the sides (the relational-catalog
  * convention). NULL right keys/times never match; NULL left keys/times
  * produce null-padded output rows (SQL semantics).
  */
object AsofJoin {

  type TolerancePredicate = (Column, Column) => Column

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tolerance: Option[TolerancePredicate] = None): DataFrame =
    viaUnionWindow(left, right, leftKey, rightKey, leftTime, rightTime,
      forward = false, tolerance)

  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              tolerance: Option[TolerancePredicate] = None): DataFrame =
    viaUnionWindow(left, right, leftKey, rightKey, leftTime, rightTime,
      forward = true, tolerance)

  /** Nearest-tick as-of (pandas merge_asof's direction='nearest'): the
    * right row minimizing |rightTime - leftTime| per key; ties go
    * BACKWARD (the earlier tick), mirroring merge_asof. Requires a
    * numeric (long-castable) time axis — "nearest" needs a distance,
    * not just an order. One key shuffle: both directional candidates
    * come from two running windows over the SAME partitioning (Spark
    * re-sorts but never re-shuffles between them). */
  def nearest(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              tolerance: Option[TolerancePredicate] = None): DataFrame = {
    requireIntegralTime(left, leftTime, "nearest")
    requireIntegralTime(right, rightTime, "nearest")
    val unioned = taggedUnion(left, right, leftKey, rightKey, leftTime, rightTime)
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // tolerance applies PER DIRECTION, before the choice: with an
    // asymmetric predicate the nearest tick can fail while the other
    // direction's tick passes — choosing first would null-pad a row
    // that has a legitimate tolerance-satisfying match
    def tolOkOn(cand: Column): Column = tolerance
      .map(p => p(col("__t"), cand.getField(rightTime)))
      .getOrElse(lit(true))
    // gap arithmetic in DECIMAL (round-11 advice): raw long subtraction
    // wraps when the axis spans more than half the long range (bT near
    // MIN, fT near MAX inverts the choice); decimal(21,0) holds any
    // long and decimal subtraction is exact, at per-matched-row cost
    val lT = col("__t").cast("decimal(21,0)")
    val bT = col("__bv").getField(rightTime).cast("decimal(21,0)")
    val fT = col("__fv").getField(rightTime).cast("decimal(21,0)")
    // forward wins only when STRICTLY closer: equal distance -> backward
    val chooseF = col("__bv").isNull ||
      (col("__fv").isNotNull && (fT - lT) < (lT - bT))
    val matched = unioned
      .withColumn("__b", last(col("__rpay"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__rpay"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__bv", when(tolOkOn(col("__b")), col("__b")))
      .withColumn("__fv", when(tolOkOn(col("__f")), col("__f")))
      .withColumn("__raw", when(chooseF, col("__fv")).otherwise(col("__bv")))
    selectOut(matched
      .withColumn("__match",
        when(col("__t").isNotNull && col("__raw").isNotNull, col("__raw"))),
      left, right)
  }

  /** "Nearest" needs a distance and the broadcast probe needs exact
    * long arithmetic — a TimestampType would silently cast to epoch
    * SECONDS here (fabricating matches the full-precision window
    * strategy rejects), so the integral-axis contract is enforced, not
    * just documented. Timestamp callers project `ts div 1000` first. */
  private def requireIntegralTime(df: DataFrame, timeCol: String,
                                  what: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(timeCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"AsofJoin.$what requires an integral (long-castable without loss) time " +
        s"axis; column '$timeCol' is $dt — project it to long (e.g. epoch " +
        "micros) first, or use backward/forward, which compare the raw type")
  }

  /** Tag both sides and union into one (key, time)-keyed frame — the
    * shared front half of the window strategies.
    *
    * SQL semantics (and DuckDB ASOF, our oracle): a NULL key or NULL
    * time on the right can never match anything — but a NULL __t sorts
    * FIRST in the ascending window and a NULL __k forms its own window
    * partition, so left unfiltered they would fabricate matches.
    * NULL-key/time LEFT rows stay (they must appear in the output) and
    * correctly get a null-padded right side: their partition/prefix
    * contains no surviving right row — except a null-time left row in a
    * DESCENDING order, which sorts last and would see every tick; the
    * callers' explicit __t guard covers that case.
    *
    * (df(name) + getField keep arbitrary column names intact — a dotted
    * name inside an interpolated path would parse as nested navigation.) */
  private def taggedUnion(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTime: String, rightTime: String): DataFrame = {
    val lPay = struct(left.columns.map(left(_)): _*)
    val rPay = struct(right.columns.map(right(_)): _*)
    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lPay.as("__lpay"))
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(left.schema).as("__lpay"), rPay.as("__rpay"))
    lTagged
      .withColumn("__rpay", lit(null).cast(right.schema))
      .unionByName(rTagged)
  }

  /** Project the matched frame back to left columns + (possibly null)
    * right columns — the shared back half. */
  private def selectOut(matched: DataFrame,
                        left: DataFrame, right: DataFrame): DataFrame =
    matched.select(
      left.columns.map(c => col("__lpay").getField(c).as(c)) ++
        right.columns.map(c => col("__match").getField(c).as(c)): _*)

  /** Entry fail-fast for the broadcast strategies: per-key tick arrays
    * are built by `collect_list` and broadcast whole, so an oversized
    * right side dies at the broadcast/Kryo wall MID-JOB with an opaque
    * serialization error. Counting the (match-eligible) right side first
    * is one cheap agg against a dimension-sized input, and the failure
    * names the dial and the alternative plan. */
  val BroadcastMaxRightRows = 10000000L

  def backwardBroadcast(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String,
                        tolerance: Option[TolerancePredicate] = None,
                        maxRightRows: Long = BroadcastMaxRightRows): DataFrame =
    viaBroadcast(left, right, leftKey, rightKey, leftTime, rightTime,
      forward = false, tolerance, maxRightRows)

  def forwardBroadcast(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       tolerance: Option[TolerancePredicate] = None,
                       maxRightRows: Long = BroadcastMaxRightRows): DataFrame =
    viaBroadcast(left, right, leftKey, rightKey, leftTime, rightTime,
      forward = true, tolerance, maxRightRows)

  /** Nearest-tick as-of on the broadcast strategy — [[nearest]]'s
    * semantics (min |rightTime - leftTime|, ties backward, per-direction
    * tolerance) with [[backwardBroadcast]]'s plan shape: the fact side
    * NEVER shuffles. One `countLE` binary search yields BOTH candidates:
    * the greatest tick <= t sits at index countLE, and the smallest
    * tick >= t is that SAME tick when it equals t exactly (one O(1)
    * array peek decides) or the next one otherwise — so the per-row
    * cost is one binary search plus an element compare, not two
    * searches. The exact-hit forward candidate must be the tick itself,
    * not its successor: an asymmetric tolerance can reject the
    * zero-gap backward candidate, and the window strategy then
    * considers only the SAME tick forward — probing the successor
    * instead would fabricate a match the window twin null-pads
    * (parity-pinned in AsofJoinSpec). */
  def nearestBroadcast(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       tolerance: Option[TolerancePredicate] = None,
                       maxRightRows: Long = BroadcastMaxRightRows): DataFrame = {
    requireIntegralTime(left, leftTime, "nearestBroadcast")
    requireIntegralTime(right, rightTime, "nearestBroadcast")
    import graft.functions.AsofFunctions.countLE
    val grouped = groupTicksGuarded(right, rightKey, rightTime,
      maxRightRows, "nearestBroadcast")
    val joined = left.join(broadcast(grouped),
      left(leftKey) === grouped("__k"), "left")
    def pick(idx: Column): Column =
      when(idx.between(lit(1), size(col("__ts"))), element_at(col("__pays"), idx))
    // tolerance per DIRECTION before the choice (same contract as the
    // window-strategy nearest: an asymmetric predicate can fail the
    // nearer tick while the other direction's tick passes)
    def tolOkOn(cand: Column): Column = tolerance
      .map(p => p(col(leftTime), cand.getField(rightTime)))
      .getOrElse(lit(true))
    val lT = col(leftTime).cast("decimal(21,0)")
    def gapOf(cand: Column): Column =
      cand.getField(rightTime).cast("decimal(21,0)")
    val matched = joined
      .withColumn("__bidx", countLE(col("__ts"), col(leftTime).cast("long")))
      .withColumn("__fidx",
        when(col("__bidx") >= 1 &&
            element_at(col("__ts"), col("__bidx")) === col(leftTime).cast("long"),
          col("__bidx")).otherwise(col("__bidx") + lit(1)))
      .withColumn("__braw", pick(col("__bidx")))
      .withColumn("__fraw", pick(col("__fidx")))
      .withColumn("__bv", when(tolOkOn(col("__braw")), col("__braw")))
      .withColumn("__fv", when(tolOkOn(col("__fraw")), col("__fraw")))
      // forward wins only when STRICTLY closer: equal distance -> backward
      // (and an exact-tick hit IS the backward candidate at gap 0)
      .withColumn("__match",
        when(col("__bv").isNull ||
            (col("__fv").isNotNull &&
              (gapOf(col("__fv")) - lT) < (lT - gapOf(col("__bv")))),
          col("__fv")).otherwise(col("__bv")))
    matched.select(
      left.columns.map(c => left(c)) ++
        right.columns.map(c => col("__match").getField(c).as(c)): _*)
  }

  private def viaUnionWindow(left: DataFrame, right: DataFrame,
                             leftKey: String, rightKey: String,
                             leftTime: String, rightTime: String,
                             forward: Boolean,
                             tolerance: Option[TolerancePredicate]): DataFrame = {
    val unioned = taggedUnion(left, right, leftKey, rightKey, leftTime, rightTime)
    // Backward: ascending time, running last-right-seen = greatest
    // rt <= lt. Forward: DESCENDING time, running last-right-seen =
    // smallest rt >= lt. Right rows sort before left rows at equal time
    // in both (side 0 < 1), so an exactly-equal tick is matched.
    val ord =
      if (forward) Seq(col("__t").desc, col("__side").asc)
      else Seq(col("__t").asc, col("__side").asc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolOk = tolerance
      .map(p => p(col("__t"), col("__raw").getField(rightTime)))
      .getOrElse(lit(true))
    val matched = unioned
      .withColumn("__raw", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__match",
        when(col("__t").isNotNull && tolOk, col("__raw")))
    selectOut(matched, left, right)
  }

  /** The broadcast strategies' shared right-side stage: per-key sorted
    * tick arrays, guarded by the envelope fail-fast (see
    * [[BroadcastMaxRightRows]]). One row per key, ticks ascending by
    * time. The comparator lambda orders by the time field ALONE — a
    * bare struct sort would demand every payload type be orderable
    * (maps are not) and would compare payloads on (contract-violating)
    * time ties.
    *
    * The guard RIDES the aggregation job instead of running an eager
    * `count()` at plan-construction time (which made every call — even
    * a plan that was never executed — pay a full right-side scan as a
    * separate job): a 1-row eligible-row total broadcast-crossjoins
    * onto the grouped side, and the `__ts` projection raises
    * executor-side on the first output row when the total exceeds the
    * envelope — BEFORE the per-key arrays are collected to the driver
    * by the broadcast exchange. The fail-fast is therefore lazy: it
    * surfaces on the first action, wrapped in the task failure. */
  private def groupTicksGuarded(right: DataFrame, rightKey: String,
                                rightTime: String, maxRightRows: Long,
                                what: String): DataFrame = {
    val eligible = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val total = eligible.groupBy().agg(count(lit(1)).as("__nright"))
    val guardMsg = concat(
      lit(s"AsofJoin.$what: right side has "),
      col("__nright").cast("string"),
      lit(s" match-eligible rows (> maxRightRows = $maxRightRows) — the " +
        "per-key tick arrays would exceed the broadcast envelope " +
        "mid-job. Use the union+window strategy " +
        "(backward/forward/nearest), which handles a large right side " +
        "with one key shuffle, or raise maxRightRows if the " +
        "driver/executors have the memory"))
    val rPay = struct(right.columns.map(right(_)): _*)
    eligible
      .groupBy(col(rightKey).as("__k"))
      .agg(array_sort(
        collect_list(struct(col(rightTime).cast("long").as("__rt"), rPay.as("__p"))),
        (a, b) => when(a.getField("__rt") < b.getField("__rt"), -1)
          .when(a.getField("__rt") > b.getField("__rt"), 1)
          .otherwise(0)
      ).as("__ticks"))
      .crossJoin(broadcast(total))
      .select(col("__k"),
        // the guard lives inside a REQUIRED output column — an
        // unreferenced assert column would be pruned by Catalyst
        when(col("__nright") > maxRightRows, raise_error(guardMsg))
          .otherwise(transform(col("__ticks"), x => x.getField("__rt")))
          .as("__ts"),
        transform(col("__ticks"), x => x.getField("__p")).as("__pays"))
  }

  /** Integral (long) time axis required: the probe is a binary search
    * over a broadcast sorted `array<long>` per key. */
  private def viaBroadcast(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           leftTime: String, rightTime: String,
                           forward: Boolean,
                           tolerance: Option[TolerancePredicate],
                           maxRightRows: Long): DataFrame = {
    val what = if (forward) "forwardBroadcast" else "backwardBroadcast"
    requireIntegralTime(left, leftTime, what)
    requireIntegralTime(right, rightTime, what)
    import graft.functions.AsofFunctions.{countLE, countLT}
    val grouped = groupTicksGuarded(right, rightKey, rightTime, maxRightRows, what)

    val joined = left.join(broadcast(grouped),
      left(leftKey) === grouped("__k"), "left")
    // Backward: countLE = 1-based index of the greatest tick <= t.
    // Forward: countLT = ticks strictly before t, so the next tick at or
    // after t sits at countLT + 1 (when it exists).
    val idx =
      if (forward) countLT(col("__ts"), col(leftTime).cast("long")) + lit(1)
      else countLE(col("__ts"), col(leftTime).cast("long"))
    val tolOk = tolerance
      .map(p => p(col(leftTime), col("__raw").getField(rightTime)))
      .getOrElse(lit(true))
    val matched = joined
      .withColumn("__idx", idx)
      .withColumn("__raw",
        when(col("__idx").between(lit(1), size(col("__ts"))),
          element_at(col("__pays"), col("__idx"))))
      .withColumn("__match", when(col("__raw").isNotNull && tolOk, col("__raw")))
    matched.select(
      left.columns.map(c => left(c)) ++
        right.columns.map(c => col("__match").getField(c).as(c)): _*)
  }
}
