package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SlidingRangeCountRewrite: the optimizer turns a sliding-RANGE COUNT
  * into a difference of two cumulative counts. Every test compares the
  * rule-on result against the rule-off result of the IDENTICAL query —
  * the rewrite must be invisible except in the plan.
  */
class WindowRewritesSpec extends SparkSpec {

  private def installed(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[SlidingRangeCountRewrite]) :+
        SlidingRangeCountRewrite(spark)

  private def withRule[A](f: => A): A = {
    installed()
    spark.conf.set(SlidingRangeCountRewrite.ConfKey, "true")
    try f finally spark.conf.set(SlidingRangeCountRewrite.ConfKey, "false")
  }

  private def baseline[A](f: => A): A = {
    installed()
    spark.conf.set(SlidingRangeCountRewrite.ConfKey, "false")
    f
  }

  /** Random (grp, v) rows with nulls; v integral. */
  private def fuzz(seed: Long, n: Int, nullEvery: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v: java.lang.Long =
        if (nullEvery > 0 && i % nullEvery == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(500).toLong)
      (i.toLong, s"g${rnd.nextInt(3)}", v)
    }.toDF("id", "grp", "v")
  }

  private def slidingCount(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.withColumn("n_near", count(lit(1)).over(
        Window.partitionBy(col("grp")).orderBy(col("v")).rangeBetween(lo, hi)))
      .orderBy(col("id"))

  private def collectRows(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("id"), col("n_near")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("rewrites the frame: no literal-lower RANGE remains; results identical (nulls included)") {
    val df = fuzz(seed = 7L, n = 4000, nullEvery = 17)
    val q = slidingCount(df, -30L, 30L)
    val expected = baseline(collectRows(q))
    val (got, plan) = withRule {
      (collectRows(q), q.queryExecution.executedPlan.toString)
    }
    assert(got == expected)
    assert(!plan.contains("specifiedwindowframe(RangeFrame, -30"),
      s"sliding frame survived the rewrite:\n$plan")
    assert(plan.contains("specifiedwindowframe(RangeFrame, unboundedpreceding$()"),
      s"cumulative frames missing:\n$plan")
    // one WindowExec: the two cumulative frames share the pass. The
    // baseline plan comes from a FRESH query (queryExecution is lazily
    // cached on `q` by the rule-on read above — re-reading it under
    // conf=false would return the same rule-on plan and the comparison
    // would be vacuous).
    val freshBaselinePlan = baseline(
      slidingCount(df, -30L, 30L).queryExecution.executedPlan.toString)
    assert(freshBaselinePlan.contains("specifiedwindowframe(RangeFrame, -30"),
      "baseline must really be unrewritten")
    assert(plan.linesIterator.count(_.contains("Window")) ==
      freshBaselinePlan.linesIterator.count(_.contains("Window")),
      "rewrite must not add a second WindowExec")
  }

  test("boundary fuzz: random radii, asymmetric and ahead-only frames, count(col)") {
    val rnd = new scala.util.Random(11L)
    for (trial <- 0 until 6) {
      val lo = rnd.nextInt(60) - 40L // mixes negative and positive lowers
      val hi = lo + rnd.nextInt(50)  // hi >= lo always
      val df = fuzz(seed = 100L + trial, n = 1500, nullEvery = 13)
      // count(v): null-counted-expression rows must not drift either
      val q = df.withColumn("n_near", count(col("v")).over(
          Window.partitionBy(col("grp")).orderBy(col("v")).rangeBetween(lo, hi)))
        .orderBy(col("id"))
      val expected = baseline(collectRows(q))
      val got = withRule(collectRows(q))
      assert(got == expected, s"trial $trial: lo=$lo hi=$hi diverged")
    }
  }

  test("current-row bounds rewrite exactly (peer-group counting)") {
    val df = fuzz(seed = 23L, n = 2000, nullEvery = 9)
    for ((lo, hi) <- Seq((0L, 40L), (-40L, 0L), (0L, 0L))) {
      val q = slidingCount(df, lo, hi)
      val expected = baseline(collectRows(q))
      val got = withRule(collectRows(q))
      assert(got == expected, s"bounds ($lo, $hi) diverged")
    }
  }

  test("ineligible shapes are left untouched") {
    val df = fuzz(seed = 31L, n = 500, nullEvery = 0)
    // sum (empty-frame NULL vs 0 divergence), descending order, double
    // key, and an INT key (the rewrite's key+(lo-1) would sit one step
    // closer to Int.MinValue than anything the original evaluates —
    // min-adjacent sentinels are realistic in 32-bit domains, so
    // narrower-than-long keys are excluded by design)
    val sumQ = df.withColumn("s", sum(col("v")).over(
      Window.partitionBy(col("grp")).orderBy(col("v")).rangeBetween(-5, 5)))
    val descQ = df.withColumn("n", count(lit(1)).over(
      Window.partitionBy(col("grp")).orderBy(col("v").desc).rangeBetween(-5, 5)))
    val dblQ = df.withColumn("d", col("v").cast("double"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("grp")).orderBy(col("d")).rangeBetween(-5, 5)))
    val intQ = df.withColumn("i", col("v").cast("int"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("grp")).orderBy(col("i")).rangeBetween(-5, 5)))
    withRule {
      for (q <- Seq(sumQ, descQ, dblQ, intQ)) {
        val plan = q.queryExecution.optimizedPlan.toString
        assert(plan.contains("specifiedwindowframe(RangeFrame, -5"),
          s"ineligible frame was rewritten:\n$plan")
      }
    }
  }

  test("conf disables the rule") {
    // (DISTINCT and FILTER window aggregates are rejected by the
    // analyzer itself, so the rule's isDistinct/filter guards are
    // unreachable belt-and-suspenders — no runtime shape exercises them)
    val df = fuzz(seed = 37L, n = 300, nullEvery = 0)
    baseline {
      val q = slidingCount(df, -5L, 5L)
      assert(q.queryExecution.optimizedPlan.toString
        .contains("specifiedwindowframe(RangeFrame, -5"))
    }
    // falsy spellings AND unparsable values must all disable — a typo'd
    // "disable" intent silently keeping the rewrite active contradicts
    // the user (treat-unknown-as-disabled is the conservative reading)
    installed()
    for (v <- Seq("0", "off", "no", "False", "bogus-typo")) {
      spark.conf.set(SlidingRangeCountRewrite.ConfKey, v)
      try {
        val q = slidingCount(df, -5L, 5L)
        assert(q.queryExecution.optimizedPlan.toString
          .contains("specifiedwindowframe(RangeFrame, -5"),
          s"value '$v' did not disable the rewrite")
      } finally spark.conf.set(SlidingRangeCountRewrite.ConfKey, "false")
    }
    // truthy spellings keep it on
    for (v <- Seq("1", "on", "yes", "TRUE")) {
      spark.conf.set(SlidingRangeCountRewrite.ConfKey, v)
      try {
        val q = slidingCount(df, -5L, 5L)
        assert(!q.queryExecution.optimizedPlan.toString
          .contains("specifiedwindowframe(RangeFrame, -5"),
          s"value '$v' did not enable the rewrite")
      } finally spark.conf.set(SlidingRangeCountRewrite.ConfKey, "false")
    }
  }

  test("the catalog's manual cumulative form and the rule-rewritten naive form agree on events") {
    // naive per-type sliding RANGE count over real data, rewritten by the
    // rule, vs the unrewritten execution of the same query
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").as("id"),
        col("event_type"), (floor(col("value") * 100)).cast("long").as("value_c"))
    val q = ev.withColumn("n_near", count(lit(1)).over(
        Window.partitionBy(col("event_type")).orderBy(col("value_c"))
          .rangeBetween(-1000, 1000)))
      .orderBy(col("id"))
    val expected = baseline(collectRows(q))
    val got = withRule(collectRows(q))
    assert(got == expected)
  }
}
