package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase distributed prefix sum vs the single-partition window
  * it replaces: identical ranks/running sums, a collect bounded by the
  * partition count, and no global (empty-partitionBy) window in the
  * plan. */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(7)
    // duplicate keys force the tiebreaker to matter; weights vary
    (1 to 500).map(i => (i.toLong, rnd.nextInt(40).toLong, 1L + rnd.nextInt(9)))
  }

  test("offset + per-partition row_number equals the global rank") {
    val df = rows.toDF("id", "key", "w")
    val pre = PrefixSum.ranged(df, 8, Seq(col("key").desc, col("id")), lit(1L))
    val localW = Window.partitionBy(col("pid")).orderBy(col("key").desc, col("id"))
    val got = pre.df
      .withColumn("rank", row_number().over(localW).cast("long") + pre.offset)
      .select(col("id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df
      .withColumn("rank", row_number().over(
        Window.orderBy(col("key").desc, col("id"))).cast("long"))
      .select(col("id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre.total == 500L)
    assert(got == expected)
  }

  test("offset + per-partition running sum equals the global exclusive prefix sum") {
    val df = rows.toDF("id", "key", "w")
    val pre = PrefixSum.ranged(df, 8, Seq(col("key").desc, col("id")), col("w"))
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("key").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = pre.df
      .withColumn("cum0", coalesce(sum(col("w")).over(localW), lit(0L)) + pre.offset)
      .select(col("id"), col("cum0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df
      .withColumn("cum0", coalesce(sum(col("w")).over(
        Window.orderBy(col("key").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("cum0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre.total == rows.map(_._3).sum)
    assert(got == expected)
  }

  test("no single-partition window: every window in the plan partitions by pid") {
    val df = rows.toDF("id", "key", "w")
    val pre = PrefixSum.ranged(df, 8, Seq(col("key").desc, col("id")), lit(1L))
    val localW = Window.partitionBy(col("pid")).orderBy(col("key").desc, col("id"))
    val ranked = pre.df
      .withColumn("rank", row_number().over(localW).cast("long") + pre.offset)
    // descend through AQE wrappers: WindowExec sits inside the adaptive
    // plan, invisible to a flat collect on the root
    def windowsIn(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.window.WindowExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windowsIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        windowsIn(q.plan)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w +: w.children.flatMap(windowsIn)
      case other => other.children.flatMap(windowsIn)
    }
    val windows = windowsIn(ranked.queryExecution.executedPlan)
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found a global (empty partitionBy) window — the shape PrefixSum exists to kill")
  }

  test("1024 partitions: offsets survive a partition count that would " +
    "choke a folded when()-chain's codegen") {
    // pre-broadcast-join, the offset was a numPartitions-deep nested
    // when() expression — at ~1000 partitions the generated code blows
    // past JIT method limits and falls back to interpreted eval; the
    // (pid, offset) broadcast join must deliver identical ranks at any
    // partition count.
    val df = rows.toDF("id", "key", "w")
    val pre = PrefixSum.ranged(df, 1024, Seq(col("key").desc, col("id")), col("w"))
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("key").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = pre.df
      .withColumn("cum0", coalesce(sum(col("w")).over(localW), lit(0L)) + pre.offset)
      .select(col("id"), col("cum0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df
      .withColumn("cum0", coalesce(sum(col("w")).over(
        Window.orderBy(col("key").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("cum0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre.total == rows.map(_._3).sum)
    assert(got == expected)
  }

  test("empty input yields zero total and a usable frame") {
    val df = spark.range(0).selectExpr("id", "id AS key", "id AS w")
    val pre = PrefixSum.ranged(df, 4, Seq(col("key"), col("id")), col("w"))
    assert(pre.total == 0L)
    assert(pre.df.count() == 0L)
  }
}
