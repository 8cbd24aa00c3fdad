package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The layout module's claims are PLAN claims — assert them on the
  * executed plan, not just the results (results are covered by the
  * oracle gate on q_colocated_join / e_pruned_type). */
class LayoutSpec extends SparkSpec {

  test("bucketed fact-fact join runs with zero Exchange on either side") {
    val joined = Layout.colocatedJoin(spark, sfDir)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-located join must not shuffle either side:\n$plan")
    // and it is genuinely the same join: row count matches the plain one
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("scan of the partitioned events layout prunes by partition filter") {
    val pruned = spark.read.parquet(Layout.eventsByType(spark, sfDir))
      .filter(col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"expected event_type in PartitionFilters:\n$scan")
    // pruning must not change the answer
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(pruned.count() == expected)
  }

  test("joining the partitioned fact on its partition column prunes DYNAMICALLY") {
    // the pruning predicate comes from the dim's filter, invisible to
    // static pruning — Catalyst must insert a DynamicPruningSubquery
    // (dim must be a FILE relation: a literal local dim's filter folds
    // into its rows and DPP sees no selective predicate — see
    // Layout.priorityDim)
    val dim = spark.read.parquet(Layout.priorityDim(spark))
    val q = spark.read.parquet(Layout.eventsByType(spark, sfDir))
      .join(broadcast(dim.filter(col("priority") === 1)),
        col("event_type") === col("t"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning expression in the fact scan:\n$plan")
    // and the runtime-pruned join returns exactly the statically-known rows
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(q.count() == expected)
  }
}
