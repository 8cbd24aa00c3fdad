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

  test("compaction: 64 tiny shards become byte-sized file counts, rows intact") {
    def parquetFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
    val frag = Layout.fragmentedEvents(spark, sfDir)
    val before = parquetFiles(frag)
    assert(before.size == 64, s"expected 64 shards, got ${before.size}")
    val target = 256L * 1024
    val out = Layout.compactDir(spark, frag, targetBytes = target)
    val after = parquetFiles(out)
    val totalBytes = before.map(_.length()).sum
    val expectedFiles = math.max(1L, (totalBytes + target - 1) / target)
    assert(after.size == expectedFiles,
      s"expected $expectedFiles files for $totalBytes bytes at $target, got ${after.size}")
    assert(after.size < before.size / 4, "compaction must collapse the file count")
    // lossless: full row multiset equality via a null-safe anti-join both ways
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
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
