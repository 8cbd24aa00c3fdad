package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-reduced join equals the plain inner join on real tables") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val reduced = BloomJoin.join(li, orders, "l_orderkey", "o_orderkey",
        expectedKeys = orders.count(), fpp = 0.01)
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
    assert(plain.count() > 0)
  }

  test("prune removes most non-matching fact rows at the configured fpp") {
    val keys = (1L to 50L).toDF("k")
    val fact = (1L to 20000L).toDF("fk")
    val bloom = BloomJoin.buildBloom(keys, "k", expectedKeys = 50, fpp = 0.01)
    val kept = BloomJoin.prune(fact, "fk", bloom).count()
    // 50 true hits + ~1% FP of the 19950 misses; allow generous slack
    assert(kept >= 50 && kept < 50 + 800, s"kept $kept")
  }

  test("null fact keys never pass the filter (inner-join semantics)") {
    val keys = Seq(1L, 2L).toDF("k")
    val fact = Seq(Some(1L), None, Some(99999L)).toDF("fk")
    val bloom = BloomJoin.buildBloom(keys, "k", 2)
    val kept = BloomJoin.prune(fact, "fk", bloom).collect()
    assert(!kept.exists(_.isNullAt(0)), "null key must never pass")
    assert(kept.exists(r => r.getLong(0) == 1L), "true member must pass")
  }

  test("join works when both sides share the key column name") {
    // unqualified col(key) threw AMBIGUOUS_REFERENCE for the commonest
    // equi-join shape (same key name on both sides)
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = (1L to 10L).toDF("k")
    val joined = BloomJoin.join(fact, dim, "k", "k", expectedKeys = 3)
    assert(joined.count() === 3)
  }

  test("empty dimension yields an empty join, not a crash") {
    val keys = Seq.empty[Long].toDF("k")
    val fact = (1L to 10L).toDF("fk")
    val bloom = BloomJoin.buildBloom(keys, "k", 0)
    assert(BloomJoin.prune(fact, "fk", bloom).count() == 0)
    assert(BloomJoin.join(fact, keys, "fk", "k", 0).count() == 0)
  }

  test("the bloom predicate sits on the scan side, before any exchange") {
    // a parquet-backed fact (a local Seq would be constant-folded by
    // ConvertToLocalRelation, hiding the predicate from the plan)
    val keys = (1L to 10L).toDF("k")
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey")
    val bloom = BloomJoin.buildBloom(keys, "k", 10)
    val plan = BloomJoin.prune(fact, "l_orderkey", bloom)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    assert(!plan.contains("Exchange"), "prune alone must not shuffle")
  }

  test("Spark's own runtime bloom injection fires on our join shape (thresholds lowered)") {
    import org.apache.spark.sql.functions._
    // the injection rule is SIZE-gated (application side >= 10 GB by
    // default), so at bench scale it never fires; lowering the
    // thresholds proves the catalog's equi-join-with-selective-build
    // SHAPE is exactly what InjectRuntimeFilter rewrites at 100 TB —
    // where the explicit BloomJoin operator and Spark's automatic
    // filter meet.
    // autoBroadcast off too: the rule (correctly) refuses to inject
    // when the creation side is broadcastable by size — a broadcast
    // join needs no runtime filter; at 100 TB neither side broadcasts
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    def joined() = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).count()
    // baseline BEFORE the confs: an expected built while injection is
    // active would be rewritten identically to q, and a filter that
    // wrongly dropped rows would drop them from both sides
    val expected = joined()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = joined()
      // assert on the optimized logical plan: the physical string
      // renders the filter's scalar subquery out-of-line under AQE
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$plan")
      // and the filter must not change the answer
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
