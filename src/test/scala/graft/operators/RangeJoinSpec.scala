package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunked range join vs the naive theta-join reference: identical
  * matches (including negative values and chunk-boundary endpoints),
  * and the plan is an equi-join, not a nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = {
    val rng = new scala.util.Random(5)
    (0 until 2000).map(i => (i.toLong, rng.nextInt(2000).toLong - 1000))
      .toDF("pid", "p")
  }
  private lazy val intervals = {
    val rng = new scala.util.Random(6)
    (0 until 300).map { i =>
      val s = rng.nextInt(2000).toLong - 1000
      (i.toLong, s, s + rng.nextInt(60).toLong)
    }.toDF("iid", "s", "e")
  }

  test("matches the naive theta join exactly, chunk width independent") {
    val naive = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet
    for (w <- Seq(7L, 64L, 1024L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", w)
        .select(col("pid"), col("iid"))
        .as[(Long, Long)].collect().toSet
      assert(got == naive, s"chunkWidth=$w: ${got.size} vs ${naive.size}")
    }
  }

  test("equi keys restrict matches and the plan avoids nested loops") {
    val kp = points.withColumn("g", col("pid") % 4)
    val ki = intervals.withColumn("ig", col("iid") % 4)
    val joined = RangeJoin.pointInInterval(kp, ki, "p", "s", "e",
      chunkWidth = 64, keys = Seq(("g", "ig")))
    val naive = kp.join(ki, col("g") === col("ig") &&
        col("p") >= col("s") && col("p") <= col("e"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(joined.select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet == naive)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must be an equi-join on (key, chunk):\n$plan")
  }
}
