package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(GroupTopK.topK(k)(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(arrays_zip(col("top.vs"), col("top.ids"))))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.vs").as("v"), col("col.ids").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= k)
      .select("g", "rank", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("agg top-k equals window top-k across many partitions (merge path)") {
    val rng = new scala.util.Random(7)
    val df = (1L to 3000L).map { id =>
      (s"g${rng.nextInt(5)}", rng.nextInt(100).toLong, id)
    }.toDF("g", "v", "id").repartition(13)
    assert(viaAgg(df, 4) == viaWindow(df, 4))
  }

  test("ties break deterministically by smaller id") {
    val df = Seq(("a", 10L, 5L), ("a", 10L, 2L), ("a", 10L, 9L), ("a", 3L, 1L))
      .toDF("g", "v", "id").repartition(3)
    val got = viaAgg(df, 2).toSeq.sortBy(_._2)
    assert(got == Seq(("a", 1, 10L, 2L), ("a", 2, 10L, 5L)))
  }

  test("k larger than the group emits the whole group, ordered") {
    val df = Seq(("a", 1L, 1L), ("a", 7L, 2L)).toDF("g", "v", "id")
    assert(viaAgg(df, 10) == Set(("a", 1, 7L, 2L), ("a", 2, 1L, 1L)))
  }

  test("partial aggregation appears in the plan (no window sort)") {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type").as("g"),
        floor(col("value") * 100).cast("long").as("v"), col("event_id").as("id"))
    val plan = df.groupBy(col("g"))
      .agg(GroupTopK.topK(3)(col("v"), col("id")).as("top"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "must not be a window plan")
    // ObjectHashAggregate/SortAggregate with partial_ merge shape
    assert(plan.contains("Aggregate"), plan)
  }
}
