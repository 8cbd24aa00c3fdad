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

  private def strViaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(GroupTopK.topKStr(k)(col("v"), col("term")).as("top"))
      .select(col("g"), posexplode(arrays_zip(col("top.vs"), col("top.terms"))))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.vs").as("v"), col("col.terms").as("term"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSet

  private def strViaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("term"))))
      .filter(col("rank") <= k)
      .select("g", "rank", "v", "term")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSet
  }

  test("string-payload top-k equals window top-k; ties break by term ASC") {
    val rng = new scala.util.Random(11)
    val terms = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val df = (1 to 2000).map { _ =>
      (s"g${rng.nextInt(4)}", rng.nextInt(30).toLong, terms(rng.nextInt(terms.length)))
    }.toDF("g", "v", "term").repartition(9)
    assert(strViaAgg(df, 3) == strViaWindow(df, 3))
    // explicit tie case: equal v, order by term ascending
    val tied = Seq(("a", 5L, "zz"), ("a", 5L, "aa"), ("a", 5L, "mm"), ("a", 1L, "qq"))
      .toDF("g", "v", "term").repartition(3)
    assert(strViaAgg(tied, 2).toSeq.sortBy(_._2) ==
      Seq(("a", 1, 5L, "aa"), ("a", 2, 5L, "mm")))
  }

  test("t_tfidf_topk matches the window/SQL formulation on the real corpus") {
    val got = graft.SparkEntry.queries("t_tfidf_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // independent reference: same scoring, ranked by a window instead of
    // the k-bounded aggregate
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val ref = tf.join(dfreq, "term")
      // integer `div`, exactly as the query and oracle compute the idf
      // weight: double division + cast("long") rounds differently when
      // the true quotient sits at an integer boundary
      .withColumn("score", col("tf") * expr(s"($n * 1000000L) div df"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "score")
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.length == ref.length && got.sameElements(ref))
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
