package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** s_sample_weighted beyond the hash oracle: the sequential-Poisson draw
  * actually weights inclusion by size, and the bounded-aggregate path
  * equals the window formulation row-for-row. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("inclusion probability grows with weight across salts") {
    // 200 docs, weight = doc id + 1 (1..200); k = 20 per draw; across
    // 60 salts the top-weight quartile must be drawn far more often
    // than the bottom quartile (expected inclusion ~ k*w/sum(w))
    import graft.functions.OrderBitsFunctions.doubleOrderBits
    import graft.operators.{GroupTopK, Kmv}
    // all 60 salted draws in ONE job: salts become groups (a 60-salt
    // loop of single-group collects paid 60x scheduling for nothing)
    val counts = new Array[Int](201)
    (1L to 200L).map(i => (i, i)).toDF("doc_id", "w")
      .crossJoin(spark.range(60).select(col("id").as("salt")))
      .select(col("salt"), col("doc_id"),
        (Kmv.hash48(concat(lit("s"), col("salt"), lit(":"),
          col("doc_id").cast("string")))
          .cast("double") / col("w").cast("double")).as("key"))
      .groupBy(col("salt"))
      .agg(GroupTopK.topK(20)(
        bitwise_not(doubleOrderBits(col("key"))), col("doc_id")).as("t"))
      .select(explode(col("t.ids")).as("doc_id"))
      .collect().foreach(r => counts(r.getLong(0).toInt) += 1)
    val bottom = (1 to 50).map(counts).sum
    val top = (151 to 200).map(counts).sum
    assert(top > 3 * bottom, s"weighting not engaged: top=$top bottom=$bottom")
  }

  test("bounded-aggregate ranking equals the window formulation exactly") {
    val viaAgg = SparkEntry.queries("s_sample_weighted")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    import graft.operators.Kmv
    import org.apache.spark.sql.expressions.Window
    val viaWindow = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("n_chars") >= 1)
      .select(col("lang"), col("doc_id"),
        (Kmv.hash48(concat(lit("wsp:"), col("doc_id").cast("string")))
          .cast("double") / col("n_chars").cast("double")).as("key"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("key"), col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 8)
      .select(col("lang"), col("rank"), col("doc_id"))
      .orderBy(col("lang"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaAgg == viaWindow)
  }
}
