package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def fullTop(df: org.apache.spark.sql.DataFrame, n: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
      .filter(col("rank") <= n).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("sketch path equals full aggregation on a skewed corpus (tiny capacity)") {
    // zipf-ish: token t_i appears ~ N/i times; capacity 8 forces constant
    // Misra-Gries decrement churn, yet the head must survive exactly
    val docs = (1 to 40).flatMap { i =>
      Seq.fill(400 / i)(s"t$i")
    }.grouped(17).zipWithIndex
      .map { case (g, id) => (id.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
      .repartition(4)
    val got = HeavyHitters.topTokens(docs, "text", topN = 5, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == fullTop(docs, 5).toSeq)
  }

  test("flat distribution falls back to full aggregation and stays exact") {
    // every token appears exactly once — the sketch floor can never be
    // cleared, so the fallback must produce the lexicographic head
    val docs = (1 to 100).map(i => (i.toLong, s"u$i v$i"))
      .toDF("doc_id", "text").repartition(3)
    val got = HeavyHitters.topTokens(docs, "text", topN = 4, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("u1", 1L), ("u10", 1L), ("u100", 1L), ("u11", 1L)))
  }

  test("candidate set is a superset of every token above the global floor") {
    val docs = (1 to 30).flatMap(i => Seq.fill(100 / i)(s"w$i"))
      .grouped(11).zipWithIndex
      .map { case (g, id) => (id.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text").repartition(5)
    val capacity = 6
    val cands = HeavyHitters.candidateTokens(docs, "text", capacity)
      .collect().map(_.getString(0)).toSet
    val n = docs.select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    val floor = n / (capacity + 1)
    val mustHave = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().filter(col("count") > floor)
      .collect().map(_.getString(0)).toSet
    assert(mustHave.subsetOf(cands))
  }

  test("null texts are ignored, not NPEs") {
    val docs = Seq((1L, Some("a a b")), (2L, None), (3L, Some("a c")))
      .toDF("doc_id", "text")
    val got = HeavyHitters.topTokens(docs, "text", topN = 2, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 3L), ("b", 1L)))
  }
}
