package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def batchTopK(rows: Seq[(String, Long, Long)], k: Int) = {
    import org.apache.spark.sql.expressions.Window
    rows.toDF("g", "v", "id")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("g", "rank", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def runStream(batches: Seq[Seq[(String, Long, Long)]], k: Int) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val out = StreamingTopK.leaderboard(mem.toDF().toDF("g", "v", "id"), k)
    val q = out.writeStream.format("memory").queryName("lb_test")
      .outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // Update sink: the LAST emitted row per (g, rank) is the final state
      spark.table("lb_test")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy(col("g"), col("rank"))
        .agg(max_by(struct(col("v"), col("id")), col("seq")).as("last"))
        .select(col("g"), col("rank"), col("last.v"), col("last.id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS lb_test")
    }
  }

  private val rows: Seq[(String, Long, Long)] = {
    val rng = new scala.util.Random(11)
    (1L to 600L).map(i => (s"g${rng.nextInt(4)}", rng.nextInt(50).toLong, i))
  }

  test("streamed leaderboard equals the batch top-k over the union") {
    val got = runStream(rows.grouped(150).toSeq, k = 3)
    assert(got == batchTopK(rows, 3))
  }

  test("final state is invariant to how the stream is batched") {
    val a = runStream(Seq(rows), k = 5)
    val b = runStream(rows.grouped(37).toSeq, k = 5)
    assert(a == b && a == batchTopK(rows, 5))
  }

  test("a later batch displaces earlier leaders") {
    val b1 = Seq(("g", 5L, 1L), ("g", 4L, 2L))
    val b2 = Seq(("g", 9L, 3L))
    val got = runStream(Seq(b1, b2), k = 2)
    assert(got == Set(("g", 1L, 9L, 3L), ("g", 2L, 5L, 1L)))
  }
}
