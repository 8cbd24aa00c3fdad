package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Kmv

/** Streaming KMV: because the union of two sketches is BIT-IDENTICAL to
  * the sketch of the unioned inputs (KmvSpec), the sketch is an exact
  * streaming accumulator — per micro-batch, sketch the batch per group
  * and fold into the running per-group sketch via a full-outer join +
  * unionK. The folded state must equal the batch sketch of everything
  * seen at ANY firehose split, and the state is O(groups x k) longs
  * forever — the 100 TB posture for streaming distinct counts. */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val k = 64
  private val stream: Seq[(String, String)] = {
    val rng = new scala.util.Random(5)
    (0 until 4000).map { _ =>
      val g = s"g${rng.nextInt(3)}"
      (g, s"$g-u${rng.nextInt(800)}") // per-group distinct universe ~800 > k
    }
  }

  private def sketchBatch(df: DataFrame): DataFrame =
    Kmv.sketch(df, col("key"), Seq(col("g")), k)

  private def fold(acc: DataFrame, part: DataFrame): DataFrame =
    acc.select(col("g"), col("kmv").as("kmv_a"))
      .join(part.select(col("g"), col("kmv").as("kmv_b")), Seq("g"), "full_outer")
      .select(col("g"), Kmv.unionK(
        coalesce(col("kmv_a"), array()), coalesce(col("kmv_b"), array()), k).as("kmv"))

  private def state(df: DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("folded per-batch sketches equal the batch sketch of the union, at any split") {
    val expected = state(sketchBatch(stream.toDF("g", "key")))
    for (split <- Seq(1, 2000, 3999)) {
      val mem = MemoryStream[(String, String)]
      var acc: Option[DataFrame] = None
      val q = mem.toDF().toDF("g", "key").writeStream
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val part = sketchBatch(b).localCheckpoint(true)
          acc = Some(acc.fold(part)(a => fold(a, part).localCheckpoint(true)))
          ()
        }
        .start()
      try {
        val (a, b) = stream.splitAt(split)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        assert(acc.isDefined && state(acc.get) == expected, s"split=$split")
      } finally q.stop()
    }
  }

  test("estimates from the folded state match the batch estimates exactly") {
    val mem = MemoryStream[(String, String)]
    var acc: Option[DataFrame] = None
    val q = mem.toDF().toDF("g", "key").writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val part = sketchBatch(b).localCheckpoint(true)
        acc = Some(acc.fold(part)(a => fold(a, part).localCheckpoint(true)))
        ()
      }
      .start()
    try {
      stream.grouped(1000).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
      def ests(df: DataFrame): Map[String, Long] = df
        .select(col("g"), Kmv.estimate(col("kmv"), k).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val streamed = ests(acc.get)
      val batch = ests(sketchBatch(stream.toDF("g", "key")))
      assert(streamed == batch)
      // and the estimate regime is actually engaged (universe > k)
      assert(streamed.values.forall(_ > k))
    } finally q.stop()
  }
}
