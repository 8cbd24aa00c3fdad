package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CountMin

/** Streaming Count-Min: exact mergeability makes the sketch a natural
  * streaming accumulator — per micro-batch, sketch the batch and merge
  * into the running sketch; the result must be CELL-IDENTICAL to the
  * batch sketch of everything seen, at any firehose split (redelivering
  * an empty batch is a no-op). This is the pre-aggregation posture at
  * 100 TB: the stream keeps O(depth*width) state, never a token table. */
class StreamingCountMinSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val cfg = CountMin.Config(depth = 4, width = 128, seed = 13L)
  private val stream: Seq[String] = {
    val rng = new scala.util.Random(8)
    (0 until 5000).map(_ => s"tok${rng.nextInt(300)}")
  }

  private def cells(df: DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("running merged sketch equals the batch sketch of the union, at any split") {
    val expected = cells(CountMin.sketch(stream.toDF("term"), "term", cfg))
    for (split <- Seq(1, 2500, 4999)) {
      val mem = MemoryStream[String]
      var acc: Option[DataFrame] = None
      val q = mem.toDF().toDF("term").writeStream
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          // sketch the micro-batch, fold into the running sketch; the
          // collect is bounded by depth*width cells by construction
          val part = CountMin.sketch(b, "term", cfg).localCheckpoint(true)
          acc = Some(acc.fold(part)(a => CountMin.merge(a, part).localCheckpoint(true)))
          ()
        }
        .start()
      try {
        val (a, b) = stream.splitAt(split)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        assert(acc.isDefined && cells(acc.get) == expected, s"split=$split")
      } finally q.stop()
    }
  }
}
