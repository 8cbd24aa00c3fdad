package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

import java.sql.Timestamp

/** Watermarked stream-stream interval join: equals the batch join on the
  * union of all micro-batches, and is invariant to how the firehose is
  * split into batches. */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  // impressions (imp_id, imp_user, imp_ts); clicks (click_id, click_user, click_ts)
  private val imps: Seq[(Long, Long, Timestamp)] = Seq(
    (1L, 10L, ts(0)), (2L, 11L, ts(1)), (3L, 10L, ts(5)), (4L, 12L, ts(6)),
    (5L, 11L, ts(20)))
  private val clicks: Seq[(Long, Long, Timestamp)] = Seq(
    (101L, 10L, ts(2)),  // matches imp 1 (within 10 min) only
    (102L, 11L, ts(12)), // outside imp 2's window (11 min later) -> no match
    (103L, 10L, ts(7)),  // matches imps 1 AND 3
    (104L, 12L, ts(6)),  // same-instant match with imp 4
    (105L, 13L, ts(3)),  // user never impressed -> no match
    (106L, 11L, ts(25))) // matches imp 5

  private def joined(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame) =
    StreamingJoins.intervalJoin(
      l.toDF("imp_id", "imp_user", "imp_ts"),
      "imp_user", "imp_ts",
      r.toDF("click_id", "click_user", "click_ts"),
      "click_user", "click_ts",
      maxDelay = "10 minutes", watermark = "30 minutes")
      .select("imp_id", "click_id")

  private lazy val batchExpected: Set[(Long, Long)] =
    joined(imps.toDF(), clicks.toDF())
      .as[(Long, Long)].collect().toSet

  test("the batch interval join sees exactly the in-window matches") {
    assert(batchExpected ==
      Set((1L, 101L), (1L, 103L), (3L, 103L), (4L, 104L), (5L, 106L)))
  }

  private def runStreaming(split: Int): Set[(Long, Long)] = {
    val memI = MemoryStream[(Long, Long, Timestamp)]
    val memC = MemoryStream[(Long, Long, Timestamp)]
    val name = s"ssj_out_$split"
    val q = joined(memI.toDF(), memC.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val (i1, i2) = imps.splitAt(split)
      val (c1, c2) = clicks.splitAt(split)
      memI.addData(i1); memC.addData(c1)
      q.processAllAvailable()
      memI.addData(i2); memC.addData(c2)
      q.processAllAvailable()
      spark.table(name).as[(Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("streaming equals batch on the union, for any batch split") {
    assert(runStreaming(2) == batchExpected)
    assert(runStreaming(4) == batchExpected)
  }

  test("state stays bounded: the plan carries watermarks on both sides") {
    val memI = MemoryStream[(Long, Long, Timestamp)]
    val memC = MemoryStream[(Long, Long, Timestamp)]
    val q = joined(memI.toDF(), memC.toDF())
      .writeStream.format("memory").queryName("ssj_wm").outputMode("append").start()
    try {
      memI.addData(imps); memC.addData(clicks)
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty, "join must be stateful")
      // watermark present => state eviction is active (bounded buffers)
      assert(Option(progress.eventTime.get("watermark")).nonEmpty,
        s"no watermark in progress: ${progress.prettyJson}")
    } finally q.stop()
  }
}
