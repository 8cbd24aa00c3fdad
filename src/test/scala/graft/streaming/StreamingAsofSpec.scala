package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsofJoin

/** Stream-static as-of enrichment: the broadcast as-of strategy is the
  * streaming-capable one (the union+window strategy needs a global sort
  * over both sides — not expressible on an unbounded stream), and a
  * micro-batched fact stream enriched against a static tick dimension
  * must equal the batch join on the union of all batches, however the
  * firehose is split. This is the canonical streaming shape: events
  * arriving forever, each stamped with the latest config/price/quote
  * at or before its own time. */
class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // fact rows (lid, k, t) across 4 keys; ticks (rid, rk, rt, cfg) static
  private val facts: Seq[(Long, Long, Long)] =
    (0 until 60).map { i =>
      val rng = i * 2654435761L
      (i.toLong, ((rng >>> 3) % 4 + 4) % 4, ((rng >>> 7) % 1000 + 1000) % 1000)
    }
  private val ticks: Seq[(Long, Long, Long, String)] =
    (0 until 40).map { i =>
      val rng = i * 1442695040888963407L
      (100L + i, ((rng >>> 5) % 4 + 4) % 4, ((rng >>> 9) % 1000 + 1000) % 1000, s"cfg$i")
    }.distinctBy(r => (r._2, r._3))

  private def enriched(l: org.apache.spark.sql.DataFrame) =
    AsofJoin.backwardBroadcast(
      l.toDF("lid", "k", "t"),
      ticks.toDF("rid", "rk", "rt", "cfg"),
      "k", "rk", "t", "rt")
      .select(col("lid"), col("rid"), col("cfg"))

  private lazy val batchExpected: Set[(Long, Option[Long])] =
    enriched(facts.toDF()).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet

  test("the batch broadcast as-of matches the naive reference on this fixture") {
    facts.foreach { case (lid, k, t) =>
      val expect = ticks.filter(x => x._2 == k && x._3 <= t)
        .sortBy(_._3).lastOption.map(_._1)
      assert(batchExpected.contains(lid -> expect), s"lid=$lid k=$k t=$t")
    }
  }

  for (split <- Seq(1, 20, 59)) {
    test(s"streaming enrichment equals batch at split=$split") {
      val mem = MemoryStream[(Long, Long, Long)]
      val name = s"sasof_out_$split"
      val q = enriched(mem.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        val (a, b) = facts.splitAt(split)
        mem.addData(a)
        q.processAllAvailable()
        mem.addData(b)
        q.processAllAvailable()
        val got = spark.table(name).collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
        assert(got == batchExpected)
      } finally q.stop()
    }
  }
}
