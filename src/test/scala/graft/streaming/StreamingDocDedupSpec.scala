package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming MinHash dedup vs an exact driver-side greedy reference:
  * same shingles, same Jaccard-0.8 test, same arrival order — the
  * streaming pipeline (banded candidates + durable signature state) must
  * reproduce the reference exactly, across batch splits and restarts. */
class StreamingDocDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Array[(Long, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

  // mirrors transform(sequence(1, greatest(len-7, 1)), i -> substring(text, i, 8))
  private def shingles(text: String): Set[String] =
    if (text.length < 8) Set(text)
    else (0 to text.length - 8).map(i => text.substring(i, i + 8)).toSet

  /** Exact greedy arrival-order dedup: keep a doc iff Jaccard < 0.8
    * against every already-kept doc. O(n^2) — reference only. */
  private def greedyReference(docs: Seq[(Long, String)]): Set[Long] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[String])]
    docs.foreach { case (id, text) =>
      val sh = shingles(text)
      val dup = kept.exists { case (_, ksh) =>
        val ni = (sh & ksh).size
        ni * 9 >= (sh.size + ksh.size) * 4
      }
      if (!dup) kept += ((id, sh))
    }
    kept.map(_._1).toSet
  }

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft_sdd_").toString

  test("three-batch streaming dedup equals the exact greedy reference") {
    val docs = corpus
    val expect = greedyReference(docs.toSeq)
    assert(expect.size < docs.length, "corpus should contain near-dups")

    val path = freshPath()
    val batches = docs.grouped(math.ceil(docs.length / 3.0).toInt).toSeq
    val results = batches.map { b =>
      StreamingDocDedup.processBatch(spark, b.toSeq.toDF("doc_id", "text"), path)
    }
    assert(results.map(r => r.kept + r.dropped).sum == docs.length)
    val got = StreamingDocDedup.keptIds(spark, path)
      .as[Long].collect().toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("batch split points do not change the result, and state survives restart") {
    val docs = corpus.take(200)
    val expect = greedyReference(docs.toSeq)

    // one big batch
    val p1 = freshPath()
    StreamingDocDedup.processBatch(spark, docs.toSeq.toDF("doc_id", "text"), p1)
    // five batches with a "restart" (nothing held between calls but the path)
    val p2 = freshPath()
    docs.grouped(40).foreach { b =>
      StreamingDocDedup.processBatch(spark, b.toSeq.toDF("doc_id", "text"), p2)
    }
    val k1 = StreamingDocDedup.keptIds(spark, p1).as[Long].collect().toSet
    val k2 = StreamingDocDedup.keptIds(spark, p2).as[Long].collect().toSet
    assert(k1 == expect && k2 == expect)
  }

  test("a redelivered micro-batch is idempotent — state and kept set unchanged") {
    val docs = corpus.take(120)
    val expect = greedyReference(docs.toSeq)
    val path = freshPath()
    val batches = docs.grouped(60).toSeq
    batches.foreach { b =>
      StreamingDocDedup.processBatch(spark, b.toSeq.toDF("doc_id", "text"), path)
    }
    val before = StreamingDocDedup.keptIds(spark, path).as[Long].collect().toSet
    assert(before == expect)
    // redeliver BOTH batches (foreachBatch retry semantics): the batch's
    // own prior state output must not match against itself
    batches.foreach { b =>
      val r = StreamingDocDedup.processBatch(spark, b.toSeq.toDF("doc_id", "text"), path)
      assert(r.kept > 0, "redelivery must re-produce survivors, not drop them")
    }
    val after = StreamingDocDedup.keptIds(spark, path).as[Long].collect().toSet
    assert(after == expect, s"redelivery changed the kept set: ${after.size} vs ${expect.size}")
  }

  test("attach() drives the same pipeline through a real streaming query") {
    val docs = corpus.take(150)
    val expect = greedyReference(docs.toSeq)
    val path = freshPath()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDocDedup.attach(mem.toDF().toDF("doc_id", "text"), path)
    try {
      docs.grouped(50).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val got = StreamingDocDedup.keptIds(spark, path).as[Long].collect().toSet
    assert(got == expect)
  }
}
