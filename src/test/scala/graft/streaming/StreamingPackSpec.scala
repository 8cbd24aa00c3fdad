package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Streaming sequence packing == batch packing, at any firehose split:
  * the carry offset plus per-sequence partial folds reproduce the
  * catalog's s_pack_sequences output row-for-row, including sequences
  * that straddle micro-batch boundaries. */
class StreamingPackSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val L = 256

  private lazy val docs: Seq[(Long, Long)] = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .filter(col("text").isNotNull)
    .select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    .orderBy(col("doc_id"))
    .as[(Long, Long)].collect().toSeq

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] = df
    .select("seq_id", "n_docs", "n_tokens", "first_doc", "last_doc")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    .sortBy(_._1).toSeq

  private lazy val batchExpected =
    rows(SparkEntry.queries("s_pack_sequences")(spark, sfDir))

  test("folded streaming packing equals the batch catalog row at any split") {
    for (split <- Seq(1, docs.size / 3, docs.size - 1)) {
      val mem = MemoryStream[(Long, Long)]
      var acc: Option[DataFrame] = None
      var carry = 0L
      val q = mem.toDF().toDF("doc_id", "n_tok").writeStream
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val (part, c2) = StreamingPack.packBatch(b, L, carry)
          carry = c2
          val pinned = part.localCheckpoint(true)
          acc = Some(acc.fold(pinned)(a =>
            StreamingPack.merge(a, pinned).localCheckpoint(true)))
          ()
        }
        .start()
      try {
        val (a, b) = docs.splitAt(split)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        assert(acc.isDefined && rows(acc.get) == batchExpected, s"split=$split")
      } finally q.stop()
    }
  }

  test("a sequence straddling the batch boundary merges its partials exactly") {
    // split mid-corpus: the boundary sequence is guaranteed open unless
    // the cut lands exactly on a multiple of L — verify the folded row
    // for that seq_id matches batch truth (covered above) AND that the
    // two partials genuinely both existed (n_docs on each side >= 1)
    val split = docs.size / 2
    val (a, b) = docs.splitAt(split)
    val (partA, carryA) = StreamingPack.packBatch(a.toDF("doc_id", "n_tok"), L, 0L)
    val boundarySeq = carryA / L // the open sequence id at the cut
    if (carryA % L != 0) {
      val (partB, _) = StreamingPack.packBatch(b.toDF("doc_id", "n_tok"), L, carryA)
      val inA = partA.filter(col("seq_id") === boundarySeq).count()
      val inB = partB.filter(col("seq_id") === boundarySeq).count()
      assert(inA == 1 && inB == 1, s"straddle partials: $inA/$inB")
      val merged = rows(StreamingPack.merge(partA, partB))
      assert(merged == batchExpected)
    }
  }
}
