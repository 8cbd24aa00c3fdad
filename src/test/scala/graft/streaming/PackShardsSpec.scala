package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stateful streaming shard packer must agree exactly with the batch
  * s_pack_shards window formulation when docs arrive in order — state
  * (one running sum per (lang, source)) carries across micro-batches. */
class PackShardsSpec extends SparkSpec {
  import spark.implicits._

  private val Capacity = 2000L

  test("streaming shard assignment across micro-batches equals the batch window") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1)

    val mem = MemoryStream[(Long, String, String, Long)]
    val out = StreamingIngest.packShards(
      mem.toDF().toDF("doc_id", "lang", "source", "n_tok"), Capacity)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("packed").start()
    try {
      docs.grouped(120).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("packed")
      .select(col("doc_id"), col("shard_id"))
      .as[(Long, Long)].collect().toMap

    // batch reference: the s_pack_shards window (cum-before div capacity)
    val expect = docs.groupBy(d => (d._2, d._3)).values.flatMap { group =>
      var cum = 0L
      group.sortBy(_._1).map { case (id, _, _, nTok) =>
        val shard = cum / Capacity
        cum += nTok
        id -> shard
      }
    }.toMap

    assert(got.size == docs.length)
    assert(got == expect)
  }
}
