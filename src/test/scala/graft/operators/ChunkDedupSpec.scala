package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chunk-level dedup invariants: chunk boundary math, cross-document
  * duplicate detection, and keep-first survivor accounting. */
class ChunkDedupSpec extends SparkSpec {

  import spark.implicits._

  private def textsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("chunksOf splits on exact w-word boundaries, shorter tail survives") {
    val df = textsDF(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")), // exactly 2 chunks
      (2L, (1 to 45).map(i => s"w$i").mkString(" ")), // 2 full + 5-word tail
      (3L, "only three words x"),                     // single short chunk
      (4L, "a")                                       // one-word doc
    )
    val chunks = df.select(col("doc_id"), ChunkDedup.chunksOf(col("text"), 20).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    assert(chunks(1L).length == 2)
    assert(chunks(1L)(0) == (1 to 20).map(i => s"w$i").mkString(" "))
    assert(chunks(1L)(1) == (21 to 40).map(i => s"w$i").mkString(" "))
    assert(chunks(2L).length == 3)
    assert(chunks(2L)(2) == (41 to 45).map(i => s"w$i").mkString(" "))
    assert(chunks(3L) == Seq("only three words x"))
    assert(chunks(4L) == Seq("a"))
  }

  test("chunk concatenation reconstructs the original text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rebuilt = docs
      .select(col("doc_id"), col("text"),
        concat_ws(" ", ChunkDedup.chunksOf(col("text"), 20)).as("rebuilt"))
      .filter(col("text") =!= col("rebuilt"))
    assert(rebuilt.count() == 0)
  }

  test("dupChunks finds cross-document repeats only") {
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val df = textsDF(
      (1L, boiler + " " + (1 to 20).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 20).map(i => s"y$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))
    )
    val dups = ChunkDedup.dupChunks(df, w = 20).collect()
    assert(dups.length == 1)
    val r = dups.head
    assert(r.getAs[Long]("n_docs") == 2)
    assert(r.getAs[Long]("n_occurrences") == 2)
    assert(r.getAs[Long]("first_doc") == 1L)
  }

  test("dedupStats keeps first occurrence in (doc_id, chunk_no) order") {
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val uniq1 = (1 to 20).map(i => s"x$i").mkString(" ")
    val df = textsDF(
      // doc 1: unique chunk then boiler — boiler's first occurrence is
      // (1, 1), so doc 2 and doc 3 copies drop
      (1L, uniq1 + " " + boiler),
      (2L, boiler + " " + (1 to 20).map(i => s"y$i").mkString(" ")),
      // doc 3 repeats boiler twice in-doc: both drop
      (3L, boiler + " " + boiler)
    )
    val stats = ChunkDedup.dedupStats(df, w = 20).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_dropped"), r.getAs[Long]("chars_kept")))).toMap

    assert(stats(1L) == ((2L, 0L, (uniq1.length + boiler.length).toLong)))
    assert(stats(2L)._1 == 2L)
    assert(stats(2L)._2 == 1L) // the boiler copy dropped
    assert(stats(3L) == ((2L, 2L, 0L)))
  }

  test("null-text docs emit no chunks (matching the oracle's unnest)") {
    // without the filter, size(null) = -1 walks sequence(0, -1)
    // backwards and fabricates two phantom "" chunks per null doc
    val df = Seq((1L, Option("one real doc here")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val occ = ChunkDedup.occurrences(df, 20)
    assert(occ.filter(col("doc_id") === 2L).count() == 0)
    assert(occ.count() == 1)
    assert(ChunkDedup.dedupStats(df, 20).count() == 1)
  }

  test("total kept chars equals distinct chunk char mass") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val stats = ChunkDedup.dedupStats(docs, w = 20)
    val kept = stats.agg(sum("chars_kept")).as[Long].head()
    val distinctMass = ChunkDedup.occurrences(docs, 20)
      .select(col("chunk")).distinct()
      .agg(sum(length(col("chunk")))).as[Long].head()
    assert(kept == distinctMass)
  }
}
