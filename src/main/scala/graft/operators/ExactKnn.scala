package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Exact (brute-force) k-nearest-neighbor search — the Spark-native
  * `LinearDb` (reference: src/linear_db.rs:17-35): evaluate the distance of
  * every query against every stored vector, keep the k best.
  *
  * This is both a first-class operator (the only *exact* kNN) and the
  * recall oracle for the approximate paths (HNSW / LSH), exactly the role
  * the reference's linear baseline plays in benches/hnsw.rs:77-110.
  *
  * Scale design (100 TB posture):
  *   - The query set is the small side — always broadcast it; the big
  *     vector table is scanned once, partition-parallel, no shuffle of the
  *     cross product.
  *   - [[search]] reduces each scan partition to at most k rows per query
  *     via a bounded-heap partial aggregation (map-side combine), so the
  *     shuffle volume is O(#queries * k * #partitions), independent of the
  *     table size. A window over the raw cross product would shuffle
  *     |queries| * |vectors| rows — wrong at scale; kept as
  *     [[searchWindowed]] for plan comparison and small inputs.
  */
object ExactKnn {

  /** One scored candidate. score semantics depend on `ascending`:
    * distance (smaller = better) or similarity (larger = better). */
  case class Scored(id: Long, score: Double)

  /** Bounded top-k heap aggregator: partial aggregation keeps at most k
    * candidates per group on the map side — the Spark image of the
    * reference's FurthestQueue beam (src/data_structures/queue.rs:12-65).
    * `best` = smallest score when ascending (distances), largest otherwise.
    */
  class TopKAggregator(k: Int, ascending: Boolean)
      extends Aggregator[Scored, scala.collection.mutable.ArrayBuffer[Scored], Seq[Scored]] {
    type Buf = scala.collection.mutable.ArrayBuffer[Scored]
    private def worse(a: Scored, b: Scored): Boolean =
      if (ascending) a.score > b.score || (a.score == b.score && a.id > b.id)
      else a.score < b.score || (a.score == b.score && a.id > b.id)

    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(buf: Buf, in: Scored): Buf = insert(buf, in)
    override def merge(a: Buf, b: Buf): Buf = { b.foreach(insert(a, _)); a }
    private def insert(buf: Buf, in: Scored): Buf = {
      if (buf.size < k) { buf += in; if (buf.size == k) sortBuf(buf) }
      else if (worse(buf(k - 1), in)) { buf(k - 1) = in; bubbleUp(buf) }
      buf
    }
    private def sortBuf(buf: Buf): Unit = {
      val sorted = buf.sortWith((x, y) => worse(y, x))
      var i = 0; while (i < buf.size) { buf(i) = sorted(i); i += 1 }
    }
    private def bubbleUp(buf: Buf): Unit = {
      var i = buf.size - 1
      while (i > 0 && worse(buf(i - 1), buf(i))) {
        val t = buf(i - 1); buf(i - 1) = buf(i); buf(i) = t; i -= 1
      }
    }
    override def finish(buf: Buf): Seq[Scored] = {
      if (buf.size < k) sortBuf(buf)
      buf.toSeq
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Distance/similarity column factory by metric name. */
  def scoreCol(metric: String)(q: Column, v: Column): Column = metric match {
    case "cosine"  => cosineSim(q, v)  // similarity: higher is better
    case "l2"      => l2Sq(q, v)       // distance: lower is better
    case "dot"     => dotF32(q, v)     // similarity
    case "hamming" => hammingU64(q, v).cast("double") // distance, u64 codes
    case other     => throw new IllegalArgumentException(s"unknown metric: $other")
  }
  def metricAscending(metric: String): Boolean = metric match {
    case "l2" | "hamming" => true
    case _                => false
  }

  /** Scale path: broadcast queries x scan vectors -> map-side bounded-heap
    * top-k -> tiny shuffle -> final merge. Output: (qid, id, score, rank).
    *
    * @param queries  (qid: long, qvec) — small, broadcast
    * @param vectors  (id: long, vec) — arbitrarily large
    */
  def search(queries: DataFrame, vectors: DataFrame, k: Int,
             metric: String = "cosine",
             queryVecCol: String = "qvec", vecCol: String = "vec"): DataFrame = {
    val asc = metricAscending(metric)
    val pairs = vectors
      .join(broadcast(queries))
      .select(col("qid"), col("id"),
        scoreCol(metric)(col(queryVecCol), col(vecCol)).as("score"))
    val topk = udaf(new TopKAggregator(k, asc))
    pairs
      .groupBy(col("qid"))
      .agg(topk(col("id"), col("score")).as("nn"))
      .select(col("qid"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("qid"), col("n.id").as("id"), col("n.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Small-data / oracle-shaped variant: full cross product + window.
    * Simple and exactly mirrors the SQL oracle; shuffles the whole
    * cartesian product, so only for modest |queries| x |vectors|. */
  def searchWindowed(queries: DataFrame, vectors: DataFrame, k: Int,
                     metric: String = "cosine",
                     queryVecCol: String = "qvec", vecCol: String = "vec"): DataFrame = {
    val asc = metricAscending(metric)
    val score = scoreCol(metric)(col(queryVecCol), col(vecCol))
    val ordered = if (asc) Seq(col("score").asc, col("id").asc)
                  else Seq(col("score").desc, col("id").asc)
    vectors
      .join(broadcast(queries))
      .select(col("qid"), col("id"), score.as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(ordered: _*)))
      .filter(col("rank") <= k)
  }
}
