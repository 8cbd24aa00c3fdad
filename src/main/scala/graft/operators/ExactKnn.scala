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

  /** Aggregation buffer: parallel primitive arrays (best candidate first
    * once full), product-encoded — partial-aggregation ser/deser stays on
    * flat Tungsten arrays instead of Kryo-serialized object graphs (the
    * dominant cost of the previous ArrayBuffer buffer). */
  case class TopKBuf(ids: Array[Long], scores: Array[Double], n: Int)

  /** Bounded top-k heap aggregator: partial aggregation keeps at most k
    * candidates per group on the map side — the Spark image of the
    * reference's FurthestQueue beam (src/data_structures/queue.rs:12-65).
    * `best` = smallest score when ascending (distances), largest otherwise.
    */
  class TopKAggregator(k: Int, ascending: Boolean)
      extends Aggregator[Scored, TopKBuf, Seq[Scored]] {

    // true when candidate (idA, sA) ranks worse than (idB, sB).
    // NaN scores (a corrupt vector under l2/dot) rank worse than
    // everything regardless of direction — otherwise a NaN row could
    // occupy a slot that blocks all later candidates.
    private def worse(sA: Double, idA: Long, sB: Double, idB: Long): Boolean = {
      val aN = java.lang.Double.isNaN(sA)
      val bN = java.lang.Double.isNaN(sB)
      if (aN || bN) aN && (!bN || idA > idB)
      else if (ascending) sA > sB || (sA == sB && idA > idB)
      else sA < sB || (sA == sB && idA > idB)
    }

    override def zero: TopKBuf = TopKBuf(new Array[Long](k), new Array[Double](k), 0)

    override def reduce(buf: TopKBuf, in: Scored): TopKBuf =
      insert(buf, in.id, in.score)

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var out = a
      var i = 0
      while (i < b.n) { out = insert(out, b.ids(i), b.scores(i)); i += 1 }
      out
    }

    private def insert(buf: TopKBuf, id: Long, score: Double): TopKBuf = {
      val ids = buf.ids; val scores = buf.scores
      if (buf.n < k) {
        ids(buf.n) = id; scores(buf.n) = score
        val b2 = TopKBuf(ids, scores, buf.n + 1)
        if (b2.n == k) sortBuf(b2)
        b2
      } else if (worse(scores(k - 1), ids(k - 1), score, id)) {
        ids(k - 1) = id; scores(k - 1) = score
        bubbleUp(buf)
        buf
      } else buf
    }

    // sort best-first (ascending "worseness")
    private def sortBuf(buf: TopKBuf): Unit = {
      val idx = (0 until buf.n).sortWith((i, j) =>
        worse(buf.scores(j), buf.ids(j), buf.scores(i), buf.ids(i)))
      val ids = idx.map(buf.ids).toArray
      val scores = idx.map(buf.scores).toArray
      System.arraycopy(ids, 0, buf.ids, 0, buf.n)
      System.arraycopy(scores, 0, buf.scores, 0, buf.n)
    }

    private def bubbleUp(buf: TopKBuf): Unit = {
      val ids = buf.ids; val scores = buf.scores
      var i = buf.n - 1
      while (i > 0 && worse(scores(i - 1), ids(i - 1), scores(i), ids(i))) {
        val ts = scores(i - 1); scores(i - 1) = scores(i); scores(i) = ts
        val ti = ids(i - 1); ids(i - 1) = ids(i); ids(i) = ti
        i -= 1
      }
    }

    override def finish(buf: TopKBuf): Seq[Scored] = {
      if (buf.n < k) sortBuf(buf)
      (0 until buf.n).map(i => Scored(buf.ids(i), buf.scores(i)))
    }
    override def bufferEncoder: Encoder[TopKBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKBuf]()
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
             queryVecCol: String = "qvec", vecCol: String = "vec"): DataFrame =
    searchWith(queries, vectors, k, scoreCol(metric),
      metricAscending(metric), queryVecCol, vecCol)

  /** [[search]] with a caller-supplied score column (any codegen'd kernel
    * — e.g. the PQ asymmetric distance over a code column). */
  def searchWith(queries: DataFrame, vectors: DataFrame, k: Int,
                 score: (Column, Column) => Column, ascending: Boolean,
                 queryVecCol: String = "qvec", vecCol: String = "vec"): DataFrame = {
    val pairs = vectors
      .join(broadcast(queries))
      .select(col("qid"), col("id"),
        score(col(queryVecCol), col(vecCol)).as("score"))
    val topk = udaf(new TopKAggregator(k, ascending))
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
