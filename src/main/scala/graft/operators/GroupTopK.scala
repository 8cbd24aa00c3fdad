package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k per group as a true AGGREGATE, not a window.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v)` materializes and sorts
  * every row of every group behind one shuffle — at 100 TB the sort is
  * the job. An aggregator with a k-bounded buffer does the same selection
  * with map-side partial aggregation: each task keeps at most k rows per
  * group, the shuffle carries O(#groups x k x #partitions) rows, and no
  * global per-group sort ever runs. Same discipline as ExactKnn's
  * bounded-heap top-k, generalized to any groupBy.
  *
  * Buffers are primitive long arrays (native Encoders, no Kryo hop),
  * kept sorted best-first — insertion is O(k) a row, merge O(k). Ordering
  * is total and deterministic: value DESC, then id ASC.
  *
  * PRECONDITION: v and id must be non-null (the primitive input encoder
  * rejects nulls at runtime, it does not rank them). A null value cannot
  * hold a leaderboard rank — filter nulls out before the aggregate, as
  * the catalog query and [[graft.streaming.StreamingTopK]] do.
  */
object GroupTopK {

  /** One input row: a ranking value and a tiebreak/payload id. */
  final case class Ranked(v: Long, id: Long)

  /** Sorted best-first parallel arrays, length <= k. */
  final case class TopKBuf(vs: Array[Long], ids: Array[Long])

  class GroupTopKAgg(k: Int) extends Aggregator[Ranked, TopKBuf, TopKBuf] {
    require(k > 0, s"k must be positive, got $k")

    // strict total order: larger v first, then smaller id
    private def beats(v1: Long, id1: Long, v2: Long, id2: Long): Boolean =
      v1 > v2 || (v1 == v2 && id1 < id2)

    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

    override def reduce(b: TopKBuf, a: Ranked): TopKBuf = {
      val n = b.vs.length
      if (n >= k && !beats(a.v, a.id, b.vs(n - 1), b.ids(n - 1))) b
      else {
        var i = 0
        while (i < n && beats(b.vs(i), b.ids(i), a.v, a.id)) i += 1
        val m = math.min(n + 1, k)
        val vs = new Array[Long](m); val ids = new Array[Long](m)
        System.arraycopy(b.vs, 0, vs, 0, i)
        System.arraycopy(b.ids, 0, ids, 0, i)
        vs(i) = a.v; ids(i) = a.id
        val tail = m - i - 1
        if (tail > 0) {
          System.arraycopy(b.vs, i, vs, i + 1, tail)
          System.arraycopy(b.ids, i, ids, i + 1, tail)
        }
        TopKBuf(vs, ids)
      }
    }

    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
      val m = math.min(b1.vs.length + b2.vs.length, k)
      val vs = new Array[Long](m); val ids = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeLeft = j >= b2.vs.length ||
          (i < b1.vs.length && beats(b1.vs(i), b1.ids(i), b2.vs(j), b2.ids(j)))
        if (takeLeft) { vs(o) = b1.vs(i); ids(o) = b1.ids(i); i += 1 }
        else { vs(o) = b2.vs(j); ids(o) = b2.ids(j); j += 1 }
        o += 1
      }
      TopKBuf(vs, ids)
    }

    override def finish(b: TopKBuf): TopKBuf = b
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Column form: `topK(3)(valueCol, idCol)` aggregates to a TopKBuf
    * struct (fields vs, ids — best first). */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new GroupTopKAgg(k), Encoders.product[Ranked])
    (v: Column, id: Column) => fn(v, id)
  }

  /** One input row with a STRING payload (term leaderboards: tf-idf top
    * terms per doc, label top-k). Ordering: value DESC, then term ASC in
    * code-point (= UTF-8 byte) order — the collation Spark's UTF8String
    * and DuckDB both apply, so tie-breaks hash-match the oracle on any
    * corpus, supplementary-plane characters included. */
  final case class RankedStr(v: Long, term: String)

  /** Sorted best-first parallel arrays, length <= k. */
  final case class TopKStrBuf(vs: Array[Long], terms: Array[String])

  /** Lexicographic CODE-POINT order == UTF-8 byte order (what Spark's
    * UTF8String and DuckDB's binary collation compare). Java's
    * String.compareTo orders UTF-16 code units, which ranks
    * supplementary-plane characters (surrogate pairs, 0xD800-0xDFFF)
    * BEFORE U+E000..U+FFFF — the opposite of byte order. */
  private[operators] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  class GroupTopKStrAgg(k: Int) extends Aggregator[RankedStr, TopKStrBuf, TopKStrBuf] {
    require(k > 0, s"k must be positive, got $k")

    private def beats(v1: Long, t1: String, v2: Long, t2: String): Boolean =
      v1 > v2 || (v1 == v2 && codePointCompare(t1, t2) < 0)

    override def zero: TopKStrBuf = TopKStrBuf(Array.empty, Array.empty)

    override def reduce(b: TopKStrBuf, a: RankedStr): TopKStrBuf = {
      val n = b.vs.length
      if (n >= k && !beats(a.v, a.term, b.vs(n - 1), b.terms(n - 1))) b
      else {
        var i = 0
        while (i < n && beats(b.vs(i), b.terms(i), a.v, a.term)) i += 1
        val m = math.min(n + 1, k)
        val vs = new Array[Long](m); val ts = new Array[String](m)
        System.arraycopy(b.vs, 0, vs, 0, i)
        System.arraycopy(b.terms, 0, ts, 0, i)
        vs(i) = a.v; ts(i) = a.term
        val tail = m - i - 1
        if (tail > 0) {
          System.arraycopy(b.vs, i, vs, i + 1, tail)
          System.arraycopy(b.terms, i, ts, i + 1, tail)
        }
        TopKStrBuf(vs, ts)
      }
    }

    override def merge(b1: TopKStrBuf, b2: TopKStrBuf): TopKStrBuf = {
      val m = math.min(b1.vs.length + b2.vs.length, k)
      val vs = new Array[Long](m); val ts = new Array[String](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeLeft = j >= b2.vs.length ||
          (i < b1.vs.length && beats(b1.vs(i), b1.terms(i), b2.vs(j), b2.terms(j)))
        if (takeLeft) { vs(o) = b1.vs(i); ts(o) = b1.terms(i); i += 1 }
        else { vs(o) = b2.vs(j); ts(o) = b2.terms(j); j += 1 }
        o += 1
      }
      TopKStrBuf(vs, ts)
    }

    override def finish(b: TopKStrBuf): TopKStrBuf = b
    override def bufferEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]
    override def outputEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]
  }

  /** Column form: `topKStr(3)(valueCol, termCol)` aggregates to a
    * TopKStrBuf struct (fields vs, terms — best first). Same null
    * precondition as [[topK]]. */
  def topKStr(k: Int): (Column, Column) => Column = {
    val fn = udaf(new GroupTopKStrAgg(k), Encoders.product[RankedStr])
    (v: Column, term: Column) => fn(v, term)
  }
}
