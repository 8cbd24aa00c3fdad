package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SubstringDedup: anchor/merge correctness on constructed corpora where
  * the maximal duplicated spans are known exactly. */
class SubstringDedupSpec extends SparkSpec {

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private def spansOf(rows: Seq[(Long, String)], minTokens: Int): Map[Long, Seq[(Long, Long, Long)]] = {
    val sess = spark
    import sess.implicits._
    SubstringDedup.duplicatedSpans(
        rows.toDF("doc_id", "text"), "text", "doc_id", minTokens)
      .orderBy(col("doc_id"), col("span_start"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  test("a shared block is recovered as ONE maximal span in both docs") {
    val block = words("dup", 30)
    val a = (words("a", 10) ++ block ++ words("z", 5)).mkString(" ")
    val b = (words("b", 3) ++ block ++ words("y", 8)).mkString(" ")
    val c = words("c", 40).mkString(" ")
    val got = spansOf(Seq((1L, a), (2L, b), (3L, c)), minTokens = 20)
    // doc 1: block at tokens 11..40; doc 2: at 4..33; doc 3: clean
    assert(got(1L) == Seq((11L, 40L, 30L)))
    assert(got(2L) == Seq((4L, 33L, 30L)))
    assert(!got.contains(3L))
  }

  test("an exactly-L-token share yields span_len == L; below L, nothing") {
    val block = words("s", 20)
    val a = (words("a", 7) ++ block ++ words("x", 7)).mkString(" ")
    val b = (block ++ words("y", 10)).mkString(" ")
    val got = spansOf(Seq((1L, a), (2L, b)), minTokens = 20)
    assert(got(1L) == Seq((8L, 27L, 20L)))
    assert(got(2L) == Seq((1L, 20L, 20L)))
    // the same corpus at L = 21 has no 21-token shared window
    assert(spansOf(Seq((1L, a), (2L, b)), minTokens = 21).isEmpty)
  }

  test("within-doc repetition alone is not cross-document duplication") {
    val block = words("r", 25)
    val a = (block ++ words("mid", 4) ++ block).mkString(" ")
    val b = words("other", 60).mkString(" ")
    assert(spansOf(Seq((1L, a), (2L, b)), minTokens = 20).isEmpty)
  }

  test("two separated shared blocks stay two islands; docs shorter than L are skipped") {
    val b1 = words("p", 22)
    val b2 = words("q", 24)
    val a = (b1 ++ words("gapA", 9) ++ b2).mkString(" ")
    val b = (words("pre", 5) ++ b1 ++ words("gapB", 30) ++ b2).mkString(" ")
    val tiny = words("p", 10).mkString(" ") // < L tokens: filtered out
    val got = spansOf(Seq((1L, a), (2L, b), (3L, tiny)), minTokens = 20)
    assert(got(1L) == Seq((1L, 22L, 22L), (32L, 55L, 24L)))
    assert(got(2L) == Seq((6L, 27L, 22L), (58L, 81L, 24L)))
    assert(!got.contains(3L))
  }
}
