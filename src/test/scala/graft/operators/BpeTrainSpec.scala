package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed BPE training vs an independent single-node reference
  * with the same tie-break contract (max count, then lexicographically
  * smallest pair): the merge tables must be IDENTICAL, rank for rank.
  */
class BpeTrainSpec extends SparkSpec {

  private val utf8Order: Ordering[String] = (x: String, y: String) =>
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Straightforward in-memory BPE — deliberately naive (recount from
    * scratch every round) so it shares no code with the operator. */
  private def refBpe(weighted: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    // code-point split (not UTF-16 units) — the operator's contract
    var state: Map[Vector[String], Long] =
      weighted.groupMapReduce(kv =>
        BpeTrain.codePointSymbols(kv._1).toVector)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    while (k < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) k = nMerges
      else {
        // tie-break compares in UTF-8 BYTE order (== code-point order),
        // the operator's documented contract — Java String's natural
        // order is UTF-16 code-UNIT order, which diverges when a
        // non-BMP symbol ties against U+E000..U+FFFF
        val ((l, r), f) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }(
            Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
        out += ((l, r, f))
        state = state.toSeq.map { case (syms, n) =>
          (BpeTrain.applyMerge(syms.toArray, l, r).toVector, n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        k += 1
      }
    }
    out.toSeq
  }

  private def wordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("toy corpus: distributed merges equal the reference, rank for rank") {
    import spark.implicits._
    val texts = Seq("low lower lowest", "new newer newest", "low low new",
      "wide wider widest", "newest newest")
    val got = BpeTrain.train(texts.toDF("text"), "text", nMerges = 8)
      .map(m => (m.left, m.right, m.freq))
    assert(got == refBpe(wordCounts(texts), 8))
  }

  test("real corpus (sf0.001 documents): first 10 merges equal the reference on BOTH routes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val expected = refBpe(wordCounts(texts), 10)
    // default threshold -> driver-local inverted-index path
    val local = BpeTrain.train(docs, "text", nMerges = 10)
      .map(m => (m.left, m.right, m.freq))
    assert(local == expected)
    // threshold 0 forces the distributed incremental loop — identical
    // merges, rank for rank (the router must be invisible in output)
    val dist = BpeTrain.train(docs, "text", nMerges = 10,
        localVocabThreshold = 0L)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == expected)
  }

  test("non-BMP corpus: code-point symbols survive the UTF-8 round-trip") {
    import spark.implicits._
    // U+1F600 (surrogate pair in UTF-16) and U+1F601: UTF-16-unit
    // splitting would shuffle lone surrogates, which UTF8String
    // corrupts to '?', merging the two emoji into one bogus symbol
    val g1 = new String(Character.toChars(0x1F600))
    val g2 = new String(Character.toChars(0x1F601))
    val texts = Seq(s"$g1$g2 $g1$g2 $g1$g2", s"$g1$g1 ab ab")
    val got = BpeTrain.train(texts.toDF("text"), "text", nMerges = 3)
      .map(m => (m.left, m.right, m.freq))
    assert(got == refBpe(wordCounts(texts), 3))
    assert(got.head == ((g1, g2, 3L)), s"expected the emoji pair merge first: $got")
    assert(!got.exists { case (l, r, _) => l.contains("?") || r.contains("?") })
  }

  test("tie between a non-BMP symbol and U+E000..U+FFFF breaks in UTF-8 byte order") {
    import spark.implicits._
    // (U+E000, a) and (U+10000, a) tie at count 2. UTF-16 code-UNIT
    // order would rank U+10000 (surrogates 0xD800...) BEFORE U+E000;
    // the documented contract is UTF-8 byte (code-point) order, which
    // ranks U+E000 first — the operator and the reference must agree.
    val bmp = "\uE000"
    val supp = new String(Character.toChars(0x10000))
    val texts = Seq(s"${bmp}a ${supp}a", s"${bmp}a ${supp}a")
    for (thr <- Seq(0L, 1000L)) { // both routes must break the tie alike
      val got = BpeTrain.train(texts.toDF("text"), "text", nMerges = 1,
          localVocabThreshold = thr)
        .map(m => (m.left, m.right, m.freq))
      assert(got == refBpe(wordCounts(texts), 1))
      assert(got.head == ((bmp, "a", 2L)),
        s"tie must break to the code-point-smaller pair (thr=$thr): $got")
    }
  }

  test("merge application is greedy, leftmost, non-overlapping") {
    assert(BpeTrain.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(BpeTrain.applyMerge(Array("x"), "a", "a").toSeq == Seq("x"))
    assert(BpeTrain.applyMerge(Array.empty[String], "a", "b").toSeq == Seq())
  }

  test("encodeWord replays the learned merges in rank order") {
    import spark.implicits._
    val texts = Seq("banana bandana", "banana banana")
    val merges = BpeTrain.train(texts.toDF("text"), "text", nMerges = 6)
    val enc = BpeTrain.encodeWord("banana", merges)
    // re-encoding a training word must reproduce its final trained form:
    // apply all merges to the char split via the same kernel
    var syms = "banana".map(_.toString).toArray
    merges.foreach(m => syms = BpeTrain.applyMerge(syms, m.left, m.right))
    assert(enc.toSeq == syms.toSeq && enc.mkString == "banana")
  }

  test("degenerate corpora: empty text and single-char words terminate early") {
    import spark.implicits._
    assert(BpeTrain.train(Seq("a b c").toDF("text"), "text", 5).isEmpty)
    assert(BpeTrain.train(Seq("").toDF("text"), "text", 3).isEmpty)
    val one = BpeTrain.train(Seq("ab ab").toDF("text"), "text", 5)
    assert(one.map(m => (m.left, m.right, m.freq)) == Seq(("a", "b", 2L)))
  }
}
