package graft.hnsw

import graft.SparkSpec
import graft.operators.ExactKnn
import org.apache.spark.sql.functions._

/** IVF-routed HNSW over u64 Hamming codes: k-majority router,
  * exhaustive-regime exactness against brute force, skew fail-fast. */
class HnswRoutedCodesSpec extends SparkSpec {
  import spark.implicits._

  private def codeOf(i: Long, seed: Long): Long =
    java.lang.Double.doubleToRawLongBits(HnswSearcher.uniformFromHash(i, seed))

  private val params = HnswParams.standard(64, 128, 16)

  test("exhaustive regime (nProbe = nCells) equals exact brute force under Hamming") {
    val n = 2000
    val base = (0 until n).map(i => (i.toLong, codeOf(i.toLong, 23L)))
    val baseDf = base.toDF("id", "code")
    val qs = (0 until 50).map(q => (q.toLong, codeOf(q.toLong + 100000, 9L)))
    val qDf = qs.toDF("qid", "qcode")
    val index = HnswRoutedCodes.build(baseDf, params, nCells = 8,
      seed = 42L, persist = false)
    val routed = HnswRoutedCodes.search(index, qDf, 10, nProbe = 8)
      .select(col("qid"), col("id"), col("hamming"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sorted.toSeq
    val exact = ExactKnn.search(
        qDf.withColumnRenamed("qcode", "qvec"),
        baseDf.withColumnRenamed("code", "vec"), 10, "hamming")
      .select(col("qid"), col("id"), col("score").cast("int"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sorted.toSeq
    assert(routed == exact)
  }

  test("k-majority anchors are deterministic and assignment partitions the corpus") {
    val base = (0 until 1500).map(i => (i.toLong, codeOf(i.toLong, 23L)))
    val df = base.toDF("id", "code")
    val a1 = HnswRoutedCodes.trainAnchors(df, 8, seed = 11L)
    val a2 = HnswRoutedCodes.trainAnchors(df, 8, seed = 11L)
    assert(a1.toSeq == a2.toSeq)
    val index = HnswRoutedCodes.build(df, params, nCells = 8,
      seed = 42L, persist = false)
    val stats = index.shards.map { case (c, s) => (c, s.codes.size) }.collect()
    assert(stats.map(_._1).distinct.length == stats.length)
    assert(stats.map(_._2).sum == 1500)
  }

  test("clustered codes: small nProbe keeps high recall (the anchors find the planted cells)") {
    // 8 planted anchor codes, members within Hamming radius ~6 of their
    // anchor: a query near an anchor should find its neighbors probing
    // 2 of 8 cells
    val anchors = (0 until 8).map(a => codeOf(a.toLong, 77L))
    def member(a: Int, i: Long): Long = {
      // flip 3 seeded bit positions of the anchor
      var c = anchors(a)
      var k = 0
      while (k < 3) {
        val bit = (HnswSearcher.uniformFromHash(i * 7 + k, 13L) * 64).toInt.min(63)
        c ^= (1L << bit)
        k += 1
      }
      c
    }
    val base = (0 until 1600).map(i => (i.toLong, member(i % 8, i.toLong)))
    val baseDf = base.toDF("id", "code")
    val qs = (0 until 80).map(q => (q.toLong, member(q % 8, q.toLong + 90000)))
    val qDf = qs.toDF("qid", "qcode")
    val index = HnswRoutedCodes.build(baseDf, params, nCells = 8,
      seed = 42L, persist = false)
    val routed = HnswRoutedCodes.search(index, qDf, 10, nProbe = 2)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(
        qDf.withColumnRenamed("qcode", "qvec"),
        baseDf.withColumnRenamed("code", "vec"), 10, "hamming")
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (routed intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"routed hamming recall=$recall")
  }

  test("skew guard fails fast on collapsed code mass, naming the dials") {
    val c = codeOf(1L, 5L)
    val dup = (0 until 300).map(i => (i.toLong, c))
    val e = intercept[IllegalArgumentException] {
      HnswRoutedCodes.build(dup.toDF("id", "code"), params, nCells = 2,
        seed = 42L, persist = false, maxCellRows = 50L)
    }
    for (dial <- Seq("nCells", "maxCellRows", "buildBatched"))
      assert(e.getMessage.contains(dial), s"missing dial $dial: ${e.getMessage}")
  }
}
