package graft.hnsw

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn
import org.apache.spark.sql.functions._

/** IVF-routed sharded HNSW: exhaustive regime equals brute force,
  * clustered data keeps recall through the router at small nProbe, and
  * the router actually prunes (per-query fan-out = nProbe cells). */
class HnswRoutedSpec extends SparkSpec {
  import spark.implicits._

  private def vecFromHash(i: Long, seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (HnswSearcher.uniformFromHash(i * dim + d, seed) * 2.0 - 1.0).toFloat)

  private val cfg = BuildConfig(
    HnswParams.standard(64, 128, 16), metric = "cosine", seed = 42L)

  test("exhaustive regime (nProbe = nCells) equals exact brute force") {
    val n = 2000
    val base = (0 until n).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 16)))
    val baseDf = base.toDF("id", "vec")
    val qs = (0 until 50).map(q => (q.toLong, vecFromHash(q.toLong + 100000, 9L, 16)))
    val qDf = qs.toDF("qid", "qvec")
    val index = HnswRouted.build(baseDf, cfg, nCells = 8, persist = false)
    val routed = HnswRouted.search(index, qDf, 10, nProbe = 8)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(qDf, baseDf, 10, "cosine")
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed == exact)
  }

  test("clustered corpus: nProbe=2 of 16 keeps recall@10 >= 0.95 (the router finds the right cells)") {
    // 16 well-separated cluster centers, 125 points each; queries are
    // perturbed members, so their true neighbors live in 1-2 cells
    val dim = 16
    val centers = (0 until 16).map(c => vecFromHash(c.toLong, 77L, dim).map(_ * 10f))
    val base = (0 until 2000).map { i =>
      val c = i % 16
      val noise = vecFromHash(i.toLong, 3L, dim)
      (i.toLong, centers(c).zip(noise).map { case (a, b) => a + b })
    }
    val baseDf = base.toDF("id", "vec")
    val qs = (0 until 100).map { q =>
      val c = q % 16
      val noise = vecFromHash(q.toLong + 50000, 5L, dim)
      (q.toLong, centers(c).zip(noise).map { case (a, b) => a + b })
    }
    val qDf = qs.toDF("qid", "qvec")
    val index = HnswRouted.build(baseDf, cfg, nCells = 16, persist = false)
    val routed = HnswRouted.search(index, qDf, 10, nProbe = 2)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(qDf, baseDf, 10, "cosine")
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (routed intersect exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"routed recall=$recall")
  }

  test("the router prunes: every query reaches exactly nProbe cells, k rows still come back") {
    val base = (0 until 1000).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 8)))
    val baseDf = base.toDF("id", "vec")
    val qDf = Seq((1L, vecFromHash(123L, 9L, 8))).toDF("qid", "qvec")
    val index = HnswRouted.build(baseDf, cfg, nCells = 8, persist = false)
    val out = HnswRouted.search(index, qDf, 5, nProbe = 1).collect()
    // one probed cell still answers a full k (cell-local top-k)
    assert(out.length == 5)
    assert(out.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("h_recall_routed curve is monotone in nProbe and exact at the nCells endpoint") {
    val rows = graft.SparkEntry.queries("h_recall_routed")(spark, sfDir)
      .orderBy(col("n_probe")).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val recalls = rows.map(_._2)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall curve not monotone: ${recalls.toSeq}")
    assert(recalls.last == 10000L,
      s"nProbe=nCells must be the exhaustive (exact) regime: ${recalls.last}")
  }

  test("ef0 widens the in-cell beam: the dense-cell recall knob, independent of nProbe") {
    // one dense near-duplicate cloud (the 1e7-rehearsal regime in
    // miniature): every point in ~one cell, so probing more cells can't
    // recover misses — only the in-cell beam can
    val dim = 16
    val center = vecFromHash(0L, 55L, dim).map(_ * 10f)
    val base = (0 until 4000).map { i =>
      val noise = vecFromHash(i.toLong, 3L, dim)
      (i.toLong, center.zip(noise).map { case (a, b) => a + 0.05f * b })
    }
    val baseDf = base.toDF("id", "vec")
    val narrow = BuildConfig(HnswParams.standard(64, 16, 16),
      metric = "cosine", seed = 42L)
    val index = HnswRouted.build(baseDf, narrow, nCells = 4, persist = false)
    val qDf = base.take(300).toDF("qid", "qvec")
    def selfMatch(ef0: Int): Long =
      HnswRouted.search(index, qDf, 1, nProbe = 4, ef0 = ef0)
        .filter(col("qid") === col("id")).count()
    val narrow1 = selfMatch(0)
    val wide = selfMatch(256)
    assert(wide >= narrow1, s"widening the beam lost recall: $narrow1 -> $wide")
    assert(wide >= 297L, s"wide-beam self-match $wide/300 below the 0.99 floor")
  }

  test("every vector lands in exactly one cell (the shards partition the corpus)") {
    val n = 1500
    val base = (0 until n).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 8)))
    val index = HnswRouted.build(base.toDF("id", "vec"), cfg,
      nCells = 8, persist = false)
    val byCell = index.shards.map(s => (s.cell, s.vectors.size)).collect()
    assert(byCell.map(_._1).distinct.length == byCell.length) // one shard per cell
    assert(byCell.map(_._2).sum == n)
  }
}
