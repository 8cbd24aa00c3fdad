package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** SemDedup invariants: k=1 exact parity with brute force, subset
  * precision at any k, survivor pruning, and full recall in the
  * tight-duplicate regime the technique is designed for. */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val a = emb.select(col("id").as("a_id"), col("vec").as("a_vec"))
    val b = emb.select(col("id").as("b_id"), col("vec").as("b_vec"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(cosineSim(col("a_vec"), col("b_vec")) >= threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def foundPairs(k: Int, threshold: Double): Set[(Long, Long)] = {
    val seeds = KMeans.initCentroids(emb, k)
    SemDedup.pairs(emb, seeds, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("k=1 degenerates to exact brute force") {
    assert(foundPairs(k = 1, threshold = 0.3) == brutePairs(0.3))
  }

  test("pairs are a subset of the brute-force set at any k (precision 1.0)") {
    val brute = brutePairs(0.3)
    for (k <- Seq(2, 4, 8)) {
      val found = foundPairs(k, 0.3)
      assert(found.subsetOf(brute), s"k=$k emitted a non-dup pair")
    }
  }

  test("full recall when duplicates are tight and clusters separated") {
    // 3 orthogonal base directions, 4 near-copies each (1e-3 jitter):
    // every dup pair has cosine ~1, every cross-base pair ~0. Any
    // clustering that separates the bases finds ALL dup pairs.
    val bases = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows = for {
      (base, bi) <- bases.zipWithIndex
      j <- 0 until 4
    } yield {
      val v = base.clone()
      v(3) = (bi * 4 + j) * 1e-3f // deterministic distinct jitter
      ((bi * 4 + j).toLong, v)
    }
    val vecs = rows.toDF("id", "vec")
    // explicit base-direction centroids: the test pins the REGIME (tight
    // dups co-cluster => full recall), not Lloyd's seed luck — md5 seeding
    // can land two seeds in one base and split another (k-means' inherent
    // init sensitivity, measured honestly by the catalog's recall row)
    val centroids = bases.toArray
    val found = SemDedup.pairs(vecs, centroids, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: all within-base pairs, 3 * C(4,2) = 18
    val expected = (for {
      bi <- 0 until 3; i <- 0 until 4; j <- i + 1 until 4
    } yield ((bi * 4 + i).toLong, (bi * 4 + j).toLong)).toSet
    assert(found == expected)

    val rep = SemDedup.report(vecs, centroids, threshold = 0.99).head()
    assert(rep.getAs[Long]("recall_bp") == 10000L)
    // one survivor per base group
    assert(rep.getAs[Long]("n_survivors") == 3L)
  }

  test("survivors keep the lowest id per transitive group plus unpaired") {
    val vecs = (1L to 7L).map(i => (i, Array(i.toFloat, 1f))).toDF("id", "vec")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val kept = SemDedup.survivors(vecs, pairs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 7L))
  }

  test("report internal consistency on the catalog regime") {
    val model = KMeans.train(emb, k = 8, iters = 2)
    val rep = SemDedup.report(emb, model.centroids, threshold = 0.4).head()
    val n = rep.getAs[Long]("n_vectors")
    assert(rep.getAs[Long]("n_pairs_found") <= rep.getAs[Long]("n_pairs_exact"))
    assert(rep.getAs[Long]("recall_bp") <= 10000L)
    assert(rep.getAs[Long]("n_survivors") <= n)
    assert(rep.getAs[Long]("n_survivors") >= n - 2 * rep.getAs[Long]("n_pairs_found"))
  }
}
