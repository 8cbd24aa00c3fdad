package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._
import graft.hnsw.HnswDistributed.BuildConfig
import graft.hnsw.HnswParams

/** Dedup operator invariants: LinearDb idempotence (linear_db.rs:43-52
  * port), ANN near-dup equivalence with brute force, LSH precision/recall. */
class DedupSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(cosineSim(col("a_vec"), col("b_vec")) >= threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("insertIfAbsent is idempotent (linear_db.rs:43-52 port)") {
    val empty = emb.limit(0)
    val once = Dedup.insertIfAbsent(empty, emb, "embedding", "vec_id")
    val twice = Dedup.insertIfAbsent(once, emb, "embedding", "vec_id")
    assert(once.count() == twice.count())
    // store contents identical, not just counts
    assert(twice.select("vec_id").exceptAll(once.select("vec_id")).count() == 0)
  }

  test("insertIfAbsent drops in-batch and cross-batch duplicates, keeps lowest id") {
    import spark.implicits._
    val existing = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val incoming = Seq(
      (3L, Array(1f, 0f)),  // dup of existing 1
      (4L, Array(1f, 1f)),  // fresh
      (5L, Array(1f, 1f)),  // in-batch dup of 4
      (6L, Array(0f, 2f))   // fresh
    ).toDF("vec_id", "embedding")
    val out = Dedup.insertIfAbsent(existing, incoming, "embedding", "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L, 6L))
  }

  test("ANN near-dup equals brute force at exact-regime ef (sf0.001)") {
    val cfg = BuildConfig(HnswParams.standard(64, 128, 16), "cosine", seed = 42L)
    val ann = Dedup.neardupAnn(emb, "vec_id", "embedding", 0.4, k = 48, cfg = cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann == brutePairs(0.4))
  }

  test("LSH near-dup at the catalog banding (102x5): equals brute force at threshold 0.45") {
    // 102 bands x 5 bits: per-pair miss probability (1 - 0.6486^5)^102
    // ~ 4e-6 at s = 0.45, so candidate recall is total for the corpus's
    // qualifying pairs and the exact verify makes the output identical to
    // the brute-force self-join (the v_neardup_lsh oracle relies on this).
    val brute = brutePairs(0.45)
    val lsh = Dedup.neardupLsh(emb, "vec_id", "embedding", 0.45,
        nBits = 512, bands = 102, rowsPerBand = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute,
      s"missing=${(brute -- lsh).size} extra=${(lsh -- brute).size} of ${brute.size}")
  }

  test("LSH near-dup default banding (64x8): precision 1.0, recall floor holds") {
    val brute = brutePairs(0.45)
    val lsh = Dedup.neardupLsh(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "verify step must give precision 1.0")
    if (brute.nonEmpty) {
      val recall = (lsh intersect brute).size.toDouble / brute.size
      assert(recall >= 0.6, s"recall=$recall")
    }
  }

  test("LSH candidate generation prunes the pair space") {
    val n = emb.count()
    val candidates = Dedup.lshCandidatePairs(emb, "vec_id", "embedding").count()
    assert(candidates < n * (n - 1) / 2 / 2, s"candidates=$candidates of ${n * (n - 1) / 2}")
  }

  test("simhash signatures deterministic and dimension-correct") {
    val sig = Dedup.simhashSig(512, 64, seed = 7L)
    val s1 = emb.limit(10).select(col("vec_id"), sig(col("embedding")).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val s2 = emb.limit(10).select(col("vec_id"), sig(col("embedding")).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    assert(s1 == s2)
    assert(s1.values.forall(_.size == 8)) // 512 bits = 8 longs
  }
}
