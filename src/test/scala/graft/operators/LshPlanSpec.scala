package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The banding calculator against its own closed-form math, plus an
  * empirical recall check of the planned banding on real embeddings. */
class LshPlanSpec extends AnyFunSuite {

  test("bit collision probability: endpoints and monotonicity") {
    assert(math.abs(LshPlan.bitCollisionProb(1.0) - 1.0) < 1e-12)
    assert(math.abs(LshPlan.bitCollisionProb(-1.0) - 0.0) < 1e-12)
    assert(math.abs(LshPlan.bitCollisionProb(0.0) - 0.5) < 1e-12)
    val probs = (-10 to 10).map(i => LshPlan.bitCollisionProb(i / 10.0))
    assert(probs == probs.sorted, "p(s) must be increasing in s")
  }

  test("bandsFor inverts the miss bound tightly") {
    for (t <- Seq(0.3, 0.45, 0.6, 0.8); rho <- Seq(0.9, 0.95, 0.99); r <- Seq(3, 5, 8)) {
      val b = LshPlan.bandsFor(t, rho, r)
      assert(LshPlan.recall(t, b, r) >= rho,
        s"b=$b bands must meet recall $rho at t=$t r=$r")
      if (b > 1)
        assert(LshPlan.recall(t, b - 1, r) < rho,
          s"b=$b must be MINIMAL at t=$t rho=$rho r=$r")
    }
  }

  test("plan meets the recall target, fits the signature, and sits at an interior optimum") {
    val p = LshPlan.plan(0.45, targetRecall = 0.98, nBits = 512, n = 10000L)
    assert(p.bitsUsed <= 512)
    assert(p.recallBound >= 0.98)
    // the catalog's parity banding (102x5) is strictly more expensive in
    // background candidates than the planned regime
    assert(p.bgCandidatesPerPair < 102 * math.pow(0.5, 5))
    // recall at similarities ABOVE the threshold only improves
    assert(LshPlan.recall(0.6, p.bands, p.rowsPerBand) > p.recallBound)
  }

  test("documented parity regime: 102x5 at 0.45 has ~4e-6 per-pair miss") {
    val miss = LshPlan.missProb(0.45, 102, 5)
    assert(miss < 1e-5 && miss > 1e-7, s"miss=$miss")
  }

  test("higher threshold buys a cheaper plan at equal recall") {
    val cheap = LshPlan.plan(0.8, 0.95, 512, n = 100000L)
    val costly = LshPlan.plan(0.4, 0.95, 512, n = 100000L)
    assert(cheap.bgCandidatesPerPair <= costly.bgCandidatesPerPair)
  }

  test("infeasible operating point is an explicit error, not a silent cap") {
    intercept[IllegalArgumentException] {
      LshPlan.plan(0.05, targetRecall = 0.999999, nBits = 16)
    }
  }
}

/** The codegen'd signature expression against an independent
  * reimplementation of the original UDF math (same seeded projections via
  * Dedup.projections, boxed loop) — signatures must be bit-identical or
  * every LSH oracle hash silently drifts. */
class SimHashSigSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("SimHashSigF32 matches the reference UDF computation bit-for-bit") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(64)
    val proj = Dedup.projections(512, 64, 7L)
    val ref = udf { (v: Seq[Float]) =>
      val words = new Array[Long](8)
      var b = 0
      while (b < 512) {
        val p = proj(b); var acc = 0.0; var i = 0
        val n = math.min(p.length, v.length)
        while (i < n) { acc += p(i) * v(i); i += 1 }
        if (acc >= 0) words(b >> 6) |= (1L << (b & 63))
        b += 1
      }
      words
    }
    val sig = Dedup.simhashSig(512, 64, 7L)
    val mismatches = vecs
      .select(col("vec_id"), sig(col("embedding")).as("fast"),
        ref(col("embedding")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("flat projections equal the nested generator row-major") {
    val nested = Dedup.projections(64, 8, 99L).flatten
    val flat = graft.functions.SimHashSigF32.flatProjections(64, 8, 99L)
    assert(nested.toSeq == flat.toSeq)
  }

  test("fused band slicing equals slices of the full signature (both band regimes)") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(64)
    for ((bands, r) <- Seq((102, 5), (61, 7), (64, 8))) {
      val rows = vecs.select(col("vec_id"),
          Dedup.simhashSig(512, 64, 7L)(col("embedding")).as("sig"),
          graft.functions.VectorFunctions
            .simhashBands(col("embedding"), 512, 64, 7L, bands, r).as("bv"))
        .collect()
      rows.foreach { row =>
        val sig = row.getSeq[Long](1).toArray
        val bv = row.getSeq[Long](2)
        val mask = (1L << r) - 1
        (0 until bands).foreach { j =>
          val start = j * r
          val w = start >> 6
          val off = start & 63
          val lo = sig(w) >>> off
          val expected =
            (if (off + r <= 64) lo else lo | (sig(w + 1) << (64 - off))) & mask
          assert(bv(j) == expected, s"band $j of ${bands}x$r")
        }
      }
    }
  }
}

/** Empirical recall of the PLANNED banding on the real embeddings table —
  * the floor the closed form promises must hold on data, not just in the
  * formula (sf0.001: small enough that brute force is instant). */
class LshPlanRecallSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("planned banding achieves its recall bound on sf0.001 embeddings") {
    val threshold = 0.45
    val plan = LshPlan.plan(threshold, targetRecall = 0.95, nBits = 512, n = 10000L)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val found = Dedup.neardupLsh(vecs, "vec_id", "embedding", threshold,
      nBits = 512, bands = plan.bands, rowsPerBand = plan.rowsPerBand)
    val a = vecs.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = vecs.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    val truth = a.join(b, col("a_id") < col("b_id"))
      .filter(graft.functions.VectorFunctions
        .cosineSim(col("a_vec"), col("b_vec")) >= threshold)
      .select(col("a_id"), col("b_id"))
    val nTrue = truth.count()
    val nFound = found.join(truth, Seq("a_id", "b_id"), "left_semi").count()
    assert(nTrue > 0, "fixture must contain qualifying pairs")
    // the bound is per-pair 0.98; with tens of pairs the expected miss
    // count is < 1, but allow the binomial tail one miss
    assert(nFound >= nTrue - 1 && nFound.toDouble / nTrue >= 0.9,
      s"recall ${nFound.toDouble / nTrue} below planned floor (found $nFound of $nTrue)")
    // precision is 1.0 by construction (exact verify) — found minus truth
    // must be empty
    assert(found.join(truth, Seq("a_id", "b_id"), "left_anti").count() == 0)
  }
}
