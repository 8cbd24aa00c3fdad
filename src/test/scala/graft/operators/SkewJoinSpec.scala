package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted joins must be EXACTLY a plain inner join — verified on an
  * adversarially skewed input (80% of rows share one key), plus hot-key
  * detection and the no-hot-keys passthrough. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // vals, not defs: a fresh DataFrame per call would carry fresh
  // expression IDs, breaking `left("k") === dim("dk")` conditions
  private lazy val skewed = {
    val rng = new scala.util.Random(3)
    (0 until 50000).map { i =>
      val k = if (rng.nextDouble() < 0.8) 7L else rng.nextInt(1000).toLong
      (k, i.toLong)
    }.toDF("k", "payload")
  }
  private lazy val dim = (0 until 1000)
    .map(i => (i.toLong, s"name_$i")).toDF("dk", "name")

  test("salted join equals the plain join on a skewed input") {
    val left = skewed
    val plain = left.join(dim, left("k") === dim("dk"))
    val salted = SkewJoin.saltedJoin(left, dim, "k", "dk",
      nSalts = 8, hotKeys = Seq(7L))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("hot-key detection finds the planted hot key deterministically") {
    val hot1 = SkewJoin.detectHotKeys(skewed, "k")
    val hot2 = SkewJoin.detectHotKeys(skewed, "k")
    assert(hot1 == hot2)
    assert(hot1.contains(7L))
    assert(hot1.size < 10, s"near-uniform keys must not be hot: $hot1")
  }

  test("uniform input detects no hot keys and falls back to the plain join") {
    val uniform = (0 until 5000).map(i => ((i % 500).toLong, i.toLong))
      .toDF("k", "payload")
    assert(SkewJoin.detectHotKeys(uniform, "k").isEmpty)
    val joined = SkewJoin.saltedJoin(uniform, dim, "k", "dk", nSalts = 8)
    assert(joined.count() == uniform.join(dim, col("k") === col("dk")).count())
  }

  test("null keys: never detected as hot, and salted == plain inner join") {
    val withNulls = skewed.withColumn("k",
      when(col("payload") % 3 === 0, lit(null)).otherwise(col("k")))
    val hot = SkewJoin.detectHotKeys(withNulls, "k")
    assert(!hot.contains(null) && hot.contains(7L))
    val plain = withNulls.join(dim, withNulls("k") === dim("dk"))
    val salted = SkewJoin.saltedJoin(withNulls, dim, "k", "dk",
      nSalts = 8, hotKeys = hot)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("the hot key's left rows actually spread across salts") {
    // internal invariant made observable: with 40k rows of one key and 8
    // salts, a whole-row hash cannot land them all in one salt bucket
    val left = skewed.filter(col("k") === 7L)
    val salts = left
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts == 8L)
  }
}
