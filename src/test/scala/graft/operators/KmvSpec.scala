package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV invariants: exact below k, estimator accuracy above k, EXACT
  * mergeability (union of sketches == sketch of union, bit-identical),
  * partitioning invariance, SQL-portable hashing, and the Jaccard /
  * union set-algebra the catalog's cross-source row relies on. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(n: Int, k: Int, tag: String = "v") = {
    val df = (0 until n).map(i => s"$tag$i").toDF("key")
    Kmv.sketch(df, col("key"), Seq(lit(1).as("g")), k)
  }

  private def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("kmv")).head.getSeq[Long](0)

  test("below k the sketch is the full distinct hash set and the estimate is exact") {
    val sk = sketchOf(37, k = 64)
    assert(arr(sk).length == 37)
    assert(arr(sk) == arr(sk).sorted && arr(sk).distinct.length == 37)
    val est = sk.select(Kmv.estimate(col("kmv"), 64).as("e")).head.getLong(0)
    assert(est == 37L)
  }

  test("estimator accuracy: relative error within 5/sqrt(k-2) at 20k distinct") {
    val k = 256
    val est = sketchOf(20000, k)
      .select(Kmv.estimate(col("kmv"), k).as("e")).head.getLong(0)
    val rel = math.abs(est - 20000.0) / 20000.0
    assert(rel < 5.0 / math.sqrt(k - 2.0), s"est=$est rel=$rel")
  }

  test("merge is EXACT: sketch of union == unionK of sketches, bit-identical") {
    val k = 128
    // overlapping slices: [0, 3000) and [2000, 6000)
    val a = (0 until 3000).map(i => s"u$i")
    val b = (2000 until 6000).map(i => s"u$i")
    val skA = arr(Kmv.sketch(a.toDF("key"), col("key"), Seq(lit(1).as("g")), k))
    val skB = arr(Kmv.sketch(b.toDF("key"), col("key"), Seq(lit(1).as("g")), k))
    val skU = arr(Kmv.sketch((a ++ b).toDF("key"), col("key"), Seq(lit(1).as("g")), k))
    val merged = Seq(skA, skB).map(s => typedLit(s).as("x"))
    val viaUnion = spark.range(1)
      .select(Kmv.unionK(merged(0), merged(1), k).as("kmv"))
      .head.getSeq[Long](0)
    assert(viaUnion == skU)
  }

  test("sketch is partitioning- and order-invariant") {
    val df = (0 until 5000).map(i => s"p$i").toDF("key")
    val k = 64
    val base = arr(Kmv.sketch(df, col("key"), Seq(lit(1).as("g")), k))
    val shuf = arr(Kmv.sketch(df.repartition(23), col("key"), Seq(lit(1).as("g")), k))
    val rev = arr(Kmv.sketch(df.orderBy(col("key").desc), col("key"), Seq(lit(1).as("g")), k))
    assert(base == shuf && base == rev)
  }

  test("duplicate keys do not perturb the sketch (KMV state is a set)") {
    val k = 32
    val once = (0 until 500).map(i => s"d$i")
    val thrice = once ++ once ++ once
    val a = arr(Kmv.sketch(once.toDF("key"), col("key"), Seq(lit(1).as("g")), k))
    val b = arr(Kmv.sketch(thrice.toDF("key"), col("key"), Seq(lit(1).as("g")), k))
    assert(a == b)
  }

  test("hash48 matches the ANSI SQL spelling (conv/md5 prefix) and a driver-side reference") {
    val keys = Seq("abc", "42", "", "éclair")
    val got = keys.toDF("key").select(Kmv.hash48(col("key")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = keys.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    assert(got == want)
  }

  test("jaccard estimate: identical sets -> 10000 bp; disjoint -> 0 bp; half-overlap lands near 3333") {
    val k = 256
    // one shared key space "j$i": set identity is carried by the ranges
    def sk(from: Int, until: Int) =
      arr(Kmv.sketch((from until until).map(i => s"j$i").toDF("key"),
        col("key"), Seq(lit(1).as("g")), k))
    val a = sk(0, 4000)
    val b = sk(2000, 6000) // |A ∩ B| = 2000, |A ∪ B| = 6000, J = 1/3
    val d = sk(10000, 14000)
    def j(x: Seq[Long], y: Seq[Long]): Long = spark.range(1)
      .select(Kmv.jaccardBp(typedLit(x), typedLit(y), k).as("j"))
      .head.getLong(0)
    assert(j(a, a) == 10000L)
    assert(j(a, d) == 0L)
    val half = j(a, b)
    assert(math.abs(half - 3333L) < 1200, s"J est $half vs 3333")
  }

  test("jaccard threshold-intersect kernel equals the per-element membership definition; k=4096 stays sub-second") {
    // the O(|a|+|b|) kernel (array_intersect + threshold on last(u))
    // must equal the definition: |{x in u : x in a and x in b}| / |u| —
    // checked against a driver-side reference on random sketch pairs,
    // including the empty/disjoint/subset corners
    val rng = new scala.util.Random(7)
    val k = 4096
    def randSet(n: Int, space: Long): Seq[Long] =
      Seq.fill(n)(math.abs(rng.nextLong()) % space).distinct.sorted.take(k)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (randSet(5000, 1L << 40), Seq.empty[Long]),
      (randSet(5000, 200000L), randSet(5000, 200000L)), // heavy overlap space
      (randSet(5000, 1L << 40), randSet(5000, 1L << 40)), // near-disjoint
      (randSet(300, 1000L), randSet(5000, 1000L))) // subset-ish
    cases.foreach { case (a, b) =>
      val u = (a ++ b).distinct.sorted.take(k)
      val (aS, bS) = (a.toSet, b.toSet)
      val expect =
        if (u.isEmpty) 0L
        else u.count(x => aS(x) && bS(x)) * 10000L / u.size
      val got = spark.range(1)
        .select(Kmv.jaccardBp(typedLit(a), typedLit(b), k).as("j"))
        .head.getLong(0)
      assert(got == expect, s"|a|=${a.size} |b|=${b.size}: $got vs $expect")
    }
    // warm-path timing (the loop above already compiled the plan shape):
    // a batch of full-k evaluations must stay fast — the O(k^2)
    // per-element-membership kernel this replaced was ~10x slower here.
    // Min-of-2 with a 3 s bar: the guard targets the ~10x quadratic
    // regression, not absolute latency, and the sub-second single-shot
    // form flaked when 89 suites share the host (full-suite run,
    // round 15 — the only failure in 499).
    val (a, b) = (cases(2)._1, cases(2)._2)
    def timeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(20)
        .select(sum(Kmv.jaccardBp(typedLit(a), typedLit(b), k)).as("s"))
        .head.getLong(0)
      (System.nanoTime() - t0) / 1e9
    }
    val sec = math.min(timeOnce(), timeOnce())
    assert(sec < 3.0, f"20 k=4096 jaccard evals took $sec%.2f s (min of 2)")
  }

  test("null keys are excluded, not hashed") {
    val df = Seq(Some("x1"), None, Some("x2"), None).toDF("key")
    val sk = arr(Kmv.sketch(df, col("key"), Seq(lit(1).as("g")), 16))
    assert(sk.length == 2)
  }

  test("property loop: reduce/merge in any split and order equals brute-force k smallest distinct") {
    // the aggregator's array insertion/merge is hand-rolled — pin it
    // against a trivial reference over random streams, duplicate-heavy
    // value ranges, random split points, and random merge trees
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 200) {
      val k = 1 + rng.nextInt(12) + 1 // 2..13
      val n = rng.nextInt(400)
      val vals = Array.fill(n)(rng.nextInt(60).toLong) // heavy duplicates
      val want = vals.distinct.sorted.take(k).toSeq
      val agg = new Kmv.KmvAgg(k)
      // random number of chunks, each reduced then merged in a random order
      val chunks = if (n == 0) Seq(Array.empty[Long])
        else vals.grouped(1 + rng.nextInt(n)).toSeq
      val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rng.shuffle(bufs).reduceLeft(agg.merge)
      assert(merged.hs.toSeq == want, s"trial=$trial k=$k n=$n")
    }
  }

  test("estimator arithmetic is the k-th-element formula exactly (h_k >= k-1 >= 1 by construction)") {
    // a sorted DISTINCT non-negative array's k-th element is >= k-1, so
    // the division is always safe for the enforced k >= 2 — no guard
    val k = 4
    val est = spark.range(1)
      .select(Kmv.estimate(typedLit(Seq(1L, 2L, 3L, 7L)), k).as("e"))
      .head.getLong(0)
    assert(est == (k - 1).toLong * Kmv.HashSpace / 7L)
  }
}
