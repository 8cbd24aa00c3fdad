package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min invariants: one-sided estimates (est >= exact, always),
  * the ε·N overestimate envelope, exact mergeability of partial
  * sketches, determinism, and cell-count bounds. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = CountMin.Config(depth = 4, width = 256, seed = 7L)

  // Zipf-ish stream: token k appears ~N/k times — heavy head, long tail
  private lazy val stream: Seq[String] = {
    val rng = new scala.util.Random(3)
    (0 until 20000).map { _ =>
      val k = math.min(499, (1.0 / (rng.nextDouble() + 1e-4)).toInt)
      s"tok$k"
    }
  }
  private def streamDf = stream.toDF("term")

  test("estimates are one-sided (est >= exact for EVERY distinct token)") {
    val sk = CountMin.sketch(streamDf, "term", cfg)
    val exact = streamDf.groupBy($"term").agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(sk, streamDf, "term", cfg)
    val bad = exact.join(est, "term").filter($"est" < $"n").count()
    assert(bad == 0L)
  }

  test("overestimate stays within a few multiples of the eps*N envelope") {
    // classic bound: P[over > (e/w)*N] <= e^-d per query; with w=256,
    // N=20000 that is ~212. Assert a loose 3x so the test is stable.
    val sk = CountMin.sketch(streamDf, "term", cfg)
    val exact = streamDf.groupBy($"term").agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(sk, streamDf, "term", cfg)
    val maxOver = exact.join(est, "term")
      .agg(max($"est" - $"n")).head.getLong(0)
    val envelope = (math.E / cfg.width * stream.size).ceil.toLong
    assert(maxOver <= 3 * envelope, s"maxOver=$maxOver envelope=$envelope")
  }

  test("partial sketches over corpus slices merge to EXACTLY the full sketch") {
    val (a, b) = stream.splitAt(stream.size / 3)
    val merged = CountMin.merge(
      CountMin.sketch(a.toDF("term"), "term", cfg),
      CountMin.sketch(b.toDF("term"), "term", cfg))
    val full = CountMin.sketch(streamDf, "term", cfg)
    val diff = merged.withColumnRenamed("n", "mn")
      .join(full, Seq("r", "c"), "full")
      .filter(coalesce($"mn", lit(0L)) =!= coalesce($"n", lit(0L)))
    assert(diff.count() == 0L)
  }

  test("sketch is deterministic and bounded by depth*width cells") {
    val s1 = CountMin.sketch(streamDf, "term", cfg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val s2 = CountMin.sketch(streamDf, "term", cfg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(s1 == s2)
    assert(s1.size <= cfg.depth * cfg.width)
    // every row index present, all cells in range, total per row == N
    val byRow = s1.groupBy(_._1)
    assert(byRow.keySet == (0 until cfg.depth).toSet)
    byRow.foreach { case (_, cells) =>
      assert(cells.forall(c => c._2 >= 0 && c._2 < cfg.width))
      assert(cells.map(_._3).sum == stream.size.toLong)
    }
  }

  test("estimate of an unseen token probes to near-zero (tail isolation)") {
    val sk = CountMin.sketch(streamDf, "term", cfg)
    val unseen = Seq("never-in-corpus").toDF("term")
    val est = CountMin.estimate(sk, unseen, "term", cfg).head.getLong(1)
    // not exactly 0 (collisions), but bounded by the envelope
    val envelope = (math.E / cfg.width * stream.size).ceil.toLong
    assert(est <= 3 * envelope, s"unseen est=$est")
  }

  test("null items are ignored in both build and probe") {
    val withNulls = (stream.map(Option(_)) ++ Seq(None, None)).toDF("term")
    val sk = CountMin.sketch(withNulls, "term", cfg)
    val total = sk.filter($"r" === 0).agg(sum($"n")).head.getLong(0)
    assert(total == stream.size.toLong)
    assert(CountMin.estimate(sk, withNulls, "term", cfg)
      .filter($"term".isNull).count() == 0L)
  }
}
