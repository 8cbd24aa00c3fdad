package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Banded Levenshtein: equals min(full levenshtein, k+1) everywhere —
  * property-tested against Spark's own kernel — plus edges and codegen. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def bounded(a: String, b: String, k: Int): Int =
    EditDistanceKernels.boundedLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  private def full(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  test("bounded == min(full, k+1) on random string pairs, several thresholds") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcde "
    def randStr(maxLen: Int): String =
      Seq.fill(rng.nextInt(maxLen + 1))(alphabet(rng.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 2000; k <- Seq(0, 1, 3, 7)) {
      val (a, b) = (randStr(12), randStr(12))
      val expect = math.min(full(a, b), k + 1)
      val got = bounded(a, b, k)
      assert(got == expect, s"a='$a' b='$b' k=$k: got $got expect $expect")
    }
    // near-identical long strings: the band actually matters
    for (_ <- 1 to 200) {
      val base = randStr(64)
      val mutated = base.zipWithIndex.map { case (c, i) =>
        if (rng.nextInt(20) == 0) alphabet(rng.nextInt(alphabet.length)) else c
      }.mkString
      val k = 3
      assert(bounded(base, mutated, k) == math.min(full(base, mutated), k + 1))
    }
  }

  test("edges: empty strings, equal strings, length gap beyond k") {
    assert(bounded("", "", 3) == 0)
    assert(bounded("", "abc", 3) == 3)
    assert(bounded("", "abcd", 3) == 4)   // capped at k+1
    assert(bounded("same", "same", 0) == 0)
    assert(bounded("abcdefgh", "abc", 3) == 4) // |n-m|=5 > 3 -> k+1 fast path
  }

  test("expression is codegen'd, null-safe, and SQL-registered") {
    val df = Seq(("kitten", "sitting"), ("flaw", "lawn"), (null, "x"))
      .toDF("a", "b")
    val got = df.select(EditDistanceFunctions.levenshteinLe(col("a"), col("b"), 3).as("d"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(got.toSeq == Seq(3, 2, -1))
    val plan = df.select(EditDistanceFunctions.levenshteinLe(col("a"), col("b"), 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    GraftFunctionRegistry.registerAll(spark)
    assert(spark.sql("SELECT levenshtein_le('kitten', 'sitting', 3)")
      .head().getInt(0) == 3)
  }
}
