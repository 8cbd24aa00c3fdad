package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** double_order_bits: the signed-long image must order EXACTLY like the
  * source doubles over the full value space, inside codegen. */
class OrderBitsSpec extends SparkSpec {
  import spark.implicits._
  import OrderBitsFunctions.doubleOrderBits

  test("property loop: long comparison of the image == double comparison of the source") {
    val rng = new scala.util.Random(23)
    val specials = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity, Double.NegativeInfinity)
    val vals = specials ++ Seq.fill(500)(
      (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(40) - 20))
    // index-aligned, NOT a Map keyed by the double: 0.0 == -0.0 under
    // Scala ==, so a Map would collapse exactly the pair whose ordering
    // the map must distinguish
    val bits = vals.zipWithIndex.map { case (d, i) => (i, d) }
      .toDF("i", "d")
      .select(col("i"), doubleOrderBits(col("d")).as("b"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (ai <- vals.indices; bi <- vals.indices) {
      assert(java.lang.Double.compare(vals(ai), vals(bi)).signum ==
        java.lang.Long.compare(bits(ai), bits(bi)).signum,
        s"order disagrees for ${vals(ai)} vs ${vals(bi)}")
    }
  }

  test("NaN maps above every finite value (Java canonical NaN), and the kernel is codegen'd") {
    val df = Seq(Double.NaN, Double.PositiveInfinity, 1.0).toDF("d")
      .select(doubleOrderBits(col("d")).as("b"))
    val Array(nan, inf, one) = df.collect().map(_.getLong(0))
    assert(nan > inf && inf > one)
    // a non-literal source, so constant folding can't erase the kernel
    val plan = spark.range(5).select(doubleOrderBits(col("id").cast("double")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("double_order_bits") && !plan.contains("UDF"), plan)
  }
}
