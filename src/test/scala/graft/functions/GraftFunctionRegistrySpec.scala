package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The SQL function surface: every registered kernel callable from
  * spark.sql and agreeing with its DataFrame-API twin. */
class GraftFunctionRegistrySpec extends AnyFunSuite with SparkSpec {

  private def sql1(q: String): Any = {
    GraftFunctionRegistry.registerAll(spark)
    spark.sql(q).collect().head.get(0)
  }

  test("cosine_sim / l2_sq / dot_f32 from SQL match scalar math") {
    val q = "SELECT %s(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))," +
      " array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)))"
    assert(math.abs(sql1(q.format("cosine_sim")).asInstanceOf[Double] - 0.6) < 1e-6)
    val l2 = sql1(q.format("l2_sq")).asInstanceOf[Double]
    assert(math.abs(l2 - (0.4 * 0.4 + 0.8 * 0.8)) < 1e-7)
    assert(math.abs(sql1(q.format("dot_f32")).asInstanceOf[Double] - 0.6) < 1e-7)
  }

  test("signpack64 packs sign bits; simhash64_md5 equals the SQL bit-vote form") {
    val packed = sql1("SELECT signpack64(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)," +
      " CAST(0.5 AS FLOAT)))").asInstanceOf[Long]
    assert(packed == 0x5L) // bits 0 and 2 set (non-negative dims)

    val viaSql = spark.sql(
      s"SELECT ${graft.queries.SimhashSqlForms.spark} FROM (SELECT 'hello world spark' AS text)")
      .collect().head.getString(0)
    val viaKernel = sql1("SELECT simhash64_md5(split('hello world spark', ' '))")
      .asInstanceOf[String]
    assert(viaKernel == viaSql)
  }

  test("md5_minhash_shingles requires literal parameters and runs from SQL") {
    val bands = sql1("SELECT md5_minhash_shingles('abcdefghij', 4, 6, 2, 3)")
    assert(bands.asInstanceOf[scala.collection.Seq[_]].length == 2)
    val err = intercept[Exception] {
      sql1("SELECT md5_minhash_shingles('abcdefghij', 4, 6, 2, CAST(3 AS BIGINT))")
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.contains("rowsPerBand"))
  }

  test("zvalue2 from SQL equals the Column form") {
    // spread(3)=5, spread(5)=17 -> 5 | (17<<1) = 39
    assert(sql1("SELECT zvalue2(3, 5)").asInstanceOf[Long] == 39L)
    assert(sql1("SELECT zvalue2(65535, 65535)").asInstanceOf[Long] == 0xFFFFFFFFL)
  }

  test("sorted_count_le / sorted_count_lt from SQL binary-search a sorted array") {
    assert(sql1("SELECT sorted_count_le(array(10L, 20L, 30L), 20L)")
      .asInstanceOf[Int] == 2)
    assert(sql1("SELECT sorted_count_lt(array(10L, 20L, 30L), 20L)")
      .asInstanceOf[Int] == 1)
    // slice to an EMPTY array<bigint>: a bare array() literal is
    // array<void>, which ExpectsInputTypes rejects (validate, not cast)
    assert(sql1("SELECT sorted_count_le(slice(array(1L), 1, 0), 5L)")
      .asInstanceOf[Int] == 0)
  }

  test("double_order_bits from SQL preserves double order in the long image") {
    assert(sql1("SELECT double_order_bits(CAST(0.0 AS DOUBLE))")
      .asInstanceOf[Long] == 0L)
    // string-parse: a -0.0 NUMERIC literal goes through decimal, which
    // has no signed zero, and folds to +0.0
    assert(sql1("SELECT double_order_bits(CAST('-0.0' AS DOUBLE))")
      .asInstanceOf[Long] == -1L)
    assert(sql1("SELECT double_order_bits(CAST(1.5 AS DOUBLE)) > " +
      "double_order_bits(CAST(1.25 AS DOUBLE))").asInstanceOf[Boolean])
    assert(sql1("SELECT double_order_bits(CAST(-1.25 AS DOUBLE)) > " +
      "double_order_bits(CAST(-1.5 AS DOUBLE))").asInstanceOf[Boolean])
  }

  test("registry shape: unique names, arity enforced") {
    val names = GraftFunctionRegistry.functions.map(_._1)
    assert(names.distinct == names)
    val cosine = GraftFunctionRegistry.functions.toMap.apply("cosine_sim")
    assertThrows[IllegalArgumentException](
      cosine(Seq(org.apache.spark.sql.catalyst.expressions.Literal(1))))
  }
}
