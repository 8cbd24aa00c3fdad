package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native md5 fingerprint kernels must agree exactly with the SQL
  * higher-order-function forms (which the DuckDB oracles keep running). */
class TextExpressionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("Md5MinHash == array_min(transform(md5('k:'||s))) for every k") {
    val sh = docs.select(col("doc_id"),
      expr("array_distinct(transform(sequence(1, greatest(length(text)-7, 1))," +
        " i -> substring(text, i, 8)))").as("sh"))
    val k = 5
    val native = sh.select(col("doc_id"),
      TextFunctions.md5MinHash(col("sh"), k).as("mh"))
    val sqlForm = sh.select(col("doc_id"),
      array((0 until k).map(i =>
        expr(s"array_min(transform(sh, s -> md5(concat('$i:', s))))")): _*).as("mh"))
    val n = native.collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    val s = sqlForm.collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    assert(n == s)
  }

  test("Md5MinHashShingles == minhash over distinct SQL shingles (mins, bands, unprefixed)") {
    val k = 4
    // bands=k, rows=1 -> raw mins
    val native = docs.select(col("doc_id"),
      TextFunctions.md5MinHashShingles(col("text"), 8, k, k, 1).as("mh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    val shExpr = "array_distinct(transform(sequence(1, greatest(length(text)-7, 1))," +
      " i -> substring(text, i, 8)))"
    val sqlForm = docs.select(col("doc_id"), expr(shExpr).as("sh"))
      .select(col("doc_id"), array((0 until k).map(i =>
        expr(s"array_min(transform(sh, s -> md5(concat('$i:', s))))")): _*).as("mh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    assert(native == sqlForm)

    // banding: bands=2, rows=2 -> concatenated pairs
    val bandsNative = docs.select(col("doc_id"),
      TextFunctions.md5MinHashShingles(col("text"), 8, k, 2, 2).as("b"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    val bandsExpected = sqlForm.map { case (id, mh) =>
      id -> List(mh(0) + mh(1), mh(2) + mh(3))
    }
    assert(bandsNative == bandsExpected)

    val fp = docs.select(col("doc_id"),
      element_at(TextFunctions.md5MinHashShingles(col("text"), 8, 1, 1, 1, prefixed = false), 1).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val fpSql = docs.select(col("doc_id"),
      expr("array_min(transform(sequence(1, greatest(length(text) - 7, 1))," +
        " i -> md5(substring(text, i, 8))))").as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fp == fpSql)
  }

  test("SQL registration: kernels callable from spark.sql") {
    TextFunctions.registerAll(spark)
    VectorFunctions.registerAll(spark)
    docs.createOrReplaceTempView("docs_t")
    val r = spark.sql(
      """SELECT doc_id, simhash64(split(text, ' ')) AS sig,
        |  element_at(md5_minhash_shingles(text, 8, 1, 1, 1), 1) AS fp
        |FROM docs_t ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(_.getString(1).length == 64))
    val v = spark.sql(
      "SELECT cosine_sim_f32(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").head()
    assert(math.abs(v.getDouble(0) - 1.0) < 1e-12)
  }

  test("SimHash64Md5 == the SQL bit-vote form") {
    val native = docs.select(col("doc_id"),
      TextFunctions.simhash64(split(col("text"), " ")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val sqlForm = docs.select(col("doc_id"),
      expr(graft.queries.SimhashSqlForms.spark).as("sig"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(native == sqlForm)
    assert(native.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
  }

  test("UnicodeNormalize folds decomposed forms; precomposed and ASCII pass through") {
    import spark.implicits._
    val rows = Seq(
      (1L, "cafe\u0301"),          // decomposed e + combining acute
      (2L, "caf\u00e9"),           // precomposed
      (3L, "a\u0300propos"),       // decomposed a + combining grave
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = rows.select(col("id"),
      TextFunctions.unicodeNormalize(col("s"), "NFC").as("n"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) == "caf\u00e9")
    assert(out(1).getString(1) == "caf\u00e9", "precomposed must be unchanged")
    assert(out(2).getString(1) == "\u00e0propos")
    assert(out(3).getString(1) == "plain ascii")
    assert(out(4).isNullAt(1), "null in, null out")
    // idempotence: normalizing twice equals once
    val twice = rows.filter(col("s").isNotNull).select(
      TextFunctions.unicodeNormalize(
        TextFunctions.unicodeNormalize(col("s"), "NFC"), "NFC").as("a"),
      TextFunctions.unicodeNormalize(col("s"), "NFC").as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(twice == 0L)
  }

  test("unicode_normalize resolves as a SQL function; bad form fails at analysis") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    val r = spark.sql("SELECT unicode_normalize('cafe' || 'e', 'NFKC') AS x").head
    assert(r.getString(0) == "cafee")
    val bad = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(bad.getMessage.contains("NFX"))
  }

  test("minhash_bands_u64: deterministic, band-counted, Jaccard-sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = (1 to 400).map(i => s"tok$i ").mkString
    val near = base + "tail one two"              // high Jaccard
    val far = (1000 to 1400).map(i => s"tok$i ").mkString // disjoint
    val df = Seq((1L, base), (2L, near), (3L, far), (4L, base))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.minhashBandsU64(
        TextFunctions.charShingleHashes(col("text"), 8), 18, 7).as("bands"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows.values.forall(_.length == 18), "one value per band")
    assert(rows(1L) == rows(4L), "identical docs -> identical bands (deterministic)")
    assert(rows(1L).zip(rows(2L)).exists { case (a, b) => a == b },
      "a near-duplicate must share at least one band (J~0.98 at r=7)")
    assert(!rows(1L).zip(rows(3L)).exists { case (a, b) => a == b },
      "disjoint docs must not collide in any band")
    // empty shingle set (null text filtered upstream; empty array here)
    val empty = Seq(Tuple1(Array.empty[Long])).toDF("sh")
      .select(TextFunctions.minhashBandsU64(col("sh"), 4, 2).as("b"))
    assert(empty.head.isNullAt(0), "empty set has no minima -> null")
    // two instances in ONE projection over a non-nullable child: the
    // codegen temps must not collide (freshName regression guard —
    // nullSafeExec emits unbraced code when the child is non-nullable)
    val two = Seq(Tuple1(Array(1L, 2L, 3L))).toDF("sh")
      .select(col("sh")) // non-nullable from the encoder
      .select(TextFunctions.minhashBandsU64(col("sh"), 4, 2).as("b1"),
        TextFunctions.minhashBandsU64(col("sh"), 8, 2, seed = 7L).as("b2"))
      .head
    assert(two.getSeq[Long](0).length == 4 && two.getSeq[Long](1).length == 8)
  }

  test("minhash_bands_u64 band-collision probability tracks J^r") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two docs sharing half their shingles: J ~ 1/3 -> per-band
    // collision ~ (1/3)^2 ~ 0.11 at r=2; with 64 bands expect ~7, and
    // essentially never 0 or 64 — a coarse distribution check that the
    // permutations are actually independent-ish
    val shared = (1 to 300).map(i => s"s$i ").mkString
    val a = shared + (1 to 300).map(i => s"a$i ").mkString
    val b = shared + (1 to 300).map(i => s"b$i ").mkString
    val rows = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.minhashBandsU64(
        TextFunctions.charShingleHashes(col("text"), 8), 64, 2).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hits = rows(1L).zip(rows(2L)).count { case (x, y) => x == y }
    assert(hits > 0 && hits < 32, s"collisions $hits/64 far from J^r expectation")
  }
}
