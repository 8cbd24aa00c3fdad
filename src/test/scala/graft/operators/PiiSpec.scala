package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pii operator on arbitrary data (not the catalog's injected corpus):
  * counts, redaction totality, order-dependence, and the stateless
  * streaming claim (the same expressions drive a Structured Stream).
  */
class PiiSpec extends SparkSpec {

  private val samples = Seq(
    (1L, "write to alice.smith+work@example-corp.io today"),
    (2L, "call 555-867-5309 or 555-000-1111, not 1234-555-0000x"),
    (3L, "server at 10.0.42.7 talked to 10.255.1.254; 192.168.0.1 is out of scope"),
    (4L, "a@b.co and c_d%e@f.org; ping 10.1.2.3 then dial 555-123-4567"),
    (5L, "nothing sensitive here"),
    (6L, ""))

  private def df = {
    import spark.implicits._
    samples.toDF("id", "text")
  }

  test("scan counts each category independently") {
    val got = Pii.scan(df, "text").orderBy(col("id"))
      .select(col("n_email"), col("n_phone"), col("n_ip"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L),
      (0L, 2L, 0L), // 1234-555-0000x fails the \b word boundary
      (0L, 0L, 2L), // 192.168.* is outside the 10.* rule by design
      (2L, 1L, 1L),
      (0L, 0L, 0L),
      (0L, 0L, 0L)))
  }

  test("redaction is total and keeps schema/other columns intact") {
    val red = Pii.redact(df, "text")
    assert(red.columns.toSeq == Seq("id", "text"))
    val leftover = red.filter(
      Pii.Rules.map(r => col("text").rlike(r.regex)).reduce(_ || _))
    assert(leftover.count() == 0L)
    val r4 = red.filter(col("id") === 4L).head.getString(1)
    assert(r4 == "<EMAIL> and <EMAIL>; ping <IP> then dial <PHONE>")
  }

  test("overlapping categories: counts are stage-wise, so n_<rule> always equals placeholders") {
    import spark.implicits._
    // the phone digits sit INSIDE a valid email local part: the email
    // rule (first in redaction order) consumes them, so stage-wise
    // counting reports 1 email / 0 phones — matching the placeholders
    // in the output, which is the invariant an auditor reconciles
    val odf = Seq((1L, "dial 555-123-4567@corp.net now")).toDF("id", "text")
    val got = Pii.scan(odf, "text")
      .select(col("n_email"), col("n_phone"), col("n_ip")).head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((1L, 0L, 0L)))
    val red = Pii.redact(odf, "text").head.getString(1)
    assert(red == "dial <EMAIL> now")
  }

  test("scan and redact survive dotted column names") {
    import spark.implicits._
    val ddf = Seq((1L, "a@b.co")).toDF("id", "payload.text")
    val s1 = Pii.scan(ddf, "payload.text")
    assert(s1.columns.toSeq == Seq("id", "payload.text", "n_email", "n_phone", "n_ip"))
    assert(s1.head.getLong(2) == 1L)
    assert(Pii.redact(ddf, "payload.text").head.getString(1) == "<EMAIL>")
  }

  test("the operator is stateless per row: a stream redacts identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pii_s_").toString
    df.select(to_json(struct(col("id"), col("text"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, text STRING")
    val stream = Pii.redact(
      graft.sources.Ingest.streamJsonl(spark, dir, schema), "text")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = stream.writeStream.outputMode("append").foreachBatch {
      (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.select(col("id"), col("text")).as[(Long, String)].collect(); ()
    }.start()
    try q.processAllAvailable() finally q.stop()
    val batch = Pii.redact(df, "text")
      .select(col("id"), col("text")).as[(Long, String)].collect().toSeq
    assert(seen.sortBy(_._1) == batch.sortBy(_._1))
  }
}
