package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t_pii_redact: deterministic PII injection + detect + redact. The
  * DuckDB oracle hash-proves dialect agreement on the full redacted
  * text; this spec pins the closed-form contract so a corpus or
  * pattern change surfaces here first, with a readable failure.
  */
class PiiRedactSpec extends SparkSpec {

  private lazy val out =
    graft.SparkEntry.queries("t_pii_redact")(spark, sfDir).cache()

  test("injected PII is found at the closed-form counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(out.count() == docs.count())
    // one source email per doc, a second on even ids; one phone; one IP
    val off = out.filter(
      col("n_email") =!= when(col("doc_id") % 2 === 0, 2L).otherwise(1L) ||
        col("n_phone") =!= 1L || col("n_ip") =!= 1L)
    assert(off.count() == 0L)
  }

  test("redaction is total: no pattern survives in the redacted text") {
    val leftover = out.filter(
      col("redacted").rlike(Text.EmailRegex) ||
        col("redacted").rlike(Text.PhoneRegex) ||
        col("redacted").rlike(Text.Ipv4Regex))
    assert(leftover.count() == 0L)
    // and every placeholder is present the right number of times
    val badPh = out.filter(
      size(split(col("redacted"), "<EMAIL>", -1)) - 1 =!= col("n_email") ||
        size(split(col("redacted"), "<PHONE>", -1)) - 1 =!= col("n_phone") ||
        size(split(col("redacted"), "<IP>", -1)) - 1 =!= col("n_ip"))
    assert(badPh.count() == 0L)
  }

  test("redaction never touches the original document text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val broken = out.join(docs, "doc_id")
      .filter(!col("redacted").startsWith(col("text")))
    assert(broken.count() == 0L)
  }
}
