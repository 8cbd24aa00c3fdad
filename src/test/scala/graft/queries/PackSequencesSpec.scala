package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Sequence-packing invariants beyond the hash oracle: token
  * conservation (no token lost or double-counted across sequence
  * boundaries), exact fill of every non-tail sequence, and a dense
  * gap-free sequence id space. */
class PackSequencesSpec extends SparkSpec {

  private lazy val out = SparkEntry.queries("s_pack_sequences")(spark, sfDir)
    .collect()

  private lazy val totalToks = spark.read.parquet(s"$sfDir/documents.parquet")
    .filter(col("text").isNotNull)
    .select(size(split(col("text"), " ")).cast("long").as("n"))
    .agg(sum(col("n"))).head.getLong(0)

  test("token conservation: sequence fills sum to the corpus token count") {
    val packed = out.map(r => r.getLong(r.fieldIndex("n_tokens"))).sum
    assert(packed == totalToks, s"packed $packed vs corpus $totalToks")
  }

  test("every sequence but the last is exactly full; the tail holds the remainder") {
    val fills = out.sortBy(_.getLong(0)).map(r => r.getLong(r.fieldIndex("n_tokens")))
    assert(fills.init.forall(_ == 256L))
    val rem = totalToks % 256
    assert(fills.last == (if (rem == 0) 256L else rem))
  }

  test("sequence ids are dense from 0 and doc spans chain without gaps") {
    val ids = out.map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L)
    // consecutive sequences chain: the next sequence starts at the doc
    // straddling the cut (first_doc == last_doc of seq i) or at a LATER
    // doc_id — never earlier, and never skipping back. (doc_id density
    // is a corpus property, not a packing invariant, so the only
    // orderings asserted are the ones packing itself guarantees.)
    val sorted = out.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        val lastA = a.getLong(a.fieldIndex("last_doc"))
        val firstB = b.getLong(b.fieldIndex("first_doc"))
        assert(firstB >= lastA,
          s"seq ${a.getLong(0)}->${b.getLong(0)}: last_doc $lastA vs first_doc $firstB")
      case _ =>
    }
  }
}
