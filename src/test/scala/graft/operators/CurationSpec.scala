package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Invariants of the curation catalog queries over the sf0.001 testdata
  * (hash correctness vs DuckDB is the driver's gate; these pin the
  * operator-level contracts). */
class CurationSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("dup groups: every member pairs with someone; labels are group minima") {
    val pairs = graft.SparkEntry.queries("d_neardup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = q("d_dup_groups").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(groups.keySet == inPairs)
    // the label is a member of its own group and the minimum of it
    groups.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keySet.min == comp)
    }
    // both endpoints of every pair share a component
    pairs.foreach { case (a, b) => assert(groups(a) == groups(b)) }
  }

  test("dedup resolve: n_kept + n_dropped == n_input; one survivor per group") {
    val r = q("d_dedup_resolve").collect().head
    val (nInput, nGroups, nDropped, nKept) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nKept + nDropped == nInput)
    val sizes = q("d_dup_groups").groupBy(col("comp_id"))
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(1))
    assert(sizes.length.toLong == nGroups)
    assert(sizes.map(_ - 1).sum == nDropped) // keep 1 per group
  }

  test("contamination is symmetric evidence: every flagged train doc shares a shingle") {
    val hits = q("t_contamination").collect()
    hits.foreach { r =>
      assert(r.getLong(0) % 20 != 0)      // train docs only
      assert(r.getLong(1) >= 1)           // at least one shared shingle
      assert(r.getLong(2) >= 1)           // with at least one eval doc
    }
  }

  test("stratified sampling is deterministic and respects per-language rates") {
    val a = q("s_sample_mix").collect().map(_.toSeq)
    val b = q("s_sample_mix").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // md5-keyed: no RNG state anywhere
    q("s_sample_mix").collect().foreach { r =>
      val (lang, n, k) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(k <= n)
      // 16-bit md5 key < threshold: expected rate en=.25, zh=.75, else .5;
      // loose binomial bound at these tiny strata
      val rate = lang match { case "en" => 0.25; case "zh" => 0.75; case _ => 0.5 }
      assert(math.abs(k.toDouble / n - rate) < 0.35, s"$lang: $k/$n vs $rate")
    }
  }

  test("shard packing: shards partition each (lang, source) stream in order") {
    val rows = q("s_pack_shards").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, shards) =>
      val ids = shards.map(_._2).sorted.toList
      assert(ids.head == 0L)
      assert(ids == (0L until ids.length.toLong).toList) // contiguous
    }
    // totals conserve the corpus
    val packed = rows.map(_._3).sum
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(packed == nDocs)
  }
}
