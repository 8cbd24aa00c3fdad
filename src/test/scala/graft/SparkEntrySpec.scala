package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog contract checks: the driver consumes `queries`/`oracleSql` as
  * flat maps built by ++-merging the per-module maps — a duplicate name
  * across modules would SILENTLY shadow an operator (the merged map keeps
  * only the last), and an oracle without a query is dead weight the
  * driver would flag as a missing dump. Cheap meta-assertions, no Spark
  * session needed. */
class SparkEntrySpec extends AnyFunSuite {

  private val moduleDefs: Seq[(String, Set[String])] = Seq(
    "Relational" -> graft.queries.Relational.defs.keySet,
    "Relational2" -> graft.queries.Relational2.defs.keySet,
    "Events" -> graft.queries.Events.defs.keySet,
    "Text" -> graft.queries.Text.defs.keySet,
    "Vector" -> graft.queries.Vector.defs.keySet,
    "Hnsw" -> graft.queries.Hnsw.defs.keySet,
    "DedupQueries" -> graft.queries.DedupQueries.defs.keySet,
    "Curation" -> graft.queries.Curation.defs.keySet,
    "LayoutQueries" -> graft.queries.LayoutQueries.defs.keySet,
    "Multimodal" -> graft.operators.Multimodal.defs.keySet)

  test("no query name is shadowed by the module merge") {
    val all = moduleDefs.flatMap { case (m, ks) => ks.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate catalog names across modules: ${dups.map { case (k, ms) =>
        s"$k in ${ms.map(_._2).mkString("/")}" }.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle has a backing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("declared rows-only queries are the only ones without oracles") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the intentional rows-only set: recall measurements in the ANN
    // regime (no SQL engine can run the index)
    val declared = Set("h_recall_ann", "h_recall_pq", "h_recall_routed",
      "h_recall_routed_pq", "h_recall_routed_pq_solo", "h_merged_audit",
      "v_recall_ivf",
      "v_recall_pq", "v_recall_ivfpq", "v_recall_sq8", "v_recall_bq",
      "v_recall_rproj",
      "e_hll_users",
      // recall-targeted LSH banding regime: output is approximate by
      // design; the parity regime (v_neardup_lsh) carries the hash oracle
      "v_neardup_lsh_recall",
      // SemDeDup production regime: Lloyd-trained centroids aren't
      // SQL-expressible; the seed-centroid regime (v_semdedup_pairs)
      // carries the hash-parity oracle for the same pair pipeline
      "v_semdedup",
      // BPE training: iterated corpus-state recursion (merge round k
      // rewrites the input of round k+1) is not SQL-expressible;
      // BpeTrainSpec pins the merge table equal rank-for-rank to an
      // independent single-node reference on the real corpus
      "t_bpe_merges",
      // Count-Min audit: the xxhash64 cell layout is not
      // SQL-reproducible; the row self-audits (n_under must be 0) and
      // CountMinSpec + the catalog floor test pin the bounds
      "t_cms_tokens",
      // GK quantile-sketch audit: DuckDB's approx sketch is a
      // different algorithm, values can't hash-match; the row carries
      // its own rank-space audit (SketchSpec floor)
      "e_value_sketch_quantiles",
      // routed drift audit: self-audited occupancy-vs-batch shares
      // over the trained (non-SQL-expressible) router; semantics
      // pinned by HnswRoutedSpec (calm tail ~0, planted shift >5000 bp)
      "h_routed_drift",
      // cold-tax watch row: self-carried wall-clock timings of a fresh
      // build's warmed+probed first serve vs steady — inherently not
      // SQL-expressible; the regression class is judged round-over-
      // round from the recorded bp, the rung pins the ≤1.5x bar
      "h_warm_first_serve")
    val undeclared = noOracle -- declared
    assert(undeclared.isEmpty,
      s"queries silently missing an oracle (add one or declare here): $undeclared")
  }

}
