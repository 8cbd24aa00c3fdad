package graft.hnsw

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.store.ParquetGraphStore

/** Tombstone COMPACTION invariants (the links-out pass): the soft-delete
  * exclusion set folded out of the graph must leave a clean, degree-
  * bounded graph that serves the SAME results with no exclusion set —
  * on the broadcast model and on the durable store, where the pass is
  * threshold-triggered. */
class TombstoneCompactionSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val deleted = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))

  // exact regime: generous beam, so pre/post comparisons are exact-set
  private val cfg = BuildConfig(
    HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
    metric = "cosine", seed = 42L, seedBatch = 64, maxBatch = 128)

  private lazy val model = HnswDistributed.build(vectors, cfg)
  private lazy val compacted = HnswDistributed.compactModel(model, deleted)
  private lazy val delSet = deleted.collect().map(_.getLong(0)).toSet

  test("compacted graph contains no tombstoned vertex or edge") {
    (0 until compacted.snapshot.numLayers).foreach { lc =>
      compacted.snapshot.layerMap(lc).foreach { case (src, (dsts, _)) =>
        assert(!delSet.contains(src), s"tombstoned src $src survived at layer $lc")
        dsts.foreach(d => assert(!delSet.contains(d),
          s"edge $src -> $d points at a tombstoned vertex (layer $lc)"))
      }
    }
    assert(compacted.vectors.keySet.intersect(delSet).isEmpty)
  }

  test("degree bounds hold after the bridge-and-trim pass") {
    (0 until compacted.snapshot.numLayers).foreach { lc =>
      val bound = cfg.params.getMMax(lc)
      compacted.snapshot.layerMap(lc).foreach { case (src, (dsts, _)) =>
        assert(dsts.length <= bound,
          s"vertex $src layer $lc degree ${dsts.length} > $bound")
      }
    }
  }

  test("every surviving vertex keeps a row (none silently dropped)") {
    val before = (0 until model.snapshot.numLayers).flatMap(lc =>
      model.snapshot.layerMap(lc).keysIterator.filterNot(delSet.contains).map((_, lc))).toSet
    val after = (0 until compacted.snapshot.numLayers).flatMap(lc =>
      compacted.snapshot.layerMap(lc).keysIterator.map((_, lc))).toSet
    assert(after == before)
  }

  test("entry point survives or is repaired deterministically") {
    val ep = compacted.snapshot.entryPoint
    assert(ep.nonEmpty)
    assert(!delSet.contains(ep.get.point))
    // repaired or kept, the entry must sit on the graph's top layer
    assert(ep.get.layer == compacted.snapshot.numLayers - 1)
  }

  test("compaction contract: plain search == searchExcluding pre-compaction") {
    val before = HnswDistributed.searchExcluding(queries, model, deleted, 10)
      .select(col("qid"), col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val after = HnswDistributed.search(queries, compacted, 10)
      .select(col("qid"), col("id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(after == before)
  }

  test("durable store: below threshold is a no-op, above it compacts and clears") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val store = new ParquetGraphStore(spark, dir)
    store.save(model.snapshot)

    store.addTombstones(deleted)
    val nDel = deleted.count().toDouble
    val n0 = store.linksTable.filter(col("layer") === 0).count().toDouble

    // threshold above the actual ratio -> refuse (soft-delete serving
    // stays cheaper than the O(graph) rewrite)
    assert(!store.compactTombstones(vectors, cfg.metric, cfg.params,
      threshold = nDel / n0 + 0.1))
    assert(store.tombstones.count() == nDel.toLong)

    // threshold at/below the ratio -> compact, clear the set
    assert(store.compactTombstones(vectors, cfg.metric, cfg.params,
      threshold = nDel / n0 / 2))
    assert(store.tombstones.count() == 0L)
    assert(!store.compactTombstones(vectors, cfg.metric, cfg.params,
      threshold = 0.0)) // nothing left to fold

    // the durable pass lands the same graph as the model-level pass
    val snap = store.loadSnapshot()
    assert(snap.entryPoint == compacted.snapshot.entryPoint)
    assert(snap.numLayers == compacted.snapshot.numLayers)
    (0 until snap.numLayers).foreach { lc =>
      val a = snap.layerMap(lc); val b = compacted.snapshot.layerMap(lc)
      assert(a.keySet == b.keySet, s"layer $lc vertex set differs")
      a.foreach { case (src, (dsts, dists)) =>
        assert(dsts.toList == b(src)._1.toList, s"layer $lc vertex $src links differ")
        assert(dists.toList == b(src)._2.toList)
      }
    }
  }
}
