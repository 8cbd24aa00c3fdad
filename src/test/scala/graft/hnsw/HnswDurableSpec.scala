package graft.hnsw

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn
import graft.store.ParquetGraphStore

/** The beyond-broadcast durable build: micro-batches search the current
  * persisted graph (upper layers broadcast, layer 0 via frontier joins)
  * and merge through connectBidirMerge -> ParquetGraphStore.mergeBatch —
  * no driver-side vector map. Reference analog: the pg-backed e2e build
  * (graph_pg.rs:288-325). */
class HnswDurableSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  // Small seed/batch so the run exercises several durable micro-batches.
  private val cfg = BuildConfig(
    HnswParams.standard(efConstruction = 64, efSearch = 64, m = 16),
    metric = "cosine", seed = 42L, seedBatch = 64, maxBatch = 128)

  private lazy val store: ParquetGraphStore = {
    val path = Files.createTempDirectory("graft_durable_spec_").toString
    HnswDurable.build(vectors, path, cfg)
  }

  test("durable build: every vector has a layer-0 neighborhood; degree bounds hold") {
    val links = store.linksTable.cache()
    val n = vectors.count()
    assert(links.filter(col("layer") === 0).count() == n)
    val maxDeg = links
      .select(col("layer"), size(col("links")).as("deg"))
      .groupBy(col("layer")).agg(max(col("deg")).as("maxDeg"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    maxDeg.foreach { case (lc, deg) =>
      assert(deg <= cfg.params.getMMax(lc), s"layer $lc degree $deg")
    }
    assert(store.getEntryPoint.isDefined)
    links.unpersist()
  }

  test("durable build reaches exact top-k at generous ef (oracle parity)") {
    val got = HnswDurable.search(store, vectors, queries, k = 10, ef = 128)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "cosine")
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, s"missing=${(exact -- got).size} extra=${(got -- exact).size}")
  }

  test("durable build recall parity with the in-memory broadcast build (ANN regime)") {
    val annK = 10
    val exact = ExactKnn.search(queries, vectors, annK, "cosine")
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val memModel = HnswDistributed.build(vectors, cfg)
    def recall(hits: Set[(Long, Long)]): Double =
      (hits intersect exact).size.toDouble / exact.size

    val memRecall = recall(HnswDistributed.search(queries, memModel, annK)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val durRecall = recall(HnswDurable.search(store, vectors, queries, annK, ef = 64)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // The frontier beam explores a superset of the sequential beam per
    // round, so the durable graph should not lose recall.
    assert(durRecall >= memRecall - 0.02, s"durable=$durRecall mem=$memRecall")
    assert(durRecall >= 0.95, s"durable recall=$durRecall")
  }

  test("ingest rejects ids already present in the graph") {
    val ex = intercept[IllegalArgumentException] {
      HnswDurable.ingest(store, vectors.limit(5), vectors, cfg)
    }
    assert(ex.getMessage.contains("already present"))
  }

  test("ingest refuses to re-seed a store whose links survived but entry was lost") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_durable_noentry_").toString
    val s2 = HnswDurable.build(vectors.limit(100), dir, cfg)
    assert(s2.getEntryPoint.isDefined)
    // simulate a crash that destroyed only the entry table
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(); ()
    }
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("entry"))
      .foreach(deleteRec)
    val fresh = new graft.store.ParquetGraphStore(spark, dir)
    assert(fresh.getEntryPoint.isEmpty)
    val more = vectors.filter(col("id") >= 100).limit(10)
    val ex = intercept[IllegalStateException] {
      HnswDurable.ingest(fresh, more, vectors, cfg)
    }
    assert(ex.getMessage.contains("refusing to re-seed"))
    // the graph itself must be untouched
    assert(fresh.linksTable.filter(col("layer") === 0).count() == 100)
  }

  test("durable self-match: every inserted vector finds itself at k=1") {
    val selfHits = HnswDurable.search(store, vectors,
        vectors.select(col("id").as("qid"), col("vec").as("qvec")),
        k = 1, ef = 64)
      .filter(col("rank") === 1 && col("qid") === col("id") && col("dist") <= 1e-6)
      .count()
    assert(selfHits == vectors.count())
  }
}
