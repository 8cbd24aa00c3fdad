package graft.hnsw

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PqKernels
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn
import graft.store.AdcVectorStore

/** HNSW-over-PQ serving tier: compressed-space traversal + exact re-rank
  * on the sf0.001 embeddings table. */
class HnswPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private val cfg = BuildConfig(
    HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
    metric = "l2", seed = 42L)

  private lazy val model = HnswDistributed.build(vectors, cfg)
  private lazy val pq = HnswPq.fromModelCached(model, "spec-sf0.001")

  test("scalar encode/lut kernels agree with the Catalyst expression kernels") {
    val vecs = vectors.limit(32).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cb = pq.codebook
    vecs.foreach { case (_, v) =>
      val codeScalar = PqKernels.encodeArray(v, cb)
      val codeExpr = PqKernels.encode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), cb)
      assert(codeScalar == codeExpr)
      // LUT distance == direct ADC (same math, regrouped additions)
      val lut = PqKernels.lutFor(v, cb)
      val adcDirect = PqKernels.adc(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), codeScalar, cb)
      val adcViaLut = PqKernels.adcLut(lut, codeScalar)
      assert(math.abs(adcDirect - adcViaLut) <= 1e-9 * math.max(1.0, adcDirect),
        s"adc=$adcDirect lut=$adcViaLut")
    }
  }

  test("recall@10 >= 0.95 vs the exact L2 oracle (ef=128)") {
    val approx = HnswPq.search(queries, pq, vectors, k = 10, ef = 128)
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "l2")
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall")
  }

  test("re-rank restores exact order over the candidate set") {
    // every (qid, rank<=10) row's score must be the true squared L2 and
    // ranks ascending per query
    val rows = HnswPq.search(queries, pq, vectors, k = 10, ef = 128).collect()
    val vmap = vectors.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val qmap = queries.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    rows.foreach { r =>
      val (qid, id, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val exact = graft.store.Metrics.l2Sq(qmap(qid), vmap(id))
      assert(math.abs(score - exact) <= 1e-6 * math.max(1.0, exact))
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to byRank.length))
      assert(byRank.map(_.getDouble(2)).toSeq ==
        byRank.map(_.getDouble(2)).sorted.toSeq)
    }
  }

  test("serving model is codes-only: strictly smaller than the raw model") {
    // apples to apples: both payloads carry the same graph snapshot; the
    // difference is dim x 4 B raw vectors vs 8 B codes (+ a corpus-
    // independent codebook). Even at n=500 the compressed payload must
    // win; the per-vector gap is 32x at dim=64.
    def bytes(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close(); bos.size()
    }
    val pqBytes = bytes(pq)
    val rawBytes = bytes(model)
    assert(pqBytes < rawBytes, s"serving model $pqBytes B vs raw model $rawBytes B")
    // the per-vector state itself: codes map vs float-array map
    val codeBytes = bytes(pq.codes)
    val vecBytes = bytes(model.vectors)
    assert(codeBytes * 4L < vecBytes,
      s"codes $codeBytes B not <4x smaller than vectors $vecBytes B")
    // codebook is O(dim x 16 centroids) floats — corpus-independent
    assert(pq.codebook.map(s => s.map(_.length).sum).sum ==
      PqKernels.NumCentroids * 64)
  }

  test("AdcVectorStore: staged-query distances use the LUT, code side exact-decodes") {
    val vmap = vectors.limit(16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val cb = pq.codebook
    val codes = vmap.map { case (id, v) => (id, PqKernels.encodeArray(v, cb)) }
    val store = new AdcVectorStore(cb, codes)
    val (qid0, qvec) = vmap.head
    val q = store.prepareQueryWithId(-1L, qvec)
    codes.keys.foreach { id =>
      val d = store.evalDistance(q, id)
      val expected = PqKernels.adcLut(PqKernels.lutFor(qvec, cb), codes(id))
      assert(d == expected)
      // symmetric lookup (v, q) resolves the staged side too
      assert(store.evalDistance(id, q) == expected)
    }
    // self-distance in ADC space is the quantization residual: small
    // but nonzero in general; must be exactly the code-reconstruction
    // distance for the query's own id
    val dSelf = store.evalDistance(q, qid0)
    assert(dSelf >= 0.0 && dSelf < 10.0)
  }

  test("AdcVectorStore.insert quantizes: served at code precision afterwards") {
    val vmap = vectors.limit(8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val cb = pq.codebook
    val codes = vmap.map { case (id, v) => (id, PqKernels.encodeArray(v, cb)) }
    val store = new AdcVectorStore(cb, codes)
    val newId = 9999L
    val newVec = vmap.head._2.map(_ + 0.01f)
    store.insert(store.prepareQueryWithId(newId, newVec))
    // a fresh query must see the inserted point at CODE precision —
    // identical to how it would rank after a restart from persisted codes
    val probe = store.prepareQueryWithId(-1L, vmap.head._2)
    val got = store.evalDistance(probe, newId)
    val expected = PqKernels.adcLut(
      PqKernels.lutFor(vmap.head._2, cb), PqKernels.encodeArray(newVec, cb))
    assert(got == expected)
    assert(got != graft.store.Metrics.l2Sq(vmap.head._2, newVec),
      "inserted point must not serve raw-precision distances")
  }
}
