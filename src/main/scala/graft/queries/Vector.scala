package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.ExactKnn

/** Vector-engine queries: the reference capability surface (brute-force
  * kNN = LinearDb, Hamming codes, similarity dedup) over the `embeddings`
  * table. Results expose only integer ids/ranks (and integer Hamming
  * distances) — float scores stay internal so the DuckDB oracle comparison
  * is exact.
  */
object Vector {
  private def t(s: SparkSession, dir: String) = Tables(s, dir, "embeddings")

  /** Query subset: every 25th vector (20 queries at sf0.01, 80 at sf0.1). */
  private def queriesDf(s: SparkSession, dir: String) =
    t(s, dir).filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def vectorsDf(s: SparkSession, dir: String) =
    t(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def knn(s: SparkSession, dir: String, k: Int, metric: String): DataFrame =
    ExactKnn.search(queriesDf(s, dir), vectorsDf(s, dir), k, metric)
      .select(col("qid"), col("id"), col("rank"))
      .orderBy(col("qid"), col("rank"))

  /** Memoized exact brute-force top-k `(qid, id, rank)` TRUTH TABLE for
    * the recall-audit rows (v_recall_*, h_recall_*) and the dense side
    * of t_hybrid_rrf: seven catalog rows consume the same exact answer,
    * so the O(n x q) brute-force pipeline runs once per (dir, metric)
    * and lands in `one_time_s` via BuildLedger — the bm25Scores sharing
    * pattern (and the semdedup_recall_audit adjudication) applied to the
    * whole family. Parquet-path memo, never a live DataFrame. The
    * v_knn_* serving rows deliberately do NOT use this: they MEASURE
    * the brute-force path, hash-checked vs DuckDB. */
  private val truthCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def exactTruthIds(s: SparkSession, dir: String,
                                     metric: String, k: Int): DataFrame = {
    val path = truthCache.computeIfAbsent(s"$dir|$metric|$k", { _ =>
      graft.BuildLedger.timed(s"exact_truth_$metric") {
        val out = graft.TempDirs.create("graft_truth_")
        ExactKnn.search(queriesDf(s, dir), vectorsDf(s, dir), k, metric)
          .select(col("qid"), col("id"), col("rank"))
          .write.mode("overwrite").parquet(out)
        out
      }
    })
    s.read.parquet(path)
  }

  /** Memoized random-projection column (the persisted `encode` output a
    * serving workload reads — the operator's own documented contract):
    * projecting the corpus is a one-time layout cost like the PQ/SQ8
    * code columns, ledgered so the bench attributes it to one_time_s.
    * The 32-wide literal-dot projection is also a LARGE codegen unit —
    * paying its JIT once here instead of per serving run. */
  private val rprojCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def rprojProjections(s: SparkSession, dir: String, seed: Long,
      m: graft.operators.RandomProjection.RpModel): DataFrame = {
    // key every model-distinguishing parameter (the truthCache rule):
    // a same-dir call with a different seed must not read stale columns
    val path = rprojCache.computeIfAbsent(
      s"$dir|${m.inDim}|${m.outDim}|$seed", { _ =>
      graft.BuildLedger.timed("rproj_encode") {
        val out = graft.TempDirs.create("graft_rproj_")
        graft.operators.RandomProjection.encode(vectorsDf(s, dir), m)
          .write.mode("overwrite").parquet(out)
        out
      }
    })
    s.read.parquet(path)
  }

  /** Memoized trained quantizer models (round-20): Pq/Ivf/Sq8 training
    * is a deterministic one-time BUILD (driver Lloyd over a collected
    * sample — 1-2 Spark jobs plus up to ~0.5 s of single-thread driver
    * CPU) that v_knn_ivf, v_recall_ivf, v_recall_pq, v_recall_sq8 and
    * v_recall_ivfpq each re-ran on every serve. Same discipline as
    * exactTruthIds/rprojProjections: keyed on every model-distinguishing
    * parameter, ledgered to one_time_s. Models are tiny driver objects
    * (<= 64 KB), so the memo holds them directly. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def memoModel[A <: AnyRef](key: String, label: String)(f: => A): A =
    modelCache.computeIfAbsent(key, _ => graft.BuildLedger.timed(label)(f))
      .asInstanceOf[A]

  /** Shared recall-report shape (the h_recall_ann pattern): intersect an
    * approximate top-k with the exact one, emit a 1-row summary with
    * recall in basis points. */
  private def recallReport(s: SparkSession, qs: DataFrame,
                           approx: DataFrame, exact: DataFrame): DataFrame = {
    // ONE job for (expected, hits) instead of intersect.count + count
    // (round-19): hit flags left-joined onto the exact rows and
    // aggregated in the same pass — the approx pipeline and the exact
    // scan each run exactly once, no cache pin needed. Equality with the
    // old intersect form: both sides are top-k lists (unique (qid, id)
    // per construction) and approx is made distinct defensively, so the
    // flag sum is the intersect cardinality and count(1) over exact is
    // the old exactIds.count().
    // n_queries from the SAME aggregate (round-20, one job fewer): the
    // exact side is brute-force top-k over the identical queries frame,
    // so every qid appears in it (a non-empty corpus yields >= 1 row per
    // query) and countDistinct(qid) there equals qs.count().
    val row = exact.select(col("qid"), col("id"))
      .join(approx.select(col("qid"), col("id")).distinct()
        .withColumn("h", lit(1L)), Seq("qid", "id"), "left")
      .agg(count(lit(1)).as("expected"),
        sum(coalesce(col("h"), lit(0L))).as("hits"),
        countDistinct(col("qid")).as("nq"))
      .head()
    val expected = row.getLong(0)
    val hits = row.getLong(1)
    val nq = row.getLong(2)
    import s.implicits._
    Seq((nq, expected, hits, hits * 10000L / expected))
      .toDF("n_queries", "n_expected", "n_hit", "recall_bp")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact kNN, three metrics — the LinearDb brute-force path
    // (reference: src/linear_db.rs:27-35) and the recall oracle for ANN.
    "v_knn_cosine" -> ((s, dir) => knn(s, dir, 10, "cosine")),
    "v_knn_l2" -> ((s, dir) => knn(s, dir, 10, "l2")),
    "v_knn_dot" -> ((s, dir) => knn(s, dir, 10, "dot")),

    // u64 bit-code Hamming kNN — the reference's native representation
    // (lazy_memory_store.rs:49-54): sign-pack each embedding to 64 bits,
    // rank by bit_count(xor). Integer distances are exactly comparable.
    "v_knn_hamming" -> ((s, dir) => {
      val q = queriesDf(s, dir).select(col("qid"), signPack64(col("qvec")).as("qvec"))
      val v = vectorsDf(s, dir).select(col("id"), signPack64(col("vec")).as("vec"))
      ExactKnn.search(q, v, 5, "hamming")
        .select(col("qid"), col("id"), col("score").cast("int").as("hamming"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Similarity self-join (near-dup pair detection) above a cosine
    // threshold — brute force here as the correctness oracle; the scale
    // path is the LSH-bucketed variant in graft.operators.Dedup.
    "v_neardup_pairs" -> ((s, dir) => {
      // repartition the STREAMED side: this non-equi self-join plans as
      // BroadcastNestedLoop, whose parallelism is the streamed side's
      // partition count — a small parquet scan arrives as ONE partition
      // and would run the O(n²) cosine filter on one core
      val a = t(s, dir).select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = t(s, dir).select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
      a.join(b, col("a_id") < col("b_id"))
        .filter(cosineSim(col("a_vec"), col("b_vec")) >= 0.4)
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // IVF inverted-list kNN in the exhaustive regime (nProbe = nCells):
    // every cell probed => identical to exact search => shares the exact
    // oracle. The ANN regime (nProbe << nCells) is measured by IvfSpec.
    "v_knn_ivf" -> ((s, dir) => {
      import graft.operators.Ivf
      val vecs = vectorsDf(s, dir)
      val model = memoModel(s"$dir|ivf|cosine|16|11", "ivf_train")(
        Ivf.train(vecs, nCells = 16, metric = "cosine", seed = 11L))
      Ivf.search(queriesDf(s, dir), vecs, model, k = 10, nProbe = 16)
        .select(col("qid"), col("id"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF recall in the true ANN regime (nProbe = 8 of 16 cells — half
    // the scan cost) vs the exact in-Spark oracle — the h_recall_ann
    // pattern. Rows-only check (DuckDB can't run the trained quantizer);
    // IvfSpec asserts the recall floor for this exact regime.
    "v_recall_ivf" -> ((s, dir) => {
      import graft.operators.Ivf
      val vecs = vectorsDf(s, dir)
      val qs = queriesDf(s, dir)
      val model = memoModel(s"$dir|ivf|cosine|16|11", "ivf_train")(
        Ivf.train(vecs, nCells = 16, metric = "cosine", seed = 11L))
      recallReport(s, qs,
        Ivf.search(qs, vecs, model, k = 10, nProbe = 8),
        exactTruthIds(s, dir, "cosine", 10))
    }),

    // Product-quantization recall: 64-dim floats compressed to one long
    // (16 subspaces x 4-bit codes), coarse ADC top-100 over the code
    // column + exact L2 re-rank — the compressed-scan member of the ANN
    // family (at 100 TB the code column is ~3% of the raw embedding
    // bytes). Rows-only check (the trained codebook is not expressible
    // in SQL); recall floor asserted by PqSpec.
    "v_recall_pq" -> ((s, dir) => {
      import graft.operators.Pq
      val vecs = vectorsDf(s, dir)
      val qs = queriesDf(s, dir)
      val model = memoModel(s"$dir|pq|13", "pq_train")(
        Pq.train(vecs, seed = 13L))
      recallReport(s, qs,
        Pq.search(qs, vecs, model, k = 10, candidates = 100),
        exactTruthIds(s, dir, "l2", 10))
    }),

    // Scalar-quantization recall: int8 affine codes (4x compression, no
    // codebook in the scan loop), coarse ADC top-100 + exact re-rank —
    // the third compressed-scan family member beside PQ and IVF-PQ.
    // Rows-only check (the min/max model is data-derived); Sq8Spec
    // asserts the 0.95 recall floor for this exact regime.
    "v_recall_sq8" -> ((s, dir) => {
      import graft.operators.Sq8
      val vecs = vectorsDf(s, dir)
      val qs = queriesDf(s, dir)
      val model = memoModel(s"$dir|sq8", "sq8_train")(Sq8.train(vecs))
      recallReport(s, qs,
        Sq8.search(qs, vecs, model, k = 10, candidates = 100),
        exactTruthIds(s, dir, "l2", 10))
    }),

    // Random-projection (Johnson-Lindenstrauss) recall: 64 -> 32 dims
    // through deterministic ±1 directions (2x smaller scan column, 2x
    // cheaper distances, and — unlike PQ/SQ8/IVF — NO training pass:
    // the matrix re-derives from a seed, so a refreshing corpus never
    // re-fits). Coarse projected-L2 top-200 + exact re-rank. The corpus
    // is RP's worst ranking case (near-uniform => all distances in one
    // tight shell), so this row's recall honestly reads below the
    // quantizing tiers — see RandomProjectionSpec's planted-cluster
    // twin for the regime where JL shines. Rows-only check.
    "v_recall_rproj" -> ((s, dir) => {
      import graft.operators.RandomProjection
      val vecs = vectorsDf(s, dir)
      val qs = queriesDf(s, dir)
      val m = RandomProjection.model(inDim = 64, outDim = 32, seed = 29L)
      recallReport(s, qs,
        RandomProjection.search(qs, vecs, m, k = 10, candidates = 200,
          precomputedProjections = Some(rprojProjections(s, dir, 29L, m))),
        exactTruthIds(s, dir, "l2", 10))
    }),

    // IVF-PQ — the canonical beyond-memory serving compose (coarse
    // quantizer prunes to nProbe/nCells of the corpus, PQ codes compress
    // the scan 32x, exact re-rank touches only C rows per query). Rows-
    // only check; floor asserted by PqSpec.
    "v_recall_ivfpq" -> ((s, dir) => {
      import graft.operators.{Ivf, Pq}
      val vecs = vectorsDf(s, dir)
      val qs = queriesDf(s, dir)
      val ivfModel = memoModel(s"$dir|ivf|l2|16|11", "ivf_train")(
        Ivf.train(vecs, nCells = 16, metric = "l2", seed = 11L))
      val pqModel = memoModel(s"$dir|pq|13", "pq_train")(
        Pq.train(vecs, seed = 13L))
      recallReport(s, qs,
        Pq.searchIvfPq(qs, vecs, ivfModel, pqModel,
          k = 10, nProbe = 8, candidates = 100),
        exactTruthIds(s, dir, "l2", 10))
    }),

    // Exact vector dedup: hash-groupBy on the full embedding.
    "v_dedup_exact" -> ((s, dir) => {
      t(s, dir).agg(
        count(lit(1)).as("n_vectors"),
        countDistinct(col("embedding")).as("n_distinct"))
    }),

    // Per-label class centroids — the clustering/IVF-bootstrap shape as a
    // first-class exact operator. Per-dimension sums integerized to
    // micro-units (floor(x*1e6) as long — float->double widening and the
    // double multiply are IEEE-exact on both engines) so the distributed
    // sum is order-independent; the mean is the ONE division, in doubles.
    // Plan: posexplode -> partial (map-side) agg -> one shuffle of
    // O(labels x dims x partitions) rows, the canonical dense-vector
    // aggregation at any scale.
    // k-means cluster assignment against the deterministic md5-pick seed
    // centroids — the Lloyd ASSIGN step as an exact, oracle-checkable
    // operator (broadcast centroids inside the codegen'd l2 kernel: one
    // scan, zero shuffle; ties to the smaller cluster id). The full
    // iterated Lloyd loop is KMeans.train, spec-gated by KMeansSpec
    // (the trained centroids aren't expressible in one SQL query).
    "v_kmeans_assign" -> ((s, dir) => {
      import graft.operators.KMeans
      val vecs = vectorsDf(s, dir)
      val centroids = KMeans.initCentroids(vecs, k = 8)
      KMeans.assign(vecs, centroids)
        .select(col("id").as("vec_id"), col("cid"))
        .orderBy(col("vec_id"))
    }),

    "v_centroids" -> ((s, dir) => {
      t(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")))
        .select(col("label"), (col("p") + 1).as("dim"),
          floor(col("x").cast("double") * lit(1000000.0)).as("v"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_u"))
        .withColumn("mean_u", col("sum_u").cast("double") / col("n"))
        .orderBy(col("label"), col("dim"))
    }),

    // Semantic dedup (SemDeDup, arXiv:2303.09540) in the oracle-checkable
    // regime: cluster-bounded near-dup pairs against the DETERMINISTIC
    // md5-pick seed centroids (0 Lloyd iterations — the same assignment
    // the v_kmeans_assign oracle reproduces in SQL), exact-cosine
    // verified. The pair space is one equi-join on cid instead of the
    // all-pairs cross: ~n^2/k candidate pairs at balanced clusters.
    "v_semdedup_pairs" -> ((s, dir) => {
      import graft.operators.{KMeans, SemDedup}
      val vecs = vectorsDf(s, dir)
      val seeds = KMeans.initCentroids(vecs, k = 8)
      SemDedup.pairs(vecs, seeds, threshold = 0.4)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Binary quantization serving: 1-bit-per-dim sign codes (64x
    // compression at dim=64), Hamming top-100 compressed prefilter
    // (XOR+popcount — the cheapest scan that exists), exact cosine
    // re-rank of the survivors. The BQ+rescore pattern modern vector
    // stores ship as their memory-tier default; recall self-carried
    // (the prefilter is lossy by design). Candidate stage is the
    // bounded-heap kNN over an 8-byte column; re-rank touches
    // O(queries x 100) raw vectors only.
    "v_recall_bq" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vecs = vectorsDf(s, dir)
      val qs = queriesDf(s, dir)
      val coarse = ExactKnn.search(
          qs.select(col("qid"), signPack64(col("qvec")).as("qvec")),
          vecs.select(col("id"), signPack64(col("vec")).as("vec")),
          k = 100, metric = "hamming")
        .select(col("qid"), col("id"))
      val reranked = coarse
        .join(vecs, "id")
        .join(qs, "qid")
        .withColumn("sim", cosineSim(col("qvec"), col("vec")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("sim").desc, col("id"))))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("id"))
      recallReport(s, qs, reranked, exactTruthIds(s, dir, "cosine", 10))
    }),

    // MMR diversified re-ranking (Carbonell & Goldstein 1998): top-20
    // exact-cosine candidates greedily re-ranked to 5 diverse results at
    // lambda=0.5. Integer micro-unit sims + per-mille lambda keep the
    // greedy integer-exact; the oracle unrolls the 5 selection steps as
    // list-accumulating CTEs.
    "v_mmr_rerank" -> ((s, dir) => {
      import graft.operators.Mmr
      Mmr.rerank(queriesDf(s, dir), vectorsDf(s, dir),
          kCandidates = 20, k = 5, lambdaPm = 500)
        .orderBy(col("qid"), col("rank"))
    }),

    // The production regime: Lloyd-trained clusters (k=16, 3 iterations),
    // keep-lowest-id pruning via connected components, and a self-carried
    // recall audit against the brute-force pair set. Rows-only (trained
    // centroids aren't SQL-expressible); invariants — pairs subset of
    // brute force, k=1 exact parity, survivor pruning — in SemDedupSpec.
    // The O(n^2) audit truth is the query's ORACLE, not its serving work:
    // memoized + ledgered so the bench attributes it to one_time_s (the
    // v_recall_* checkpointed-truth pattern).
    "v_semdedup" -> ((s, dir) => {
      import graft.operators.SemDedup
      val vecs = vectorsDf(s, dir)
      val model = semdedupModel(s, dir)
      SemDedup.reportWithTruth(vecs, model.centroids, threshold = 0.4,
        nBrute = semdedupTruthCount(s, dir, 0.4))
    })
  )

  /** Process-wide memo of the semdedup row's trained k-means model — a
    * build artifact exactly like the HNSW models (one Lloyd training per
    * static corpus, shared across queries), ledgered so bench wall
    * attributes it to one_time_s. */
  private val semdedupModels =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.KMeans.KMeansModel]()
  private def semdedupModel(s: SparkSession, dir: String): graft.operators.KMeans.KMeansModel =
    semdedupModels.computeIfAbsent(
      s"${s.sparkContext.applicationId}|$dir", _ =>
        graft.BuildLedger.timed("kmeans_train")(
          graft.operators.KMeans.train(vectorsDf(s, dir), k = 16, iters = 3)))

  /** Process-wide memo of the semdedup audit's brute-force truth count,
    * keyed by (app, dir, threshold); computed once per corpus inside
    * BuildLedger so bench wall subtracts it from serving. */
  private val semdedupTruth =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def semdedupTruthCount(s: SparkSession, dir: String,
                                 threshold: Double): Long =
    semdedupTruth.computeIfAbsent(
      s"${s.sparkContext.applicationId}|$dir|$threshold", _ =>
        graft.BuildLedger.timed("semdedup_recall_audit")(
          graft.operators.SemDedup.bruteForcePairCount(
            vectorsDf(s, dir), threshold))).longValue

  private val qFilter = "vec_id % 25 = 0"

  /** Shared seed-assignment CTE chain — `asg(vec_id, cid)`: the k=8
    * md5-pick seed centroids and the argmin assignment, mirroring
    * KMeans.initCentroids + KMeans.assign. ONE string composed into the
    * v_kmeans_assign AND v_semdedup_pairs oracles (a drifted copy of
    * the seed-pick or tie-break rule would silently split them). */
  private lazy val seedAssignCtes: String =
    """c0 AS (SELECT vec_id, embedding,
      |            md5(CAST(vec_id AS VARCHAR)) AS h FROM embeddings
      |            WHERE embedding IS NOT NULL),
      |c AS (SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) - 1 AS cid,
      |      CAST(embedding AS DOUBLE[]) AS cv
      |      FROM c0 ORDER BY h, vec_id LIMIT 8),
      |p AS (SELECT e.vec_id, c.cid,
      |      list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS d
      |      FROM embeddings e, c WHERE e.embedding IS NOT NULL),
      |asg AS (SELECT vec_id, cid FROM (
      |        SELECT vec_id, cid,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk FROM p)
      |        WHERE rk = 1)""".stripMargin

  /** Step-unrolled MMR oracle: candidate top-kCand per query, pairwise
    * micro-unit sims, then k greedy selections as list-accumulating CTEs
    * (s1..sk). Same integer math and tie-breaks as [[graft.operators.Mmr]]. */
  private def mmrOracle(kCand: Int, k: Int, lamPm: Int): String = {
    val steps = (2 to k).map { m =>
      s"""ms$m AS (SELECT c.qid, c.id, $lamPm * c.sim_u - ${1000 - lamPm} * max(p.p_u) AS mmr
         |FROM cand c JOIN s${m - 1} s ON c.qid = s.qid
         |JOIN pp p ON p.qid = c.qid AND p.a = c.id AND list_contains(s.sel, p.b)
         |WHERE NOT list_contains(s.sel, c.id)
         |GROUP BY c.qid, c.id, c.sim_u),
         |s$m AS (SELECT r.qid, list_append(s.sel, r.id) AS sel, r.id AS picked
         |FROM (SELECT qid, id, row_number() OVER (
         |      PARTITION BY qid ORDER BY mmr DESC, id) AS rn FROM ms$m) r
         |JOIN s${m - 1} s ON s.qid = r.qid WHERE r.rn = 1)""".stripMargin
    }
    val unions = (1 to k)
      .map(m => s"SELECT qid, $m AS rank, picked AS id FROM s$m")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
       |     FROM embeddings WHERE $qFilter),
       |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sc AS (SELECT q.qid, v.id, list_dot_product(q.v, v.v)
       |       / sqrt(list_dot_product(q.v, q.v) * list_dot_product(v.v, v.v)) AS s
       |       FROM q, v),
       |cand AS (SELECT qid, id, CAST(floor(s * 1000000) AS BIGINT) AS sim_u FROM (
       |     SELECT qid, id, s, row_number() OVER (
       |     PARTITION BY qid ORDER BY s DESC, id) AS rn FROM sc) WHERE rn <= $kCand),
       |pp AS (SELECT c1.qid, c1.id AS a, c2.id AS b,
       |     CAST(floor(list_dot_product(v1.v, v2.v)
       |       / sqrt(list_dot_product(v1.v, v1.v) * list_dot_product(v2.v, v2.v))
       |       * 1000000) AS BIGINT) AS p_u
       |     FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid
       |     JOIN v v1 ON v1.id = c1.id JOIN v v2 ON v2.id = c2.id),
       |s1 AS (SELECT qid, [id] AS sel, id AS picked FROM (
       |     SELECT qid, id, row_number() OVER (
       |     PARTITION BY qid ORDER BY sim_u DESC, id) AS rn FROM cand) WHERE rn = 1),
       |${steps.mkString(",\n")}
       |SELECT qid, CAST(rank AS BIGINT) AS rank, id
       |FROM ($unions) ORDER BY qid, rank""".stripMargin
  }

  private def knnOracle(k: Int, scoreExpr: String, desc: Boolean): String = {
    val dir = if (desc) "DESC" else "ASC"
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE $qFilter),
       |     v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |     p AS (SELECT qid, id, $scoreExpr AS s FROM q, v),
       |     r AS (SELECT qid, id, CAST(row_number() OVER (
       |            PARTITION BY qid ORDER BY s $dir, id) AS INT) AS rank FROM p)
       |SELECT qid, id, rank FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "v_knn_cosine" -> knnOracle(10,
      "list_dot_product(qv, vv) / sqrt(list_dot_product(qv, qv) * list_dot_product(vv, vv))",
      desc = true),
    "v_knn_l2" -> knnOracle(10, "list_distance(qv, vv)", desc = false),
    "v_knn_dot" -> knnOracle(10, "list_dot_product(qv, vv)", desc = true),
    "v_knn_ivf" -> knnOracle(10,
      "list_dot_product(qv, vv) / sqrt(list_dot_product(qv, qv) * list_dot_product(vv, vv))",
      desc = true),

    "v_knn_hamming" ->
      s"""WITH c AS (
         |  SELECT vec_id, bit_or(CASE WHEN e >= 0 THEN
         |    CASE WHEN i = 64 THEN -9223372036854775808 ELSE (CAST(1 AS BIGINT) << (i-1)) END
         |    ELSE 0 END) AS code
         |  FROM (SELECT vec_id, unnest(embedding) AS e,
         |        generate_subscripts(embedding, 1) AS i FROM embeddings)
         |  GROUP BY vec_id),
         | q AS (SELECT vec_id AS qid, code AS qc FROM c WHERE $qFilter),
         | p AS (SELECT qid, c.vec_id AS id, bit_count(xor(qc, c.code)) AS hamming FROM q, c),
         | r AS (SELECT qid, id, CAST(hamming AS INT) AS hamming,
         |       CAST(row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS INT) AS rank
         |       FROM p)
         |SELECT qid, id, hamming, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "v_neardup_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM e a, e b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.v, b.v)
        |      / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,

    "v_dedup_exact" ->
      """SELECT count(*) AS n_vectors,
        | CAST(count(DISTINCT embedding) AS BIGINT) AS n_distinct
        |FROM embeddings""".stripMargin,

    "v_kmeans_assign" ->
      s"""WITH $seedAssignCtes
        |SELECT vec_id, cid FROM asg ORDER BY vec_id""".stripMargin,

    "v_mmr_rerank" -> mmrOracle(kCand = 20, k = 5, lamPm = 500),

    // Seed assignment (the v_kmeans_assign CTE) composed with the
    // within-cluster cosine pair join — full SemDeDup parity in SQL.
    "v_semdedup_pairs" ->
      s"""WITH $seedAssignCtes,
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT aa.vec_id AS a_id, bb.vec_id AS b_id
        |FROM asg aa JOIN asg bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
        |JOIN e a ON a.vec_id = aa.vec_id
        |JOIN e b ON b.vec_id = bb.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |      / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,

    "v_centroids" ->
      """WITH u AS (
        |  SELECT label, unnest(list_transform(generate_series(1, len(embedding)),
        |    i -> {'d': i, 'v': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)})) AS e
        |  FROM embeddings)
        |SELECT label, CAST(e.d AS INTEGER) AS dim, count(*) AS n,
        |  CAST(sum(e.v) AS BIGINT) AS sum_u,
        |  CAST(sum(e.v) AS DOUBLE) / count(*) AS mean_u
        |FROM u GROUP BY label, e.d
        |ORDER BY label, dim""".stripMargin
  )
}
