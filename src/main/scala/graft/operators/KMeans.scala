package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.l2Sq

/** Distributed k-means (Lloyd's algorithm) — the clustering operator
  * behind IVF coarse quantizers and corpus bucketing, as a first-class
  * deterministic primitive.
  *
  * Scale shape, per iteration:
  *  - ASSIGN: centroids ride to executors as literal float arrays inside
  *    the codegen'd `l2_sq_f32` kernel — one scan, ZERO shuffle, no UDF.
  *  - UPDATE: per-(cluster, dim) sums via posexplode + hash aggregation —
  *    map-side partial agg reduces each task to k x dim rows before the
  *    one shuffle of O(k x dim x partitions); only the k x dim mean
  *    matrix ever reaches the driver. Same shape as the `v_centroids`
  *    catalog query. This is the canonical cluster k-means layout: the
  *    corpus is never collected, resident state is k x dim floats.
  *
  * Determinism (everywhere, any partitioning): per-dimension sums are
  * integerized to micro-units before the distributed sum (long addition
  * is associative; double addition is not), means take ONE double
  * division, and new centroids round to float. Init picks the k vectors
  * whose md5(id) sorts first — reproducible on any engine, no RNG state
  * (the s_sample_mix discipline). Ties in ASSIGN break to the smallest
  * cluster id via a strict-less accumulator, mirroring the oracle's
  * `ORDER BY d, cid` rank-1 row.
  *
  * Unlike [[Ivf.train]]'s sampled driver-side k-means (a bootstrap for
  * index cells), this runs Lloyd over the FULL corpus distributed.
  */
object KMeans {

  /** Trained model: centroids (cluster id = array index) and the
    * integerized inertia trajectory (sum of floor(l2_sq x 1e6) at the
    * START of each iteration, i.e. against the centroids being updated —
    * non-increasing modulo the +-1-per-row floor noise). */
  final case class KMeansModel(centroids: Array[Array[Float]], inertiaU: Array[Long])

  /** Training's input contract: a vector that is null or carries a
    * non-finite component holds no position in the distance geometry —
    * it can neither seed a cluster (a NaN seed makes every distance to
    * that cluster NaN forever) nor move a centroid (its components null
    * out of the sums while the row still counts). assign() alone keeps
    * such rows (mapping them to cluster 0) so serving never drops data. */
  private def finiteVecs(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.filter(col(vecCol).isNotNull &&
      forall(col(vecCol), x => !isnan(x) && abs(x) < lit(Float.PositiveInfinity)))

  /** The k seed vectors whose md5(cast(id as string)) sorts first
    * (tie-break id) — deterministic, engine-reproducible, collects
    * exactly k rows. */
  def initCentroids(vecs: DataFrame, k: Int,
                    idCol: String = "id", vecCol: String = "vec"): Array[Array[Float]] = {
    require(k > 0, s"k must be positive, got $k")
    finiteVecs(vecs, vecCol)
      .select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)
  }

  /** `(d, cid)` argmin over the centroid set for one vector column —
    * strict `<` keeps the EARLIEST (smallest cid) among equal distances. */
  private def bestCluster(vecCol: Column, centroids: Array[Array[Float]]): Column = {
    // nanvl + least: a NaN component makes EVERY distance NaN (and
    // NaN < x is never true), an Inf component makes every distance
    // +Infinity (and Inf < Inf is never true) — either way the strict-
    // less fold would keep the seed and emit cid = -1, which train
    // would index. Remapped to MaxValue, such a vector deterministically
    // lands in cluster 0 (all ties, earliest wins) — a valid cluster id.
    val dists = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        least(nanvl(l2Sq(vecCol, typedLit(c)), lit(Double.MaxValue)),
          lit(Double.MaxValue)).as("d"),
        lit(i).as("cid"))
    }: _*)
    aggregate(dists,
      struct(lit(Double.PositiveInfinity).as("d"), lit(-1).as("cid")),
      (acc, x) => when(x("d") < acc("d"), x).otherwise(acc))
  }

  /** Cluster assignment: one codegen'd scan, zero shuffle. Output columns
    * `idCol, cid, dist_sq`. Null vectors are excluded (a null can't hold
    * a cluster), mirroring the oracle's implicit null-drop. */
  def assign(vecs: DataFrame, centroids: Array[Array[Float]],
             idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    require(centroids.nonEmpty, "empty centroid set")
    vecs.filter(col(vecCol).isNotNull)
      .withColumn("_best", bestCluster(col(vecCol), centroids))
      .select(col(idCol), col("_best.cid").as("cid"), col("_best.d").as("dist_sq"))
  }

  /** Lloyd iterations. Each iteration is one assign scan + one k x dim
    * aggregation; empty clusters keep their previous centroid. */
  def train(vecs: DataFrame, k: Int, iters: Int,
            idCol: String = "id", vecCol: String = "vec"): KMeansModel = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var centroids = initCentroids(vecs, k, idCol, vecCol)
    val inertias = Array.newBuilder[Long]
    // see finiteVecs: a NaN row would integerize its MaxValue-remapped
    // distance to floor(MaxValue*1e6), wrapping the long inertia sum,
    // while its components null out of sum_u with the row still in n
    val src = finiteVecs(vecs, vecCol)
    for (_ <- 0 until iters) {
      // one pass computes BOTH the inertia and the per-(cid, dim)
      // integerized sums: tag each row with its argmin cluster (keeping
      // the vector — no join back), explode, aggregate once
      val stats = src
        .withColumn("_best", bestCluster(col(vecCol), centroids))
        .select(col("_best.cid").as("cid"), col("_best.d").as("dist_sq"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .select(col("cid"), col("dim"),
          floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("xu"),
          // count dist_sq once per row, not once per exploded dim
          when(col("dim") === 0, floor(col("dist_sq") * lit(1000000.0)).cast("long"))
            .otherwise(lit(0L)).as("du"))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xu")).as("sum_u"), sum(col("du")).as("d_u"))
        .collect()
      inertias += stats.map(_.getLong(4)).sum
      val next = centroids.map(_.clone())
      stats.groupBy(_.getInt(0)).foreach { case (cid, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val c = new Array[Float](dim)
        rows.foreach { r =>
          c(r.getInt(1)) = (r.getLong(3).toDouble / 1e6 / r.getLong(2)).toFloat
        }
        next(cid) = c
      }
      centroids = next
    }
    KMeansModel(centroids, inertias.result())
  }
}
