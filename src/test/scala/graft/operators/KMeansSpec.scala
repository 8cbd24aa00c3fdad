package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Driver-side reference Lloyd with the operator's exact arithmetic
    * contract: micro-integerized sums, one double division, float
    * rounding, strict-less argmin with smallest-cid ties. */
  private def referenceTrain(rows: Array[(Long, Array[Float])], k: Int, iters: Int)
  : (Array[Array[Float]], Array[Long]) = {
    var cents = rows.sortBy { case (id, _) =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id)
    }.take(k).map(_._2)
    val inertias = Array.newBuilder[Long]
    for (_ <- 0 until iters) {
      val assigned = rows.map { case (_, v) =>
        var best = -1; var bestD = Double.MaxValue
        cents.indices.foreach { c =>
          var d = 0.0
          v.indices.foreach { j =>
            val diff = v(j).toDouble - cents(c)(j).toDouble; d += diff * diff
          }
          if (d < bestD) { bestD = d; best = c }
        }
        (best, bestD, v)
      }
      inertias += assigned.map(a => math.floor(a._2 * 1e6).toLong).sum
      cents = cents.indices.map { c =>
        val members = assigned.filter(_._1 == c)
        if (members.isEmpty) cents(c)
        else {
          val dim = members.head._3.length
          Array.tabulate(dim) { j =>
            val sumU = members.map(m => math.floor(m._3(j).toDouble * 1e6).toLong).sum
            (sumU.toDouble / 1e6 / members.length).toFloat
          }
        }
      }.toArray
    }
    (cents, inertias.result())
  }

  test("train matches the driver-side reference exactly (centroids + inertia)") {
    val rows = vecs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (refCents, refInertia) = referenceTrain(rows, k = 5, iters = 4)
    val model = KMeans.train(vecs, k = 5, iters = 4)
    assert(model.inertiaU.toSeq == refInertia.toSeq)
    assert(model.centroids.length == refCents.length)
    model.centroids.zip(refCents).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
  }

  test("inertia is non-increasing across Lloyd iterations (floor-noise slack)") {
    val n = vecs.count()
    val model = KMeans.train(vecs, k = 8, iters = 5)
    model.inertiaU.sliding(2).foreach {
      case Array(prev, next) => assert(next <= prev + n, s"inertia rose: $prev -> $next")
      case _ =>
    }
    // and it actually moved: seeded centroids are real vectors, so the
    // first update must strictly improve on this corpus
    assert(model.inertiaU.last < model.inertiaU.head)
  }

  test("train is invariant to partitioning (integerized sums are order-independent)") {
    val a = KMeans.train(vecs.repartition(3), k = 4, iters = 3)
    val b = KMeans.train(vecs.repartition(17), k = 4, iters = 3)
    assert(a.inertiaU.toSeq == b.inertiaU.toSeq)
    a.centroids.zip(b.centroids).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
  }

  test("a NaN vector lands in a VALID cluster (0), never cid -1") {
    val df = Seq((1L, Array(Float.NaN, 1.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val got = KMeans.assign(df, cents).select("id", "cid").as[(Long, Int)]
      .collect().toMap
    assert(got(1L) == 0, s"NaN vector must tie into cluster 0, got ${got(1L)}")
    assert(got(2L) == 0 && got(3L) == 1)
    // and train survives it end-to-end with SANE statistics: the NaN row
    // is excluded, so the inertia never wraps negative and the finite
    // rows sit exactly on their seed centroids (inertia 0)
    val model = KMeans.train(df, k = 2, iters = 2)
    assert(model.centroids.length == 2)
    assert(model.inertiaU.forall(_ >= 0L),
      s"inertia wrapped: ${model.inertiaU.toSeq}")
    assert(model.inertiaU.forall(_ == 0L),
      s"NaN row leaked into training stats: ${model.inertiaU.toSeq}")
    // the NaN row must not have dragged a centroid off the finite points
    assert(model.centroids.map(_.toSeq).toSet ==
      Set(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
  }

  test("an Inf vector lands in a VALID cluster (0), never cid -1") {
    // Inf < Inf is as false as NaN < x: without the least() clamp the
    // strict-less fold kept the cid = -1 seed for all-Infinity distances
    val df = Seq((1L, Array(Float.PositiveInfinity, 1.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("id", "vec")
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val got = KMeans.assign(df, cents).select("id", "cid").as[(Long, Int)]
      .collect().toMap
    assert(got(1L) == 0, s"Inf vector must tie into cluster 0, got ${got(1L)}")
    assert(got(2L) == 0)
    val model = KMeans.train(df, k = 2, iters = 2)
    assert(model.inertiaU.forall(_ >= 0L))
  }

  test("assign breaks distance ties to the smallest cluster id") {
    val df = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    // two identical centroids: both at distance 0 from the vector
    val cents = Array(Array(1.0f, 0.0f), Array(1.0f, 0.0f))
    val got = KMeans.assign(df, cents).select("id", "cid").as[(Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 0)))
  }

  test("empty clusters keep their previous centroid (no NaN means)") {
    // identical points + k=2: every row ties to cid 0, cluster 1 is EMPTY
    // every iteration — its centroid must survive unchanged, not become
    // the NaN mean of nothing
    val df = Seq(
      (1L, Array(2.0f, 3.0f)), (2L, Array(2.0f, 3.0f)), (3L, Array(2.0f, 3.0f))
    ).toDF("id", "vec")
    val model = KMeans.train(df, k = 2, iters = 2)
    assert(model.centroids.length == 2)
    assert(model.centroids.forall(_.toSeq == Seq(2.0f, 3.0f)))
    assert(KMeans.assign(df, model.centroids).select("cid")
      .as[Int].collect().forall(_ == 0))
  }

  test("assign plan has no shuffle and no UDF (broadcast-literal centroids in codegen)") {
    val cents = KMeans.initCentroids(vecs, k = 4)
    val plan = KMeans.assign(vecs, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"assign must not use UDFs:\n$plan")
  }
}
