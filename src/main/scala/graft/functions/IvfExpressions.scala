package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge, Float32UnaryInput}
import org.apache.spark.sql.types._

/** Scalar kernels for IVF coarse quantization, shared verbatim by the
  * interpreted eval and the generated Java (codegen emits a static call,
  * keeping cell assignment inside whole-stage codegen with zero boxing —
  * the replacement for the per-row Scala UDFs the IVF operator used
  * before). Metric ids: 0 = cosine distance, 1 = squared L2, 2 = -dot. */
object IvfKernels {

  def dist(v: ArrayData, c: Array[Float], metric: Int): Double = {
    val n = math.min(v.numElements(), c.length)
    metric match {
      case 0 =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = v.getFloat(i).toDouble; val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
      case 1 =>
        var acc = 0.0; var i = 0
        while (i < n) {
          val d = v.getFloat(i).toDouble - c(i).toDouble
          acc += d * d; i += 1
        }
        acc
      case _ =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += v.getFloat(i).toDouble * c(i).toDouble; i += 1 }
        -acc
    }
  }

  /** Index of the nearest centroid; first index wins ties (matches the
    * deterministic scan order of Ivf.train). */
  def nearest(v: ArrayData, cs: Array[Array[Float]], metric: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      val d = dist(v, cs(i), metric)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** The `nProbe` nearest centroid indices ordered by (distance, index) —
    * the probe list of IVF search. */
  def probes(v: ArrayData, cs: Array[Array[Float]], metric: Int, nProbe: Int): Array[Int] = {
    val ds = new Array[Double](cs.length)
    var i = 0
    while (i < cs.length) { ds(i) = dist(v, cs(i), metric); i += 1 }
    val taken = new Array[Boolean](cs.length)
    val out = new Array[Int](math.min(nProbe, cs.length))
    var j = 0
    while (j < out.length) {
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        if (!taken(c) && ds(c) < bestD) { bestD = ds(c); best = c }
        c += 1
      }
      if (best == -1) {
        // every remaining distance is NaN (e.g. a NaN vector component):
        // fall back to the first untaken index rather than crash —
        // deterministic, and the exact verify downstream stays correct
        var c2 = 0
        while (best == -1 && c2 < cs.length) {
          if (!taken(c2)) best = c2
          c2 += 1
        }
      }
      taken(best) = true; out(j) = best; j += 1
    }
    out
  }

  def metricId(name: String): Int = name match {
    case "cosine" => 0
    case "l2"     => 1
    case "dot"    => 2
    case other    => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** Nearest-centroid cell assignment as a codegen'd expression. */
case class NearestCentroidF32(child: Expression, centroids: Array[Array[Float]],
                              metricName: String)
    extends UnaryExpression with Float32UnaryInput {
  private val metric = IvfKernels.metricId(metricName)
  override def prettyName: String = "ivf_cell"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    IvfKernels.nearest(v.asInstanceOf[ArrayData], centroids, metric)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.IvfKernels.nearest($a, $cs, $metric);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Probe list (the nProbe nearest centroid indices) as a codegen'd
  * expression; result is array<int> ordered by (distance, index). */
case class NearestCentroidsF32(child: Expression, centroids: Array[Array[Float]],
                               metricName: String, nProbe: Int)
    extends UnaryExpression with Float32UnaryInput {
  private val metric = IvfKernels.metricId(metricName)
  override def prettyName: String = "ivf_probes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      IvfKernels.probes(v.asInstanceOf[ArrayData], centroids, metric, nProbe))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.IvfKernels.probes($a, $cs, $metric, $nProbe));""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfFunctions {
  def ivfCell(v: Column, centroids: Array[Array[Float]], metric: String): Column =
    Bridge.column(NearestCentroidF32(Bridge.expression(v), centroids, metric))
  def ivfProbes(v: Column, centroids: Array[Array[Float]], metric: String, nProbe: Int): Column =
    Bridge.column(NearestCentroidsF32(Bridge.expression(v), centroids, metric, nProbe))
}
