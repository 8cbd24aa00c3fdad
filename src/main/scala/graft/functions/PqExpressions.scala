package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, Float32UnaryInput}
import org.apache.spark.sql.types._

/** Product-quantization kernels: 16 subspaces x 16 centroids (4-bit
  * codes) bit-packed into one long — a 64-dim float vector (256 bytes)
  * becomes 8 bytes, the compression that lets a 100 TB embedding corpus
  * be scanned as a 3 TB code column. Shared verbatim by interpreted eval
  * and the generated Java (static calls, zero boxing, whole-stage
  * codegen).
  *
  * `codebook` layout: codebook(sub)(centroid) = Array[Float] of the
  * subspace's dims. Distances are squared L2 within each subspace,
  * accumulated in double — asymmetric distance computation (ADC): query
  * stays full-precision, stored vectors are quantized.
  */
object PqKernels {

  val NumSub = 16
  val NumCentroids = 16 // 4 bits x 16 subspaces -> exactly 64 bits

  def subDim(dim: Int): Int = (dim + NumSub - 1) / NumSub

  /** Quantize one vector: per subspace, the nearest centroid's index,
    * packed little-end first (sub 0 in the lowest nibble). */
  def encode(v: ArrayData, codebook: Array[Array[Array[Float]]]): Long = {
    val dim = v.numElements()
    val td = trainedDim(codebook)
    if (dim != td)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim $dim vs codebook dim $td" +
          " — misaligned subspaces would produce garbage codes")
    val sd = subDim(dim)
    var code = 0L
    var s = 0
    while (s < NumSub) {
      val cents = codebook(s)
      val off = s * sd
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0; var i = 0
        val n = math.min(cent.length, math.max(dim - off, 0))
        while (i < n) {
          val d = v.getFloat(off + i).toDouble - cent(i).toDouble
          acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      code |= (best.toLong << (4 * s))
      s += 1
    }
    code
  }

  /** Total input dimension the codebook was trained for: the sum of the
    * per-subspace centroid widths (the last subspace may be narrower). */
  def trainedDim(codebook: Array[Array[Array[Float]]]): Int =
    codebook.iterator.map(s => if (s.isEmpty) 0 else s(0).length).sum

  /** ADC: squared-L2 distance between a full-precision query and a
    * quantized code. */
  def adc(q: ArrayData, code: Long, codebook: Array[Array[Array[Float]]]): Double = {
    val dim = q.numElements()
    // the subspace width derives from the INPUT dim: on a query/codebook
    // mismatch every subspace would silently compare misaligned slices
    // (the sq8_adc guard, ported)
    val td = trainedDim(codebook)
    if (dim != td)
      throw new IllegalArgumentException(
        s"pq_adc: query dim $dim vs codebook dim $td" +
          " — a misaligned distance would rank candidates silently wrong")
    val sd = subDim(dim)
    var acc = 0.0
    var s = 0
    while (s < NumSub) {
      val cent = codebook(s)(((code >>> (4 * s)) & 15L).toInt)
      val off = s * sd
      var i = 0
      val n = math.min(cent.length, math.max(dim - off, 0))
      while (i < n) {
        val d = q.getFloat(off + i).toDouble - cent(i).toDouble
        acc += d * d; i += 1
      }
      s += 1
    }
    acc
  }

  // ---- scalar twins over Array[Float] -------------------------------
  // Executor-local kernels (the HNSW-over-PQ serving store in
  // graft.hnsw.HnswPq) work on plain arrays, not ArrayData. Same math as
  // the expression kernels above; the LUT split factors the per-query
  // work out of the per-candidate hot loop: one table of
  // NumSub x NumCentroids partial squared-L2s per query, then each
  // candidate distance is 16 table lookups + adds (no per-dimension work
  // per candidate — the standard ADC serving decomposition).

  /** Reconstruct a code's vector: per subspace, the indexed centroid,
    * concatenated — the PQ decode (reconstruction error is the
    * quantization radius the codebook was trained to). The merged-cell
    * audit runs its float-space census over these, so a solo-built
    * index (floats on disk only) audits without touching the source. */
  def decodeArray(code: Long, codebook: Array[Array[Array[Float]]]): Array[Float] = {
    val td = trainedDim(codebook)
    val sd = subDim(td)
    val out = new Array[Float](td)
    var s = 0
    while (s < NumSub) {
      val cent = codebook(s)(((code >>> (4 * s)) & 15L).toInt)
      val off = s * sd
      var i = 0
      val n = math.min(cent.length, math.max(td - off, 0))
      while (i < n) { out(off + i) = cent(i); i += 1 }
      s += 1
    }
    out
  }

  def encodeArray(v: Array[Float], codebook: Array[Array[Array[Float]]]): Long = {
    val dim = v.length
    val td = trainedDim(codebook)
    if (dim != td)
      throw new IllegalArgumentException(
        s"pq encode: vector dim $dim vs codebook dim $td")
    val sd = subDim(dim)
    var code = 0L
    var s = 0
    while (s < NumSub) {
      val cents = codebook(s)
      val off = s * sd
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0; var i = 0
        val n = math.min(cent.length, math.max(dim - off, 0))
        while (i < n) {
          val d = v(off + i).toDouble - cent(i).toDouble
          acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      code |= (best.toLong << (4 * s))
      s += 1
    }
    code
  }

  /** Per-query ADC lookup table: slot s*NumCentroids+c holds the squared
    * L2 between the query's subspace-s slice and centroid c. Untrained
    * centroid slots (a codebook trained on < NumCentroids samples) stay
    * at PositiveInfinity — codes never reference them, and if a corrupt
    * code did, the candidate would loudly sort last rather than win. */
  def lutFor(q: Array[Float], codebook: Array[Array[Array[Float]]]): Array[Double] = {
    val dim = q.length
    val td = trainedDim(codebook)
    if (dim != td)
      throw new IllegalArgumentException(
        s"pq lut: query dim $dim vs codebook dim $td" +
          " — a misaligned distance would rank candidates silently wrong")
    val sd = subDim(dim)
    val lut = Array.fill(NumSub * NumCentroids)(Double.PositiveInfinity)
    var s = 0
    while (s < NumSub) {
      val cents = codebook(s)
      val off = s * sd
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0; var i = 0
        val n = math.min(cent.length, math.max(dim - off, 0))
        while (i < n) {
          val d = q(off + i).toDouble - cent(i).toDouble
          acc += d * d; i += 1
        }
        lut(s * NumCentroids + c) = acc
        c += 1
      }
      s += 1
    }
    lut
  }

  /** ADC distance from a precomputed query LUT to a packed code. */
  def adcLut(lut: Array[Double], code: Long): Double = {
    var acc = 0.0
    var s = 0
    while (s < NumSub) {
      acc += lut(s * NumCentroids + ((code >>> (4 * s)) & 15L).toInt)
      s += 1
    }
    acc
  }
}

/** `pq_encode(vec)` -> packed 64-bit code (16 x 4-bit nibbles) in a long. */
case class PqEncodeF32(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression with Float32UnaryInput {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebook)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqKernels.encode($a, $cb);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pq_adc(qvec, code)` -> asymmetric squared-L2 distance. */
case class PqAdcF32(left: Expression, right: Expression,
                    codebook: Array[Array[Array[Float]]])
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.Float32LongInput {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(q: Any, code: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], code.asInstanceOf[Long], codebook)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqKernels.adc($q, $c, $cb);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqFunctions {
  def pqEncode(v: Column, codebook: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqEncodeF32(Bridge.expression(v), codebook))
  def pqAdc(q: Column, code: Column, codebook: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqAdcF32(Bridge.expression(q), Bridge.expression(code), codebook))
}
