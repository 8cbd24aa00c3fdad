package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, Float32BytesInput, Float32UnaryInput}
import org.apache.spark.sql.types._

/** Scalar (int8) quantization kernels: each dimension is affine-mapped to
  * one byte via the corpus per-dimension [min, max] range — a 64-dim
  * float vector (256 bytes) becomes 64 bytes. Coarser compression than PQ
  * per byte of code, but with NO codebook lookup in the scan loop (pure
  * fused multiply-add per dim), and per-dimension resolution of 1/255 of
  * the data range — recall at small re-rank depths is near-exact.
  *
  * Shared verbatim by interpreted eval and generated Java (static calls,
  * zero boxing, whole-stage codegen). Distance is asymmetric (ADC): the
  * query stays full-precision; stored bytes decode on the fly.
  */
object Sq8Kernels {

  /** Quantize one vector: code_i = round((x_i - min_i) / scale_i),
    * clamped to [0, 255]. A degenerate dimension (max == min, scale 0)
    * encodes as 0 and decodes back to min_i exactly. */
  def encode(v: ArrayData, mins: Array[Float], scales: Array[Float]): Array[Byte] = {
    val dim = v.numElements()
    if (dim != mins.length)
      throw new IllegalArgumentException(
        s"sq8_encode: vector dim $dim != model dim ${mins.length}")
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val s = scales(i)
      val q = if (s == 0f) 0 else math.round((v.getFloat(i) - mins(i)) / s)
      out(i) = math.max(0, math.min(255, q)).toByte
      i += 1
    }
    out
  }

  /** ADC: squared-L2 between a full-precision query and byte codes,
    * decoding `min_i + code_i * scale_i` inline (double accumulate). */
  def adc(q: ArrayData, code: Array[Byte],
          mins: Array[Float], scales: Array[Float]): Double = {
    val n = q.numElements()
    if (n != code.length || n != mins.length)
      throw new IllegalArgumentException(
        s"sq8_adc: query dim $n vs code dim ${code.length} vs model dim ${mins.length}" +
          " — a partial distance would rank candidates silently wrong")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dec = mins(i).toDouble + (code(i) & 0xFF).toDouble * scales(i).toDouble
      val d = q.getFloat(i).toDouble - dec
      acc += d * d
      i += 1
    }
    acc
  }
}

/** `sq8_encode(vec)` -> int8 codes as a binary column (1 byte per dim). */
case class Sq8EncodeF32(child: Expression,
                        mins: Array[Float], scales: Array[Float])
    extends UnaryExpression with Float32UnaryInput {
  override def prettyName: String = "sq8_encode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Sq8Kernels.encode(v.asInstanceOf[ArrayData], mins, scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sq8Mins", mins, "float[]")
    val sc = ctx.addReferenceObj("sq8Scales", scales, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sq8Kernels.encode($a, $mn, $sc);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sq8_adc(qvec, code)` -> asymmetric squared-L2 distance. */
case class Sq8AdcF32(left: Expression, right: Expression,
                     mins: Array[Float], scales: Array[Float])
    extends BinaryExpression with Float32BytesInput {
  override def prettyName: String = "sq8_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(q: Any, code: Any): Any =
    Sq8Kernels.adc(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]], mins, scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sq8Mins", mins, "float[]")
    val sc = ctx.addReferenceObj("sq8Scales", scales, "float[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.Sq8Kernels.adc($q, $c, $mn, $sc);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Sq8Functions {
  def sq8Encode(v: Column, mins: Array[Float], scales: Array[Float]): Column =
    Bridge.column(Sq8EncodeF32(Bridge.expression(v), mins, scales))
  def sq8Adc(q: Column, code: Column, mins: Array[Float], scales: Array[Float]): Column =
    Bridge.column(Sq8AdcF32(Bridge.expression(q), Bridge.expression(code), mins, scales))
}
