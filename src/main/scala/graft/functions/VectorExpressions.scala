package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, Float32BinaryInput, Float32UnaryInput}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector distance kernels.
  *
  * The reference engine's only distance kernel is Hamming on u64
  * (reference: src/vector_store/lazy_memory_store.rs:49-54); that one is
  * expressible with built-ins (`bit_count(a ^ b)`, see [[VectorFunctions.hammingU64]]).
  * For `array<float>` embeddings (testdata `embeddings.parquet`) we add
  * codegen'd binary expressions so the hot path of brute-force kNN and
  * near-dup joins stays inside whole-stage codegen — no boxing, no UDF
  * serialization, works on 100M-row scans.
  *
  * All kernels accumulate in double precision, iterating elements
  * left-to-right (index 0..n-1) — the deterministic order matters for
  * oracle parity.
  */
trait Float32VectorKernel extends BinaryExpression with Float32BinaryInput {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for the scalar loop; receives variable names holding the
    * two ArrayData inputs, must assign the result to `resultVar` (double). */
  protected def genLoop(a: String, b: String, resultVar: String): String
  protected def evalKernel(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(left: Any, right: Any): Any =
    evalKernel(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(a, b, ev.value.toString))
}

/** dot(a, b) = sum_i a_i * b_i (double accumulation). */
case class DotProductF32(left: Expression, right: Expression) extends Float32VectorKernel {
  override def prettyName: String = "dot_f32"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def genLoop(a: String, b: String, res: String): String = {
    s"""
       |int n = Math.min($a.numElements(), $b.numElements());
       |double acc = 0.0;
       |for (int i = 0; i < n; i++) {
       |  acc += (double) $a.getFloat(i) * (double) $b.getFloat(i);
       |}
       |$res = acc;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance: sum_i (a_i - b_i)^2. Monotone in L2 — ranking-
  * equivalent and cheaper (no sqrt); callers wanting the metric take sqrt. */
case class L2SquaredF32(left: Expression, right: Expression) extends Float32VectorKernel {
  override def prettyName: String = "l2_sq_f32"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }
  override protected def genLoop(a: String, b: String, res: String): String = {
    s"""
       |int n = Math.min($a.numElements(), $b.numElements());
       |double acc = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double d = (double) $a.getFloat(i) - (double) $b.getFloat(i);
       |  acc += d * d;
       |}
       |$res = acc;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity: dot(a,b) / (||a|| * ||b||); 0.0 if either norm is 0. */
case class CosineSimilarityF32(left: Expression, right: Expression) extends Float32VectorKernel {
  override def prettyName: String = "cosine_sim_f32"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
  override protected def genLoop(a: String, b: String, res: String): String = {
    s"""
       |int n = Math.min($a.numElements(), $b.numElements());
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = (double) $a.getFloat(i);
       |  double y = (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$res = (na == 0.0 || nb == 0.0) ? 0.0 : dot / Math.sqrt(na * nb);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pack the sign bits of the first 64 float dims into a u64 bit-code
  * (bit i set iff element i >= 0). Bridges `array<float>` embeddings into
  * the reference's native representation — u64 codes compared by Hamming
  * distance (reference: src/vector_store/lazy_memory_store.rs:14-21,49-54)
  * — i.e. a 1-permutation SimHash / random-hyperplane sketch.
  */
case class SignPack64(child: Expression) extends UnaryExpression with Float32UnaryInput {
  override def prettyName: String = "signpack64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), 64)
    var code = 0L; var i = 0
    while (i < n) { if (a.getFloat(i) >= 0f) code |= (1L << i); i += 1 }
    code
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |int n = Math.min($a.numElements(), 64);
       |long code = 0L;
       |for (int i = 0; i < n; i++) {
       |  if ($a.getFloat(i) >= 0.0f) code |= (1L << i);
       |}
       |${ev.value} = code;
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level API over the kernels (plus built-in compositions). */
object VectorFunctions {
  import org.apache.spark.sql.functions._

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def col(e: Expression): Column = Bridge.column(e)

  def dotF32(a: Column, b: Column): Column = col(DotProductF32(expr(a), expr(b)))
  def l2Sq(a: Column, b: Column): Column = col(L2SquaredF32(expr(a), expr(b)))
  def l2Dist(a: Column, b: Column): Column = sqrt(l2Sq(a, b))
  def cosineSim(a: Column, b: Column): Column = col(CosineSimilarityF32(expr(a), expr(b)))
  /** Cosine distance = 1 - similarity (a metric-ish dissimilarity). */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)
  def signPack64(a: Column): Column = col(SignPack64(expr(a)))

  /** Hamming distance between two u64 bit-codes — pure built-ins
    * (`bit_count(a ^ b)`), whole-stage codegen'd. Mirrors the reference's
    * only distance kernel (lazy_memory_store.rs:49-54). */
  def hammingU64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Register SQL names so `spark.sql("SELECT cosine_sim_f32(a,b) ...")` works. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_f32", es => DotProductF32(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_sq_f32", es => L2SquaredF32(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim_f32", es => CosineSimilarityF32(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("signpack64", es => SignPack64(es.head), "scala_udf")
  }
}
