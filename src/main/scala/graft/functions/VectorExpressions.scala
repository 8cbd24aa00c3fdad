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

/** Multi-bit SimHash signature: project the embedding onto `nBits` seeded
  * Rademacher (+-1) hyperplanes and pack the sign bits into nBits/64
  * longs — the banded-LSH signature kernel ([[graft.operators.Dedup]]).
  *
  * Was a Scala UDF (boxed Seq[Float] access, no codegen): at 512 bits x
  * 64 dims the signature pass alone dominated the LSH query's cost. As a
  * native expression the projection loop runs on primitive arrays inside
  * whole-stage codegen. The flat projection matrix is deterministic in
  * (nBits, dim, seed) and regenerated on each executor from the
  * expression's own fields — nothing is shipped but three scalars.
  */
case class SimHashSigF32(child: Expression, nBits: Int, dim: Int, seed: Long)
    extends UnaryExpression with Float32UnaryInput {
  require(nBits % 64 == 0, "nBits must be a multiple of 64")
  override def prettyName: String = "simhash_sig_f32"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val proj: Array[Float] =
    SimHashSigF32.flatProjections(nBits, dim, seed)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    val vec = new Array[Float](n)
    var i = 0
    while (i < n) { vec(i) = a.getFloat(i); i += 1 }
    val words = new Array[Long](nBits / 64)
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var acc = 0.0
      i = 0
      // float multiply widened to double — bit-identical to the original
      // UDF's accumulation (signatures are stable across the migration)
      while (i < n) { acc += proj(off + i) * vec(i); i += 1 }
      if (acc >= 0) words(b >> 6) |= (1L << (b & 63))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val projRef = ctx.addReferenceObj("simhashProj", proj, "float[]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |int n = Math.min($dim, $a.numElements());
       |float[] vec = new float[n];
       |for (int i = 0; i < n; i++) vec[i] = $a.getFloat(i);
       |long[] words = new long[${nBits / 64}];
       |for (int b = 0; b < $nBits; b++) {
       |  int off = b * $dim;
       |  double acc = 0.0;
       |  for (int i = 0; i < n; i++) acc += $projRef[off + i] * vec[i];
       |  if (acc >= 0.0) words[b >> 6] |= (1L << (b & 63));
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(words);
     """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashSigF32 {
  /** Row-major (bit-then-dim) +-1 matrix from scala.util.Random(seed) —
    * the exact draw order of the original generator, so signatures (and
    * every LSH oracle hash downstream) are unchanged. */
  def flatProjections(nBits: Int, dim: Int, seed: Long): Array[Float] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits * dim)(if (rng.nextBoolean()) 1f else -1f)
  }
}

/** Fused SimHash signature + banded slicing: element j of the output is
  * the `rowsPerBand`-bit slice of the signature starting at bit
  * j*rowsPerBand — exactly the value the LSH bucket join keys on, so
  * `posexplode` over this array yields (band_idx, band_val) directly.
  *
  * Replaces signature-then-`bands` string-parsed slice expressions: that
  * shape generated one enormous projection method (cold Janino compile
  * measured in SECONDS at 61-102 bands, risking the huge-method
  * interpreted fallback), where this is one short loop. Slice semantics
  * are bit-identical to the SQL form
  * `shiftrightunsigned(element_at(sig, w+1), off) | shiftleft(...)` —
  * band values, hence candidates, hence query hashes, are unchanged. */
case class SimHashBandsF32(child: Expression, nBits: Int, dim: Int, seed: Long,
                           bands: Int, rowsPerBand: Int)
    extends UnaryExpression with Float32UnaryInput {
  require(nBits % 64 == 0, "nBits must be a multiple of 64")
  require(bands * rowsPerBand <= nBits, "bands*rowsPerBand must fit in nBits")
  require(rowsPerBand >= 1 && rowsPerBand <= 63, "rowsPerBand in [1,63]")
  override def prettyName: String = "simhash_bands_f32"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val proj: Array[Float] =
    SimHashSigF32.flatProjections(nBits, dim, seed)

  private def mask: Long = (1L << rowsPerBand) - 1

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    val vec = new Array[Float](n)
    var i = 0
    while (i < n) { vec(i) = a.getFloat(i); i += 1 }
    val words = new Array[Long](nBits / 64)
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var acc = 0.0
      i = 0
      while (i < n) { acc += proj(off + i) * vec(i); i += 1 }
      if (acc >= 0) words(b >> 6) |= (1L << (b & 63))
      b += 1
    }
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      val start = j * rowsPerBand
      val w = start >> 6
      val o = start & 63
      val lo = words(w) >>> o
      val value =
        if (o + rowsPerBand <= 64) lo
        else lo | (words(w + 1) << (64 - o))
      out(j) = value & mask
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val projRef = ctx.addReferenceObj("simhashProj", proj, "float[]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |int n = Math.min($dim, $a.numElements());
       |float[] vec = new float[n];
       |for (int i = 0; i < n; i++) vec[i] = $a.getFloat(i);
       |long[] words = new long[${nBits / 64}];
       |for (int b = 0; b < $nBits; b++) {
       |  int off = b * $dim;
       |  double acc = 0.0;
       |  for (int i = 0; i < n; i++) acc += $projRef[off + i] * vec[i];
       |  if (acc >= 0.0) words[b >> 6] |= (1L << (b & 63));
       |}
       |long[] out = new long[$bands];
       |for (int j = 0; j < $bands; j++) {
       |  int start = j * $rowsPerBand;
       |  int w = start >> 6;
       |  int o = start & 63;
       |  long lo = words[w] >>> o;
       |  long value = (o + $rowsPerBand <= 64) ? lo : (lo | (words[w + 1] << (64 - o)));
       |  out[j] = value & ${mask}L;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
     """.stripMargin)
  }
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
  def simhashSig(a: Column, nBits: Int, dim: Int, seed: Long): Column =
    col(SimHashSigF32(expr(a), nBits, dim, seed))
  def simhashBands(a: Column, nBits: Int, dim: Int, seed: Long,
                   bands: Int, rowsPerBand: Int): Column =
    col(SimHashBandsF32(expr(a), nBits, dim, seed, bands, rowsPerBand))

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
