package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native kernels: registers the codegen'd vector /
  * fingerprint expressions as SQL functions so `spark.sql("SELECT
  * cosine_sim(a, b) ...")` works — the FunctionRegistry layer of SURVEY
  * §7.1. Registered two ways:
  *
  *  - session-build time via [[graft.plans.GraftExtensions]]
  *    (`spark.sql.extensions=graft.plans.GraftExtensions`);
  *  - post-hoc on a live session via [[registerAll]].
  *
  * Only stateless kernels register (vector distances, sign-pack,
  * md5-MinHash/SimHash fingerprints). IVF/PQ expressions carry trained
  * model state (centroids/codebooks) and stay DataFrame-API-only.
  */
object GraftFunctionRegistry {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s, org.apache.spark.sql.types.StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }

  private def arity(name: String, n: Int)(args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  /** (name, builder) for every registrable kernel. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> { args =>
      arity("cosine_sim", 2)(args); CosineSimilarityF32(args(0), args(1))
    },
    "l2_sq" -> { args =>
      arity("l2_sq", 2)(args); L2SquaredF32(args(0), args(1))
    },
    "dot_f32" -> { args =>
      arity("dot_f32", 2)(args); DotProductF32(args(0), args(1))
    },
    "signpack64" -> { args =>
      arity("signpack64", 1)(args); SignPack64(args(0))
    },
    "simhash64_md5" -> { args =>
      arity("simhash64_md5", 1)(args); SimHash64Md5(args(0))
    },
    "unicode_normalize" -> { args =>
      arity("unicode_normalize", 2)(args)
      UnicodeNormalize(args(0), litString(args(1), "unicode_normalize form"))
    },
    "avro_decode" -> { args =>
      arity("avro_decode", 2)(args)
      AvroDecode(args(0), litString(args(1), "avro_decode schema"))
    },
    "md5_minhash" -> { args =>
      arity("md5_minhash", 2)(args)
      Md5MinHash(args(0), litInt(args(1), "md5_minhash numHashes"))
    },
    "md5_minhash_shingles" -> { args =>
      arity("md5_minhash_shingles", 5)(args)
      Md5MinHashShingles(args(0),
        litInt(args(1), "shingleLen"), litInt(args(2), "numHashes"),
        litInt(args(3), "bands"), litInt(args(4), "rowsPerBand"))
    },
    // sorted-array binary searches (the broadcast as-of probe kernel):
    // 1-based index of the greatest element <= v, and the strict
    // lower-bound count
    "sorted_count_le" -> { args =>
      arity("sorted_count_le", 2)(args)
      SortedCountLE(args(0), args(1), strict = false)
    },
    "sorted_count_lt" -> { args =>
      arity("sorted_count_lt", 2)(args)
      SortedCountLE(args(0), args(1), strict = true)
    },
    // order-preserving double -> signed-long reinterpretation (rank
    // doubles in long-keyed bounded aggregates; see DoubleOrderBits)
    "double_order_bits" -> { args =>
      arity("double_order_bits", 1)(args)
      DoubleOrderBits(args(0))
    },
    // Morton interleave of two 16-bit-quantized columns (the z-order
    // layout key). Same bit-spread as Layout.zvalue2 but built as a raw
    // catalyst tree — a builder must return resolvable expressions, not
    // bridged Column nodes. The registry spec pins the two forms equal.
    "zvalue2" -> { args =>
      arity("zvalue2", 2)(args)
      import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, ShiftLeft}
      import org.apache.spark.sql.types.LongType
      def spread16(e: Expression): Expression = {
        var x: Expression = BitwiseAnd(Cast(e, LongType), Literal(0xFFFFL))
        x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(8))), Literal(0x00FF00FFL))
        x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(4))), Literal(0x0F0F0F0FL))
        x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(2))), Literal(0x33333333L))
        BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(1))), Literal(0x55555555L))
      }
      BitwiseOr(spread16(args(0)), ShiftLeft(spread16(args(1)), Literal(1)))
    }
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctionRegistry.getClass.getCanonicalName, name)

  /** Session-build-time injection (for SparkSessionExtensions). */
  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }

  /** Register on an already-built session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
