package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native text-fingerprint kernels. Semantically identical to their SQL
  * higher-order-function forms (the DuckDB oracles keep running the SQL
  * version), but one JVM pass per row instead of O(tokens x hashes)
  * interpreted lambda evaluations — the difference between 25 s and
  * sub-second on the sf0.1 `documents` table.
  *
  * Both kernels hash with MD5 and compare hex strings, matching Spark's
  * and DuckDB's `md5()` (lowercase hex of the UTF-8 bytes) exactly.
  */
private[functions] trait Md5Kernel {
  @transient protected lazy val digest: MessageDigest =
    MessageDigest.getInstance("MD5")

  private val hexChars = "0123456789abcdef".getBytes

  /** Finish the running digest, return lowercase hex as ASCII bytes. */
  protected def hexDigest(): Array[Byte] = {
    val d = digest.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** Lowercase hex of md5(prefix ++ bytes), as ASCII bytes. */
  protected def md5Hex(prefix: Array[Byte], bytes: Array[Byte]): Array[Byte] = {
    digest.reset()
    if (prefix.nonEmpty) digest.update(prefix)
    digest.update(bytes)
    hexDigest()
  }

  protected def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }
}

/** K-permutation MinHash over an array of strings: element k of the
  * result is min over inputs s of md5("k:" ++ s) — identical to
  * `transform(sh, s -> md5(concat('k:', s)))` + `array_min`, evaluated in
  * one pass. */
case class Md5MinHash(child: Expression, numHashes: Int)
    extends UnaryExpression with Md5Kernel {
  override def prettyName: String = "md5_minhash"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(k => s"$k:".getBytes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          val h = md5Hex(prefixes(k), bytes)
          if (mins(k) == null || lessThan(h, mins(k))) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromBytes(m)))
  }

  // Single-node JVM kernel: interpreted eval only (the MD5 work dominates;
  // codegen would just inline the same calls).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("md5minhash", this, classOf[Md5MinHash].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Banded K-permutation MinHash computed directly from text over its char
  * n-gram shingles, emitting band values (the LSH bucketing keys) in one
  * pass: min_k = min over window positions i of md5(prefix_k ++
  * text[i..i+n)) with prefix_k = "k:" when `prefixed` (else k must be 1);
  * band j = concat(min_{j*rows} .. min_{j*rows+rows-1}).
  *
  * Emitting bands (not raw mins) matters: CollapseProject inlines a
  * projection's expressions into every downstream reference, so a raw
  * mins array re-evaluated by `rows x bands` element_at band builders
  * costs `rows x bands` full passes. One expression, one pass.
  *
  * Duplicate shingles cannot change a min, so no distinct-set
  * materialization is needed (an 8-byte window dedups via a packed-long
  * seen-set). ASCII fast path hashes byte windows in place — no
  * per-window substring, no allocation. Identical results to the SQL
  * `array_min(transform(..., md5(substring(...))))` forms the oracles run. */
case class Md5MinHashShingles(child: Expression, shingleLen: Int,
                              numHashes: Int, bands: Int, rowsPerBand: Int,
                              prefixed: Boolean = true)
    extends UnaryExpression with Md5Kernel {
  require(bands * rowsPerBand <= numHashes, "bands*rowsPerBand must fit numHashes")
  require(prefixed || numHashes == 1, "unprefixed form is single-hash")
  override def prettyName: String = "md5_minhash_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  @transient private lazy val prefixes: Array[Array[Byte]] =
    if (prefixed) Array.tabulate(numHashes)(k => s"$k:".getBytes)
    else Array(Array.emptyByteArray)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val mins = new Array[Array[Byte]](numHashes)

    if (text.numBytes() == text.numChars()) {
      // ASCII: windows are byte slices hashed in place
      val bytes = text.getBytes
      val len = bytes.length
      val nWin = math.max(len - shingleLen + 1, 1)
      val seen = if (shingleLen <= 8) new java.util.HashSet[java.lang.Long]() else null
      var i = 0
      while (i < nWin) {
        val wLen = math.min(shingleLen, len - i)
        var fresh = true
        if (seen != null) {
          var key = 0L
          var b = 0
          while (b < wLen) { key = (key << 8) | (bytes(i + b) & 0xffL); b += 1 }
          fresh = seen.add(key)
        }
        if (fresh) {
          var k = 0
          while (k < numHashes) {
            digest.reset()
            if (prefixes(k).nonEmpty) digest.update(prefixes(k))
            digest.update(bytes, i, wLen)
            val h = hexDigest()
            if (mins(k) == null || lessThan(h, mins(k))) mins(k) = h
            k += 1
          }
        }
        i += 1
      }
    } else {
      val len = text.numChars()
      val nWin = math.max(len - shingleLen + 1, 1)
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i < nWin) {
        val s = text.substringSQL(i + 1, shingleLen)
        if (seen.add(s)) {
          val sBytes = s.getBytes
          var k = 0
          while (k < numHashes) {
            val h = md5Hex(prefixes(k), sBytes)
            if (mins(k) == null || lessThan(h, mins(k))) mins(k) = h
            k += 1
          }
        }
        i += 1
      }
    }

    val out: Array[UTF8String] =
      if (bands == 1 && rowsPerBand == 1 && numHashes == 1)
        Array(if (mins(0) == null) null else UTF8String.fromBytes(mins(0)))
      else Array.tabulate(bands) { j =>
        val buf = new Array[Byte](32 * rowsPerBand)
        var r = 0
        while (r < rowsPerBand) {
          val m = mins(j * rowsPerBand + r)
          System.arraycopy(m, 0, buf, 32 * r, 32)
          r += 1
        }
        UTF8String.fromBytes(buf)
      }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("md5minhashsh", this, classOf[Md5MinHashShingles].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over an array of tokens, emitted as a 64-char '0'/'1'
  * string: bit k's vote sums +-1 over tokens t according to bit k of
  * md5(t) (bit k = bit (3 - k%4) of hex digit k/4 — MSB-first within the
  * digit), bit set when the vote is non-negative. Matches the SQL
  * bit-vote form used by the DuckDB oracle. */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression with Md5Kernel {
  override def prettyName: String = "simhash64_md5"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  private val noPrefix = Array.emptyByteArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Hex(noPrefix, arr.getUTF8String(i).getBytes)
        var k = 0
        while (k < 64) {
          val digit = h(k >> 2)
          val v = if (digit <= '9') digit - '0' else digit - 'a' + 10
          val bit = (v >> (3 - (k & 3))) & 1
          votes(k) += (if (bit == 1) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var k = 0
    while (k < 64) {
      out(k) = if (votes(k) >= 0) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("simhash64", this, classOf[SimHash64Md5].getName)
      s"${ev.value} = (${classOf[UTF8String].getName}) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 16-bin nibble histogram of a binary payload in ONE pass over the
  * bytes: bin v counts how often nibble value v appears (hi then lo per
  * byte) — exactly the per-hex-digit counts of `hex(payload)` without
  * materializing the 2x hex string or scanning it 16 times (the
  * `length - length(replace(hx, digit, ''))` SQL form the oracle keeps:
  * ~34x payload bytes scanned vs 1x here). Sum of bins = 2 x bytes. */
case class NibbleHist(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nibble_hist"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nibble_hist needs binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      counts((b >>> 4) & 0xf) += 1L
      counts(b & 0xf) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |long[] $counts = new long[16];
         |for (int $i = 0; $i < $c.length; $i++) {
         |  byte $b = $c[$i];
         |  $counts[($b >>> 4) & 0xf] += 1L;
         |  $counts[$b & 0xf] += 1L;
         |}
         |${ev.value} = new ${classOf[GenericArrayData].getName}($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode canonicalization (java.text.Normalizer) — the text-dedup
  * pre-pass Spark has no built-in for: composed vs decomposed forms of
  * the same glyph ("é" as U+00E9 vs "e"+U+0301) hash differently, so
  * every exact/MinHash/shingle dedup silently misses them until the
  * corpus is normalized. NFC/NFD are canonical (lossless); NFKC/NFKD
  * additionally fold compatibility forms (fullwidth, ligatures) — the
  * usual choice for dedup keys. The form is bound at plan time (a
  * literal), so the per-row work is one library call over the string;
  * ASCII-only rows short-circuit inside the JDK (Normalizer checks
  * isNormalized cheaply), which is why running it over a mostly-ASCII
  * corpus costs near nothing. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs a string input, got ${child.dataType}")
    else if (!UnicodeNormalize.Forms.contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (expected one of ${UnicodeNormalize.Forms.mkString(", ")})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // ASCII fast path on the raw bytes: all-ASCII is normalized under
    // every form, so a mostly-ASCII corpus never pays the String
    // allocation + UTF-8 decode that toString would cost per row
    var i = 0
    val n = u.numBytes
    var ascii = true
    while (ascii && i < n) {
      if (u.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return input
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("unorm", this, classOf[UnicodeNormalize].getName)
      s"${ev.value} = (${classOf[UTF8String].getName}) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

/** Banded K-permutation MinHash over an ALREADY-HASHED shingle array
  * (array<long>): permutation k is the splitmix64 finalizer applied to
  * s + c_k (c_k a seed-derived odd constant), band j combines its
  * rowsPerBand mins with an FNV fold. ~3 multiplies per (element,
  * permutation) vs a full md5 per (window, permutation) in
  * [[Md5MinHashShingles]] — measured ~100x cheaper at K=126, which is
  * the difference between banding being a footnote and being 60% of
  * the containment router's wall. For CANDIDATE GENERATION only
  * (callers verify exactly): no oracle mirrors this hash family, by
  * design — the md5 kernel remains the oracle-parity path. */
case class MinHashBandsU64(child: Expression, bands: Int, rowsPerBand: Int,
                           seed: Long)
    extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
  override def prettyName: String = "minhash_bands_u64"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty shingle set -> null (no bands)

  @transient private lazy val consts: Array[Long] = {
    // splitmix64 stream from the seed; forced odd so s + c_k never
    // collapses permutations
    var z = seed
    Array.fill(bands * rowsPerBand) {
      z += 0x9E3779B97F4A7C15L
      var c = z
      c = (c ^ (c >>> 30)) * 0xBF58476D1CE4E5B9L
      c = (c ^ (c >>> 27)) * 0x94D049BB133111EBL
      (c ^ (c >>> 31)) | 1L
    }
  }

  def evalArray(a: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = a.numElements()
    if (n == 0) return null
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = a.getLong(i)
      var p = 0
      while (p < k) {
        var z = s + consts(p)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= (z >>> 31)
        if (z < mins(p)) mins(p) = z
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var v = -3750763034362895579L // FNV-1a 64 offset basis
      var r = 0
      while (r < rowsPerBand) {
        v = (v ^ mins(b * rowsPerBand + r)) * 1099511628211L
        r += 1
      }
      out(b) = v
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    evalArray(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("minhashU64", this, classOf[MinHashBandsU64].getName)
    // freshName: two instances in one codegen scope must not collide
    // (the AvroDecode precedent)
    val r = ctx.freshName("mhBands")
    nullSafeCodeGen(ctx, ev, a => s"""
       |Object $r = $expr.evalArray($a);
       |if ($r == null) { ${ev.isNull} = true; } else {
       |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r;
       |}
     """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  def md5MinHash(strings: Column, numHashes: Int): Column =
    Bridge.column(Md5MinHash(Bridge.expression(strings), numHashes))

  /** Unicode-normalize a string column (form: NFC/NFD/NFKC/NFKD). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), form))

  /** One-pass 16-bin nibble histogram of a binary column. */
  def nibbleHist(payload: Column): Column =
    Bridge.column(NibbleHist(Bridge.expression(payload)))

  /** Distinct char-`n`-shingle set of `text` — THE document-dedup unit.
    * One definition shared by the batch verify stage (DedupQueries), the
    * streaming dedup state, and (mirrored in SQL) their oracles: the
    * correctness story of every consumer is "identical shingle sets on
    * both sides", so this must not fork. Texts shorter than `n` yield
    * the whole text as the single shingle. */
  def charShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions._
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))
  }

  /** 64-bit-hashed distinct character shingles: the [[charShingles]] set
    * with xxhash64 applied INSIDE the transform, so the per-doc
    * `array_distinct` compares 8-byte longs instead of n-char strings
    * and no string array ever materializes. Set-equal to hashing
    * [[charShingles]] afterwards absent a 64-bit collision; for
    * consumers that only count/join shingles (containment, overlap)
    * the string form is never needed. */
  def charShingleHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions._
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(n)))))
  }

  /** Exact Jaccard >= 0.8 on shingle-set columns in integer arithmetic:
    * 9|I| >= 4(|A|+|B|)  <=>  |I|/(|A|+|B|-|I|) >= 0.8 — no doubles, so
    * boundary pairs are engine-independent. */
  def jaccardAtLeast08(aSh: Column, bSh: Column): Column = {
    import org.apache.spark.sql.functions._
    size(array_intersect(aSh, bSh)) * 9 >= (size(aSh) + size(bSh)) * 4
  }

  /** Register SQL names (args after the first must be foldable ints). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def lit(e: Expression): Int =
      e.eval(null) match { case i: Int => i; case l: Long => l.toInt }
    reg.createOrReplaceTempFunction("md5_minhash",
      es => Md5MinHash(es.head, lit(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("md5_minhash_shingles",
      es => Md5MinHashShingles(es.head, lit(es(1)), lit(es(2)), lit(es(3)), lit(es(4))), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64Md5(es.head), "scala_udf")
  }
  /** bands=numHashes, rowsPerBand=1 returns the raw min-hash array. */
  def md5MinHashShingles(text: Column, shingleLen: Int, numHashes: Int,
                         bands: Int, rowsPerBand: Int,
                         prefixed: Boolean = true): Column =
    Bridge.column(Md5MinHashShingles(Bridge.expression(text), shingleLen,
      numHashes, bands, rowsPerBand, prefixed))
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Md5(Bridge.expression(tokens)))

  /** Banded MinHash over an array<long> of shingle hashes — the fast
    * candidate-generation path (see [[MinHashBandsU64]]). */
  def minhashBandsU64(shingleHashes: Column, bands: Int, rowsPerBand: Int,
                      seed: Long = 0x5EEDC0DEL): Column =
    Bridge.column(MinHashBandsU64(Bridge.expression(shingleHashes),
      bands, rowsPerBand, seed))
}
