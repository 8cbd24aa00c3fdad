package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Corpus-curation operators a training-data pipeline runs AFTER the
  * dedup/quality primitives: duplicate-group resolution (pairs ->
  * connected components -> one survivor per group), train/eval
  * decontamination by shared n-grams, deterministic stratified sampling
  * for language-mix control, and token-budget shard packing. Every query
  * is hash-verified against a DuckDB oracle running the identical
  * computation (md5-keyed sampling; recursive-CTE reachability for the
  * components).
  */
object Curation {
  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** The STATELESS stage chain of the release pipeline — inject
    * (deterministic PII + unicode forms), NFC-normalize, redact, count,
    * token floor — as one reusable transform over any (doc_id, text,
    * source) frame. ONE definition drives the batch capstone
    * (p_release_pipeline) and the streaming twin
    * ([[graft.streaming.StreamingRelease]]), so the two cannot drift;
    * only the DEDUP stage differs (batch: min-doc_id window; streaming:
    * durable first-arrival state). Output keeps `text` for the caller's
    * dedup key. */
  private[graft] def releaseTransform(df: DataFrame): DataFrame = {
    import graft.operators.Pii
    val aug = concat(col("text"), Text.piiSuffixCol, lit(Text.uniSuffix))
    val norm = graft.functions.TextFunctions.unicodeNormalize(aug, "NFC")
    df.select(col("doc_id"), col("text"), col("source"), norm.as("norm"))
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .select(Seq(col("doc_id"), col("text"), col("n_tok")) ++
        Pii.countCols(col("norm")) :+
        Pii.redactCol(col("norm")).as("released"): _*)
  }

  /** Memoized components of the MinHash near-dup pair graph:
    * d_dup_groups and d_dedup_resolve share one CC run per input dir.
    * The memo holds a parquet PATH, never a live DataFrame (the
    * buildDirCache pattern — a session-bound frame pinned in a static
    * map outlives its app and leaks cached blocks); the write also
    * materializes eagerly so the iteration's checkpoints can drop. The
    * computation is deterministic in `dir`, so the path is reusable
    * across sessions in one JVM. */
  private val compDirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dupComponents(s: SparkSession, dir: String): DataFrame = {
    val path = compDirCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("dup_components") {
        val out = graft.TempDirs.create("graft_dupcomp_")
        val pairs = DedupQueries.defs("d_neardup_minhash")(s, dir)
        ConnectedComponents.run(
            pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
          .write.mode("overwrite").parquet(out)
        out
      }
    })
    s.read.parquet(path)
  }

  /** Token-budget per shard for s_pack_shards (tokens, not chars). */
  private val ShardCapacity = 2000L

  /** Per-language deterministic sampling thresholds for s_sample_mix:
    * keep a doc when the first 4 hex chars of md5("smp:" || doc_id) sort
    * below the threshold — a 16-bit uniform key both engines compute
    * identically, so rate = threshold/0x10000. Down-weights the dominant
    * language (en), up-weights the rarest (zh): the language-rebalancing
    * move of a training-mix builder. */
  private val SampleThresholds: Seq[(String, String)] =
    Seq("en" -> "4000", "zh" -> "c000") // others -> "8000" (50%)
  private val DefaultThreshold = "8000"

  private def thresholdCol: org.apache.spark.sql.Column =
    SampleThresholds.foldRight(lit(DefaultThreshold)) { case ((l, t), acc) =>
      when(col("lang") === l, lit(t)).otherwise(acc)
    }
  private def thresholdSql: String =
    SampleThresholds.map { case (l, t) => s"WHEN lang = '$l' THEN '$t'" }
      .mkString("CASE ", " ", s" ELSE '$DefaultThreshold' END")

  /** The 5-token-shingle unit as ONE expression over a `toks` column —
    * decontamination and both source-overlap rows must agree on the
    * n-gram definition, so it must not fork (the charShingles rule). */
  private val fiveGramExpr =
    "array_distinct(transform(sequence(1, greatest(size(toks)-4, 1))," +
      " i -> concat_ws(' ', slice(toks, i, 5))))"

  /** Distinct 5-token shingles per doc — the decontamination unit. Word
    * n-grams (not char shingles): contamination checks ask "does a train
    * doc contain an eval PHRASE", and 5 tokens is the conventional
    * overlap window. Memoized to parquet (round-20, the sourceShingles
    * discipline): t_contamination and p_train_mix each re-ran the
    * corpus-wide explode + concat kernel per serve (~12 s of task time
    * at sf0.1 inside p_train_mix alone); it is the same corpus-layout
    * artifact class, built once per dir and ledgered to one_time_s. */
  private val wordShingleCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def wordShingles(s: SparkSession, dir: String): DataFrame = {
    val path = wordShingleCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("word_shingles") {
        val out = graft.TempDirs.create("graft_wshingles_")
        // spread (round-19): the 5-gram explode + concat kernel on the
        // single-split docs scan ran on one core; identity at real scale
        Tables.spread(docs(s, dir))
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), explode(expr(fiveGramExpr)).as("ngram"))
          .write.mode("overwrite").parquet(out)
        out
      }
    })
    s.read.parquet(path)
  }

  /** Memoized distinct (source, 5-gram) universe — the corpus-layout
    * artifact BOTH source-overlap rows read (the exact xxhash64 row and
    * the KMV md5-48 row hash it differently, but the expensive explode +
    * string distinct is identical), built once per dir and ledgered to
    * one_time_s like bm25_scores / exact_truth_*. text IS NOT NULL is
    * applied here once, mirrored in both oracles. */
  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sourceShingles(s: SparkSession, dir: String): DataFrame = {
    val path = shingleCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("source_shingles") {
        val out = graft.TempDirs.create("graft_shingles_")
        // spread (round-19): same single-split rationale as wordShingles
        Tables.spread(docs(s, dir)).filter(col("text").isNotNull)
          .select(col("source"), split(col("text"), " ").as("toks"))
          .select(col("source"), explode(expr(fiveGramExpr)).as("ngram"))
          .distinct()
          .write.mode("overwrite").parquet(out)
        out
      }
    })
    s.read.parquet(path)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pair lists don't dedup a corpus — GROUPS do: resolve the verified
    // MinHash near-dup pairs into connected components (A~B, B~C => one
    // {A,B,C} group). Distributed min-label propagation; the DuckDB
    // oracle recomputes components via recursive-CTE reachability.
    "d_dup_groups" -> ((s, dir) => {
      val comp = dupComponents(s, dir)
      val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("group_size"))
      comp.join(sizes, "comp")
        .select(col("id").as("doc_id"), col("comp").as("comp_id"), col("group_size"))
        .orderBy(col("doc_id"))
    }),

    // Group-level dedup resolution: keep exactly one canonical doc (the
    // minimum id = the component label) per duplicate group. The honest
    // survivor count — pair-level dropping (p_curate's b_id rule) can
    // over- or under-drop on chains; this can't.
    "d_dedup_resolve" -> ((s, dir) => {
      val comp = dupComponents(s, dir)
      val nInput = docs(s, dir).count()
      // one pass over the (tiny) component table for both counts
      val stats = comp.agg(count(lit(1)).as("members"),
        countDistinct(col("comp")).as("groups")).first()
      val (nMembers, nGroups) = (stats.getLong(0), stats.getLong(1))
      import s.implicits._
      Seq((nInput, nGroups, nMembers - nGroups, nInput - (nMembers - nGroups)))
        .toDF("n_input", "n_groups", "n_dropped", "n_kept")
    }),

    // Quality-weighted survivor selection: instead of the min-id
    // canonical doc, keep the HIGHEST-QUALITY member of each duplicate
    // group (the t_quality_score heuristic; ties to the smaller id) —
    // what a curation pipeline actually wants to keep. The ranking window
    // runs over the component member table only (dup members << corpus),
    // not the raw corpus.
    "d_resolve_quality" -> ((s, dir) => {
      val comp = dupComponents(s, dir)
      val quality = Text.defs("t_quality_score")(s, dir)
        .select(col("doc_id"), col("quality"))
      val w = Window.partitionBy(col("comp"))
        .orderBy(col("quality").desc, col("doc_id"))
      comp.join(quality, comp("id") === quality("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("comp"), col("doc_id").as("survivor_doc"), col("quality"))
        .join(comp.groupBy(col("comp")).agg(count(lit(1)).as("group_size")), "comp")
        .select(col("comp").as("comp_id"), col("survivor_doc"),
          col("quality"), col("group_size"))
        .orderBy(col("comp_id"))
    }),

    // Train/eval decontamination: which training docs share a 5-token
    // phrase with the held-out split (doc_id % 20 = 0)? The n-gram
    // hash-join shape scales: shuffle is O(total distinct shingles), the
    // standard overlap-detection plan at corpus scale.
    "t_contamination" -> ((s, dir) => {
      val sh = wordShingles(s, dir)
      val evalSh = sh.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("eval_id"), col("ngram"))
      val trainSh = sh.filter(col("doc_id") % 20 =!= 0)
      trainSh.join(evalSh, "ngram")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("ngram")).as("n_shared_ngrams"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic stratified sampling: per-language keep rates from an
    // md5-keyed uniform — reproducible on any engine, no RNG state, the
    // way a training-mix spec pins its sample. Emits per-language
    // input/sampled/token counts.
    "s_sample_mix" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("keep",
          substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 4)
            < thresholdCol)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("n_tokens_sampled"))
        .orderBy(col("lang"))
    }),

    // The capstone composite: the WHOLE training-mix pipeline as one DAG —
    // duplicate-group survivors (min-id per MinHash component), eval-split
    // exclusion + shingle decontamination, quality floor, deterministic
    // stratified sampling, then token-budget shard packing — reporting
    // per-language docs/tokens/shards. Every stage is an already-proven
    // operator; the oracle recomputes the identical composition end-to-end
    // (recursive-CTE components + shingle join + quality SQL + md5
    // sampling + prefix-sum packing), so the final numbers are hash-exact.
    // Per-stage scale shapes are unchanged by composition: Catalyst fuses
    // the row-local flags into one scan and the left-antis stay
    // broadcastable (dup/contaminated id sets are small).
    // RELEASE-PIPELINE CAPSTONE: the whole pre-release chain as ONE
    // hash-exact query — inject (deterministic PII + unicode forms, the
    // t_pii_redact/t_unicode_nfc injections via the SHARED fragments),
    // NFC-normalize, redact, quality-gate (integer token floor on the
    // original text), exact-dedup (keep min doc_id per identical text —
    // live duplicates exist at sf0.1). A single character of drift in
    // any stage breaks the released-text hash. Plan shape: per-row
    // codegen'd expressions + one window over the text key + the final
    // sort — two shuffles total at any corpus size.
    "p_release_pipeline" -> ((s, dir) => {
      Curation.releaseTransform(docs(s, dir))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("text")).orderBy(col("doc_id"))))
        .filter(col("n_tok") >= 30 && col("rn") === 1)
        .drop("text", "rn")
        .orderBy(col("doc_id"))
    }),

    "p_train_mix" -> ((s, dir) => {
      val comp = dupComponents(s, dir)
      val dupDrops = comp.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      val sh = wordShingles(s, dir)
      val evalSh = sh.filter(col("doc_id") % 20 === 0)
        .select(col("ngram")).distinct()
      val contaminated = sh.filter(col("doc_id") % 20 =!= 0)
        .join(evalSh, "ngram").select(col("doc_id")).distinct()
      // quality/n_tok come from the PROVEN operator, not a re-derivation
      // (the capstone composes t_quality_score, it must not fork it)
      val qdf = Text.defs("t_quality_score")(s, dir)
        .select(col("doc_id"), col("n_tok"), col("quality"))
      val kept = docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"))
        .join(qdf, "doc_id")
        .withColumn("keep_sample",
          substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 4)
            < thresholdCol)
        .filter(col("doc_id") % 20 =!= 0) // the eval split never trains
        .join(dupDrops, Seq("doc_id"), "left_anti")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .filter(col("quality") >= 0.5 && col("keep_sample"))
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      kept
        .withColumn("cum0", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("shard_id", expr(s"cum0 div $ShardCapacity"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          countDistinct(concat_ws(":", col("source"), col("shard_id"))).as("n_shards"))
        .orderBy(col("lang"))
    }),

    // Token-budget shard packing: within each (lang, source) stream, in
    // doc_id order, a doc opens a new shard when the running token count
    // crosses the capacity — running-prefix-sum assignment (one window
    // per stream partition, no driver loop), the shape that builds
    // ~equal-token training shards from a sorted corpus.
    "s_pack_shards" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum0", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("shard_id", expr(s"cum0 div $ShardCapacity"))
        .groupBy(col("lang"), col("source"), col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("lang"), col("source"), col("shard_id"))
    }),

    // Curriculum shard packing: the whole corpus in ONE global quality
    // order (integer quality key, ties by doc_id), token-budget packed
    // in that order — easy-to-hard data ordering for training. The
    // global running sum is a TWO-PHASE distributed prefix sum (range-
    // partition on the order key, per-partition window, driver-side
    // offsets over num-partitions rows), never a single-partition
    // window; range boundaries are sampled but the prefix over a TOTAL
    // order is boundary-invariant, so the output is deterministic.
    "s_curriculum_shards" -> ((s, dir) => {
      val stop = Text.stopSql
      val scored = docs(s, dir)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_stop",
          expr(s"size(filter(split(text, ' '), tok -> tok IN $stop))").cast("long"))
        .withColumn("quality_u",
          expr("(n_stop * 1000000) div n_tok") +
            least(lit(1000000L), expr("(n_chars * 1000000) div 500")))
      val pre = graft.operators.PrefixSum.ranged(scored,
        s.sparkContext.defaultParallelism,
        Seq(col("quality_u").desc, col("doc_id")), col("n_tok"))
      val localW = Window.partitionBy(col("pid"))
        .orderBy(col("quality_u").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      pre.df
        .withColumn("cum0", coalesce(sum(col("n_tok")).over(localW), lit(0L)) + pre.offset)
        .withColumn("shard_id", expr(s"cum0 div $ShardCapacity"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          max(col("quality_u")).as("max_quality_u"),
          min(col("quality_u")).as("min_quality_u"))
        .orderBy(col("shard_id"))
    }),

    // Corpus forensics: source x source 5-token-shingle overlap — which
    // sources copy from each other (syndication, mirrors) BEFORE they
    // pollute a train/eval split. One inverted shingle index, one
    // self-join keyed on the shingle, integer Jaccard in basis points.
    // Cross-source overlap from KMV sketches — the sketch-serving twin
    // of d_source_overlap: per source, the k smallest 48-bit md5 hashes
    // of its distinct 5-gram shingles (a bounded aggregate: k longs per
    // source cross the shuffle, not the shingle inventory), then every
    // pair's Jaccard estimated from the union sketch (the fraction of
    // its values present in BOTH sketches — Beyer et al. SIGMOD'07 §5).
    // The row carries the exact hash-space Jaccard next to the estimate
    // (audit discipline); at 100 TB the exact self-join column is the
    // one you drop, and per-source sketches persist as ~2 KB rows that
    // answer any pair later. FULL hash oracle: hashes, sketch, and
    // estimator are all reproducible ANSI SQL (see Kmv.scala).
    "d_source_overlap_kmv" -> ((s, dir) => {
      import graft.operators.Kmv
      val k = 256
      // distinct (source, shingle-hash) universe — BOTH the exact side
      // and the sketch side read it, so estimate and truth share one
      // hash space and the audit isolates pure estimator error. Built
      // from the memoized string universe (shared with d_source_overlap);
      // the md5-48 hash + h-level distinct mirror the oracle's sh0 CTE.
      val sh = sourceShingles(s, dir)
        .select(col("source"), Kmv.hash48(col("ngram")).as("h"))
        .distinct()
        // LAZY: the perSource EAGER checkpoint below is the first action
        // and materializes these blocks in its own job — one scheduler
        // round-trip fewer; the shared pass then reads the blocks
        .localCheckpoint(eager = false)
      // Round-19 (guide §2.3/§2.4): the exact-intersection self-join on h
      // shuffled the full (source, h) universe TWICE and the sizes/sketch
      // aggregations scanned it in two more passes. Fused: ONE
      // groupBy(source) pass carries count + KMV sketch together, and the
      // shared counts come from ONE groupBy(h) pass generating ordered
      // source pairs map-side (df per h is bounded by the source count,
      // the Containment capped-inverted-index shape) — identical counts,
      // two wide shuffles fewer. array_sort orders the same binary string
      // ordering the old x.source < y.source join used.
      val perSource = sh.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          Kmv.sketchAgg(k)(col("h")).getField("hs").as("kmv"))
        .localCheckpoint() // both pair sides read it
      val shared = sh.groupBy(col("h"))
        .agg(collect_list(col("source")).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(array_sort(col("ss")).as("ss")) // sort ONCE (a < b holds)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ss) - 1), i -> " +
            "transform(slice(ss, i + 1, size(ss) - i), " +
            "b -> struct(element_at(ss, i) AS a_source, b AS b_source))))")).as("p"))
        .groupBy(col("p.a_source").as("a_source"), col("p.b_source").as("b_source"))
        .agg(count(lit(1)).as("n_shared"))
      val pairs = perSource.select(col("source").as("a_source"),
          col("kmv").as("kmv_a"), col("n").as("a_n"))
        .join(perSource.select(col("source").as("b_source"),
          col("kmv").as("kmv_b"), col("n").as("b_n")),
          col("a_source") < col("b_source"))
      pairs
        .join(shared, Seq("a_source", "b_source"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("jaccard_bp_exact",
          expr("n_shared * 10000 div (a_n + b_n - n_shared)"))
        .withColumn("jaccard_bp_kmv", Kmv.jaccardBp(col("kmv_a"), col("kmv_b"), k))
        .select(col("a_source"), col("b_source"), col("jaccard_bp_exact"),
          col("jaccard_bp_kmv"),
          abs(col("jaccard_bp_kmv") - col("jaccard_bp_exact")).as("err_bp"))
        .orderBy(col("a_source"), col("b_source"))
    }),

    // Fixed-length training-sequence packing — the LAST stage of a
    // pretraining data pipeline: the doc_id-ordered token stream is cut
    // into L=256-token sequences (docs concatenated, boundaries crossing
    // docs), and each sequence reports how many docs it spans and its
    // token fill. The global running offset comes from the two-phase
    // distributed PrefixSum (range-partition + per-partition window +
    // broadcast offsets) — NO single-partition global window ever runs,
    // and no token is materialized: everything is arithmetic on per-doc
    // counts. A doc spans ceil-interval [start div L, (end-1) div L];
    // the explode is bounded by n_tok/L + 1 rows per doc. The complement
    // of s_pack_shards (budget packing of whole docs): here docs SPLIT
    // across fixed windows, the sequence-packing shape actual trainers
    // consume. FULL hash oracle (window cumsum + generate_series twin).
    "s_pack_sequences" -> ((s, dir) => {
      import graft.operators.PrefixSum
      val L = 256
      // n_tok >= 1 mirrored in the oracle: a zero-token doc contributes
      // to no sequence, and Spark's sequence(a, b) with b < a generates
      // a DESCENDING pair (phantom membership) where DuckDB's
      // generate_series is empty — a latent parity break. (split()
      // never yields 0 tokens today; the guard is the contract.)
      val d = docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        .filter(col("n_tok") >= 1)
      val r = PrefixSum.ranged(d, numPartitions = 32,
        order = Seq(col("doc_id")), weight = col("n_tok"))
      val prev = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      r.df
        .withColumn("start",
          r.offset + coalesce(sum(col("n_tok")).over(prev), lit(0L)))
        .withColumn("fin", col("start") + col("n_tok"))
        .select(col("doc_id"), col("start"), col("fin"),
          explode(sequence(expr(s"start div $L"), expr(s"(fin - 1) div $L")))
            .as("seq_id"))
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("fin"), (col("seq_id") + 1) * L) -
            greatest(col("start"), col("seq_id") * L)).as("n_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("seq_id"))
    }),

    // Weighted (probability-proportional-to-size) sampling — sequential
    // Poisson / Ohlsson: rank docs by key = u/w (u = 48-bit md5 hash,
    // w = n_chars) and keep the k smallest per language; inclusion
    // probability grows ~proportionally with w, the "sample long/high-
    // quality docs more" curation draw that completes the sampling
    // family (fixed-rate s_sample_mix, fixed-k s_sample_reservoir,
    // temperature s_temperature_mix). Cross-engine exactness: u and w
    // are integers and SCALAR double division is IEEE-deterministic in
    // both engines (Tables.scala contract), so both sides rank the same
    // keys; the k-bounded aggregate ranks them WITHOUT a per-group sort
    // via the order-preserving double->long bits map (double_order_bits
    // — exactly invertible, so ties fire exactly when the oracle's
    // ORDER BY sees a tie; this needs keys that can't be -0.0, which
    // u/w with u >= 0, w >= 1 guarantees — see the expression's
    // scaladoc). FULL hash oracle.
    "s_sample_weighted" -> ((s, dir) => {
      import graft.functions.OrderBitsFunctions.doubleOrderBits
      import graft.operators.{GroupTopK, Kmv}
      val k = 8
      docs(s, dir).filter(col("n_chars") >= 1)
        .select(col("lang"), col("doc_id"),
          (Kmv.hash48(concat(lit("wsp:"), col("doc_id").cast("string")))
            .cast("double") / col("n_chars").cast("double")).as("key"))
        .groupBy(col("lang"))
        // bitwise NOT reverses the total order branch-free and can never
        // overflow for ANY bits image (negate would also be safe under
        // the signed-sortable map — its MIN_VALUE image is unreachable —
        // but ~x stays safe even if the map changes)
        .agg(GroupTopK.topK(k)(
          bitwise_not(doubleOrderBits(col("key"))), col("doc_id")).as("t"))
        .select(col("lang"), posexplode(col("t.ids")).as(Seq("pos", "doc_id")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"), col("doc_id"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Temperature-reweighted language mixture (the UNIMAX / mT5 data-
    // mixing shape): per-language sample targets proportional to
    // n_lang^alpha with alpha = 1/2, boosting low-resource languages
    // above their natural share, then a deterministic md5-ranked draw of
    // exactly target_n docs per language. Everything is engine-exact:
    // the temperature weight is a two-step-adjusted INTEGER sqrt (a
    // 1-ulp sqrt disagreement between engines cannot change it), targets
    // are integer division of a fixed budget, and the draw reuses the
    // bounded GroupTopK hash rank (no RNG, no per-group sort). The
    // counts aggregation is tiny (one row per language); only the
    // budget-bounded rank aggregate sees the corpus.
    "s_temperature_mix" -> ((s, dir) => {
      import graft.operators.{GroupTopK, Kmv}
      val budget = 100
      val d = docs(s, dir)
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val w = counts
        .withColumn("s0", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
        .withColumn("s1", col("s0") -
          when(col("s0") * col("s0") > col("n_docs"), 1L).otherwise(0L))
        .withColumn("w", col("s1") +
          when((col("s1") + 1) * (col("s1") + 1) <= col("n_docs"), 1L).otherwise(0L))
      val tot = w.agg(sum(col("w")).as("sum_w"))
      val targets = w.crossJoin(broadcast(tot))
        .withColumn("target_n",
          least(expr(s"($budget * w) div sum_w"), col("n_docs")))
        .select(col("lang"), col("n_docs"), col("target_n"))
      d.select(col("lang"), col("doc_id"),
          Kmv.hash48(concat(lit("tmx:"), col("doc_id").cast("string"))).as("h"))
        .groupBy(col("lang"))
        .agg(GroupTopK.topK(budget)(negate(col("h")), col("doc_id")).as("t"))
        .select(col("lang"), posexplode(col("t.ids")).as(Seq("pos", "doc_id")))
        .join(broadcast(targets), "lang")
        .filter(col("pos") < col("target_n"))
        .select(col("lang"), col("n_docs"), col("target_n"),
          (col("pos") + 1).cast("long").as("rank"), col("doc_id"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Deterministic fixed-size uniform sample per language — the
    // reservoir-sampling shape (k rows per group, every row equally
    // likely under the md5 order) WITHOUT a reservoir: the k-bounded
    // GroupTopK aggregate keeps the k smallest salted hashes per group
    // map-side, so the shuffle carries O(groups x k x partitions) rows
    // and no per-group sort or RNG state exists anywhere — reruns and
    // stragglers can't change the sample. The fixed-k dual of
    // s_sample_mix's fixed-RATE Bernoulli sampler (eval sets want
    // exactly-k, not rate*n). FULL hash oracle via the row_number twin.
    "s_sample_reservoir" -> ((s, dir) => {
      import graft.operators.{GroupTopK, Kmv}
      val k = 8
      docs(s, dir)
        .select(col("lang"), col("doc_id"),
          Kmv.hash48(concat(lit("rsv:"), col("doc_id").cast("string"))).as("h"))
        .groupBy(col("lang"))
        // smallest hash first == topK on the negated hash (v DESC, id ASC)
        .agg(GroupTopK.topK(k)(negate(col("h")), col("doc_id")).as("t"))
        .select(col("lang"), posexplode(col("t.ids")).as(Seq("pos", "doc_id")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"), col("doc_id"))
        .orderBy(col("lang"), col("rank"))
    }),

    "d_source_overlap" -> ((s, dir) => {
      // Shingles are 64-bit-HASHED before the self-join: the join
      // shuffles 8-byte keys instead of raw ~25-byte 5-gram strings
      // (~5x fewer shuffle bytes at corpus scale). Counting distinct
      // hashes equals counting distinct strings absent a 64-bit
      // collision (P ~ n^2/2^65 — immaterial even at 100 TB), so the
      // string-keyed oracle still applies. The explode + string
      // distinct comes from the memoized sourceShingles universe
      // (shared with d_source_overlap_kmv; text IS NOT NULL applied
      // there, mirrored in the oracle).
      val grams = sourceShingles(s, dir)
        .select(col("source"), xxhash64(col("ngram")).as("ngram"))
        .localCheckpoint() // feeds the sizes agg + the shared pass
      val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
      // Round-19: ONE groupBy(ngram) pass generating ordered source pairs
      // map-side instead of the self-join's two full-universe shuffles —
      // df per hash is bounded by the source count (the Containment
      // capped shape); identical pair set and counts (array_sort uses the
      // same binary string ordering as x.source < y.source).
      val shared = grams.groupBy(col("ngram"))
        .agg(collect_list(col("source")).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(array_sort(col("ss")).as("ss")) // sort ONCE (a < b holds)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ss) - 1), i -> " +
            "transform(slice(ss, i + 1, size(ss) - i), " +
            "b -> struct(element_at(ss, i) AS a_source, b AS b_source))))")).as("p"))
        .groupBy(col("p.a_source").as("a_source"), col("p.b_source").as("b_source"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(sizes.select(col("source").as("a_source"), col("n").as("a_n")), "a_source")
        .join(sizes.select(col("source").as("b_source"), col("n").as("b_n")), "b_source")
        .withColumn("jaccard_bp",
          expr("n_shared * 10000 div (a_n + b_n - n_shared)"))
        .select(col("a_source"), col("b_source"), col("n_shared"), col("jaccard_bp"))
        .orderBy(col("a_source"), col("b_source"))
    })
  )

  /** Word-shingle CTE pair with caller-chosen names (minhashPairsCtes
    * owns t/sh in composed oracles, so the capstone needs fresh names —
    * parameterizing keeps the 5-token window defined in ONE place). */
  private def shinglesCteNamed(t: String, sh: String): String =
    s"""$t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |$sh AS (SELECT doc_id,
       |  unnest(list_distinct(list_transform(generate_series(1, greatest(len(toks)-4, 1)),
       |    i -> array_to_string(toks[i:i+4], ' ')))) AS ngram
       |  FROM $t)""".stripMargin

  private val shinglesCte = shinglesCteNamed("t", "sh")

  val oracles: Map[String, String] = Map(
    "d_dup_groups" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
         |e AS (SELECT a_id AS s, b_id AS d FROM pairs
         |      UNION SELECT b_id AS s, a_id AS d FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, s FROM e
         |  UNION
         |  SELECT reach.id, e.d FROM reach JOIN e ON e.s = reach.r),
         |comp AS (SELECT id, min(r) AS comp_id FROM reach GROUP BY id)
         |SELECT id AS doc_id, comp_id,
         |  CAST(count(*) OVER (PARTITION BY comp_id) AS BIGINT) AS group_size
         |FROM comp ORDER BY doc_id""".stripMargin,

    "d_dedup_resolve" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
         |e AS (SELECT a_id AS s, b_id AS d FROM pairs
         |      UNION SELECT b_id AS s, a_id AS d FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, s FROM e
         |  UNION
         |  SELECT reach.id, e.d FROM reach JOIN e ON e.s = reach.r),
         |comp AS (SELECT id, min(r) AS comp_id FROM reach GROUP BY id),
         |k AS (SELECT count(*) AS n_members, count(DISTINCT comp_id) AS n_groups FROM comp)
         |SELECT (SELECT count(*) FROM documents) AS n_input,
         |  CAST(n_groups AS BIGINT) AS n_groups,
         |  CAST(n_members - n_groups AS BIGINT) AS n_dropped,
         |  CAST((SELECT count(*) FROM documents) - (n_members - n_groups) AS BIGINT) AS n_kept
         |FROM k""".stripMargin,

    "d_resolve_quality" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
         |e AS (SELECT a_id AS s, b_id AS d FROM pairs
         |      UNION SELECT b_id AS s, a_id AS d FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, s FROM e
         |  UNION
         |  SELECT reach.id, e.d FROM reach JOIN e ON e.s = reach.r),
         |comp AS (SELECT id, min(r) AS comp_id FROM reach GROUP BY id),
         |q AS (SELECT * FROM ${Text.qualitySubquerySql}),
         |j AS (SELECT comp.comp_id, comp.id, q.quality,
         |      row_number() OVER (PARTITION BY comp.comp_id
         |        ORDER BY q.quality DESC, comp.id) AS rk
         |      FROM comp JOIN q ON q.doc_id = comp.id),
         |g AS (SELECT comp_id, CAST(count(*) AS BIGINT) AS group_size
         |      FROM comp GROUP BY 1)
         |SELECT j.comp_id, j.id AS survivor_doc, j.quality, g.group_size
         |FROM j JOIN g USING (comp_id) WHERE rk = 1 ORDER BY comp_id""".stripMargin,

    "t_contamination" ->
      s"""WITH $shinglesCte,
         |ev AS (SELECT doc_id AS eval_id, ngram FROM sh WHERE doc_id % 20 = 0),
         |tr AS (SELECT doc_id, ngram FROM sh WHERE doc_id % 20 != 0)
         |SELECT tr.doc_id,
         |  CAST(count(DISTINCT tr.ngram) AS BIGINT) AS n_shared_ngrams,
         |  CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
         |FROM tr JOIN ev ON tr.ngram = ev.ngram
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    // word-shingle CTEs renamed (wt/wsh) — minhashPairsCtes already owns
    // the names t/sh
    // composed from the SAME shared fragments as the stage rows
    "p_release_pipeline" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text,
         |    text || ${Text.piiSuffixSql} || ${Text.uniSuffixSql} AS aug
         |  FROM documents),
         |n AS (SELECT doc_id, text, nfc_normalize(aug) AS norm FROM aug),
         |g AS (SELECT doc_id, norm,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |      FROM n)
         |SELECT doc_id, n_tok,
         |  CAST(len(regexp_extract_all(norm, '${Text.EmailRegex}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(regexp_replace(norm, '${Text.EmailRegex}', '<EMAIL>', 'g'), '${Text.PhoneRegex}')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(norm, '${Text.EmailRegex}', '<EMAIL>', 'g'), '${Text.PhoneRegex}', '<PHONE>', 'g'), '${Text.Ipv4Regex}')) AS BIGINT) AS n_ip,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    norm, '${Text.EmailRegex}', '<EMAIL>', 'g'),
         |    '${Text.PhoneRegex}', '<PHONE>', 'g'),
         |    '${Text.Ipv4Regex}', '<IP>', 'g') AS released
         |FROM g WHERE n_tok >= 30 AND rn = 1
         |ORDER BY doc_id""".stripMargin,

    "p_train_mix" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
         |e AS (SELECT a_id AS s, b_id AS d FROM pairs
         |      UNION SELECT b_id AS s, a_id AS d FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, s FROM e
         |  UNION
         |  SELECT reach.id, e.d FROM reach JOIN e ON e.s = reach.r),
         |comp AS (SELECT id, min(r) AS comp_id FROM reach GROUP BY id),
         |dupdrop AS (SELECT id AS doc_id FROM comp WHERE id != comp_id),
         |${shinglesCteNamed("wt", "wsh")},
         |ev AS (SELECT DISTINCT ngram FROM wsh WHERE doc_id % 20 = 0),
         |cont AS (SELECT DISTINCT wsh.doc_id FROM wsh JOIN ev USING (ngram)
         |         WHERE wsh.doc_id % 20 != 0),
         |q AS (SELECT * FROM ${Text.qualitySubquerySql}),
         |kept AS (
         |  SELECT d.doc_id, d.lang, d.source, q.n_tok
         |  FROM documents d JOIN q ON q.doc_id = d.doc_id
         |  WHERE d.doc_id % 20 != 0
         |    AND d.doc_id NOT IN (SELECT doc_id FROM dupdrop)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
         |    AND q.quality >= 0.5
         |    AND substring(md5('smp:' || CAST(d.doc_id AS VARCHAR)), 1, 4)
         |        < ($thresholdSql)),
         |packed AS (
         |  SELECT lang, source, n_tok,
         |    COALESCE(sum(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $ShardCapacity
         |      AS shard_id
         |  FROM kept)
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT source || ':' || CAST(shard_id AS VARCHAR)) AS BIGINT) AS n_shards
         |FROM packed GROUP BY lang ORDER BY lang""".stripMargin,

    "s_sample_mix" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_sampled
         |FROM (
         |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 4) < ($thresholdSql) AS keep
         |  FROM documents)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "s_pack_shards" ->
      s"""WITH t AS (SELECT lang, source, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT lang, source, doc_id, n_tok,
         |    COALESCE(sum(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
         |  FROM t)
         |SELECT lang, source, CAST(cum0 // $ShardCapacity AS BIGINT) AS shard_id,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM c GROUP BY lang, source, shard_id
         |ORDER BY lang, source, shard_id""".stripMargin,

    // the oracle states the global prefix sum directly as one window —
    // the Spark side's two-phase partitioned form computes the same
    // totals because the order (quality_u DESC, doc_id) is TOTAL
    "s_curriculum_shards" -> {
      val stop = Text.stopSql
      s"""WITH t AS (SELECT doc_id, n_chars,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), tok -> tok IN $stop)) AS BIGINT) AS n_stop
         |  FROM documents),
         |q AS (SELECT doc_id, n_tok,
         |    (n_stop * 1000000) // n_tok
         |      + least(1000000, (n_chars * 1000000) // 500) AS quality_u
         |  FROM t),
         |c AS (SELECT doc_id, n_tok, quality_u,
         |    COALESCE(sum(n_tok) OVER (ORDER BY quality_u DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
         |  FROM q)
         |SELECT CAST(cum0 // $ShardCapacity AS BIGINT) AS shard_id,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(max(quality_u) AS BIGINT) AS max_quality_u,
         |  CAST(min(quality_u) AS BIGINT) AS min_quality_u
         |FROM c GROUP BY shard_id ORDER BY shard_id""".stripMargin
    },

    // the full KMV pipeline in SQL: distinct hash universe, per-source
    // k-min sketch (rn <= k), union sketch per pair, Jaccard from the
    // in-both fraction — every integer must match the Spark aggregate
    "d_source_overlap_kmv" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |sh0 AS (SELECT DISTINCT source,
        |    CAST('0x' || substring(md5(ngram), 1, 12) AS BIGINT) AS h
        |  FROM t, LATERAL (SELECT unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks)-4, 1)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS ngram) lat),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh0 GROUP BY 1),
        |shr AS (SELECT a.source AS a_source, b.source AS b_source,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM sh0 a JOIN sh0 b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2),
        |pairs AS (SELECT a.source AS a_source, b.source AS b_source
        |  FROM sz a JOIN sz b ON a.source < b.source),
        |r AS (SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM sh0),
        |sk AS (SELECT source, h FROM r WHERE rn <= 256),
        |uh AS (SELECT p.a_source, p.b_source, s.h,
        |    max(CASE WHEN s.source = p.a_source THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN s.source = p.b_source THEN 1 ELSE 0 END) AS in_b
        |  FROM pairs p JOIN sk s ON s.source IN (p.a_source, p.b_source)
        |  GROUP BY 1, 2, 3),
        |ur AS (SELECT *, row_number() OVER (
        |    PARTITION BY a_source, b_source ORDER BY h) AS rn FROM uh),
        |uk AS (SELECT a_source, b_source, CAST(count(*) AS BIGINT) AS n_u,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS n_both
        |  FROM ur WHERE rn <= 256 GROUP BY 1, 2),
        |j AS (SELECT p.a_source, p.b_source,
        |    CAST(coalesce(s.n_shared, 0) * 10000
        |      // (za.n + zb.n - coalesce(s.n_shared, 0)) AS BIGINT) AS jaccard_bp_exact,
        |    CAST(u.n_both * 10000 // greatest(u.n_u, 1) AS BIGINT) AS jaccard_bp_kmv
        |  FROM pairs p
        |  JOIN sz za ON za.source = p.a_source
        |  JOIN sz zb ON zb.source = p.b_source
        |  LEFT JOIN shr s ON s.a_source = p.a_source AND s.b_source = p.b_source
        |  JOIN uk u ON u.a_source = p.a_source AND u.b_source = p.b_source)
        |SELECT a_source, b_source, jaccard_bp_exact, jaccard_bp_kmv,
        |  CAST(abs(jaccard_bp_kmv - jaccard_bp_exact) AS BIGINT) AS err_bp
        |FROM j ORDER BY a_source, b_source""".stripMargin,

    "s_pack_sequences" ->
      """WITH d0 AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT * FROM d0 WHERE n_tok >= 1),
        |c AS (SELECT doc_id, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start
        |  FROM d),
        |e AS (SELECT doc_id, start, start + n_tok AS fin FROM c),
        |x AS (SELECT doc_id, start, fin,
        |    unnest(generate_series(start // 256, (fin - 1) // 256)) AS seq_id
        |  FROM e)
        |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(fin, (seq_id + 1) * 256)
        |    - greatest(start, seq_id * 256)) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM x GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "s_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |w0 AS (SELECT lang, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0 FROM c),
        |w1 AS (SELECT lang, n_docs,
        |    s0 - CASE WHEN s0 * s0 > n_docs THEN 1 ELSE 0 END AS s1 FROM w0),
        |w AS (SELECT lang, n_docs,
        |    s1 + CASE WHEN (s1+1) * (s1+1) <= n_docs THEN 1 ELSE 0 END AS w FROM w1),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM w),
        |tg AS (SELECT lang, n_docs,
        |    least(CAST(100 * w // sum_w AS BIGINT), n_docs) AS target_n
        |  FROM w, tw),
        |h AS (SELECT lang, doc_id,
        |    CAST('0x' || substring(md5('tmx:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS hv
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
        |      AS BIGINT) AS rank FROM h)
        |SELECT t.lang, t.n_docs, t.target_n, r.rank, r.doc_id
        |FROM r JOIN tg t ON t.lang = r.lang WHERE r.rank <= t.target_n
        |ORDER BY t.lang, r.rank""".stripMargin,

    // scalar double division is IEEE-identical in both engines, so the
    // weighted keys (and their rare exact ties, broken by doc_id on
    // both sides) rank the same
    "s_sample_weighted" ->
      """WITH h AS (SELECT lang, doc_id, n_chars,
        |    CAST('0x' || substring(md5('wsp:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS hv
        |  FROM documents WHERE n_chars >= 1),
        |r AS (SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(hv AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id)
        |      AS BIGINT) AS rank FROM h)
        |SELECT lang, rank, doc_id FROM r WHERE rank <= 8
        |ORDER BY lang, rank""".stripMargin,

    "s_sample_reservoir" ->
      """WITH h AS (SELECT lang, doc_id,
        |    CAST('0x' || substring(md5('rsv:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS hv
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
        |      AS BIGINT) AS rank FROM h)
        |SELECT lang, rank, doc_id FROM r WHERE rank <= 8
        |ORDER BY lang, rank""".stripMargin,

    "d_source_overlap" ->
      """WITH g AS (SELECT DISTINCT d.source, sh.ngram
        |  FROM (SELECT * FROM documents WHERE text IS NOT NULL) d, LATERAL (
        |    SELECT unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(d.text, ' '))-4, 1)),
        |      i -> array_to_string(string_split(d.text, ' ')[i:i+4], ' ')))) AS ngram) sh),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
        |sharedg AS (SELECT a.source AS a_source, b.source AS b_source,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |  FROM g a JOIN g b ON a.ngram = b.ngram AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s.a_source, s.b_source, s.n_shared,
        |  CAST(s.n_shared * 10000 // (sa.n + sb.n - s.n_shared) AS BIGINT) AS jaccard_bp
        |FROM sharedg s JOIN sz sa ON sa.source = s.a_source
        |JOIN sz sb ON sb.source = s.b_source
        |ORDER BY a_source, b_source""".stripMargin
  )
}
