package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for scale: bucketed tables (co-located joins — the
  * fact⋈fact join with NO shuffle on either side) and partitioned
  * directories (partition pruning — a filter on the partition column skips
  * whole directories before any row is read).
  *
  * At 100 TB these are the two layout levers that matter most: bucketing
  * pre-pays the big join's shuffle once at write time and every subsequent
  * join on the bucket key is exchange-free; partitioning turns
  * low-cardinality filters into file listings. Both land through the
  * standard writer API so Catalyst recognizes the layout at read time
  * (`SortMergeJoin` without `Exchange`; `PartitionFilters` in the scan).
  *
  * Writes are memoized per input dir via the path-memo pattern (never a
  * live DataFrame in a static map) — the catalog queries pay the layout
  * write once per JVM, mirroring the real-world shape where layout is a
  * one-time ETL investment amortized over every downstream query.
  */
object Layout {

  private def sanitize(dir: String): String =
    // the hash suffix keeps distinct dirs distinct even when the
    // character squash collides ('/data/sf1' vs '/data.sf1')
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.lang.Integer.toHexString(dir.hashCode)

  /** lineitem + orders as external parquet tables bucketed by order key
    * (same bucket count, so the join co-locates). Returns the registered
    * table names. sortBy pre-sorts within buckets: with one file per
    * bucket Spark also elides the SortMergeJoin's Sort.
    *
    * Memo key includes the applicationId (table names resolve in ONE
    * session's catalog — a memoized name from a stopped session would be
    * a dangling reference, the session-bound-object-in-static-map trap)
    * and nBuckets (two bucket counts are two different layouts). */
  private val bucketCache = new ConcurrentHashMap[String, (String, String)]()
  def bucketedOrderTables(s: SparkSession, dir: String,
                          nBuckets: Int = 8): (String, String) =
    bucketCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}|$dir|$nBuckets", { _ =>
      graft.BuildLedger.timed("layout_bucketed") {
      val tag = s"${nBuckets}_${sanitize(dir)}"
      val (liName, ordName) = (s"graft_li_bkt_$tag", s"graft_ord_bkt_$tag")
      val base = graft.TempDirs.create("graft_bucketed_")
      // one file per bucket: repartition on the bucket key first so the
      // writer emits exactly nBuckets files and the read side can trust
      // the within-bucket sort order
      s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(nBuckets, org.apache.spark.sql.functions.col("l_orderkey"))
        .write.format("parquet")
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem")
        .mode("overwrite").saveAsTable(liName)
      s.read.parquet(s"$dir/orders.parquet")
        .repartition(nBuckets, org.apache.spark.sql.functions.col("o_orderkey"))
        .write.format("parquet")
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders")
        .mode("overwrite").saveAsTable(ordName)
      (liName, ordName)
      }
    })

  /** events re-written partitioned by event_type; returns the directory.
    * A filter on event_type then prunes whole partitions at planning
    * time (visible as PartitionFilters in the scan node). */
  private val partCache = new ConcurrentHashMap[String, String]()
  def eventsByType(s: SparkSession, dir: String): String =
    partCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("layout_evpart") {
        val out = graft.TempDirs.create("graft_evpart_")
        s.read.parquet(s"$dir/events.parquet")
          .write.partitionBy("event_type")
          .mode("overwrite").parquet(out)
        out
      }
    })

  /** Z-order (Morton) interleave of two 16-bit quantized columns — the
    * multi-column data-skipping layout: sorting by the interleaved value
    * clusters rows so every file/row-group covers a small RECTANGLE in
    * (a, b) space, making min/max stats tight on BOTH columns at once
    * (a plain sort is tight on the leading column only). Pure built-in
    * bit arithmetic (shift/and/or), codegen'd, write-time only. */
  def zvalue2(a: org.apache.spark.sql.Column,
              b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def spread16(c: org.apache.spark.sql.Column) = {
      // classic bit-spread: low 16 bits to even positions of 32
      var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
  }

  /** events rewritten z-ordered on (user_id, floor(value)) — box filters
    * on the two columns then skip most row groups via parquet min/max
    * stats. `nFiles` range-partitions the z axis (one z-interval per
    * file); the small block size gives the local bench row-group-level
    * granularity — at real scale the default 128 MB block plays the same
    * role against multi-GB files. Returns the directory. */
  private val zorderCache = new ConcurrentHashMap[String, String]()
  def eventsZordered(s: SparkSession, dir: String, nFiles: Int = 24): String =
    zorderCache.computeIfAbsent(s"$dir|$nFiles", { _ =>
      graft.BuildLedger.timed("layout_zorder") {
      import org.apache.spark.sql.functions._
      val out = graft.TempDirs.create("graft_evzorder_")
      val clamp = (c: org.apache.spark.sql.Column) =>
        least(greatest(c, lit(0L)), lit(65535L))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("__z", zvalue2(
          clamp(col("user_id")), clamp(floor(col("value")).cast("long"))))
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(out)
      out
      }
    })

  /** A tiny event-type priority DIM as a real parquet table (memoized
    * write-once). It must live in a FILE relation, not a literal
    * LocalRelation: ConvertToLocalRelation folds a literal dim's filter
    * into its rows, and with no Filter node left the dynamic-partition-
    * pruning rule sees no selective predicate to prune with — the DPP
    * demo needs the genuine warehouse shape (dim on disk). */
  private val dppDimCache = new ConcurrentHashMap[String, String]()
  def priorityDim(s: SparkSession): String =
    dppDimCache.computeIfAbsent(s.sparkContext.applicationId, { _ =>
      graft.BuildLedger.timed("layout_dppdim") {
        import s.implicits._
        val out = graft.TempDirs.create("graft_dppdim_")
        Seq(("click", 1), ("purchase", 1), ("view", 0),
          ("signup", 0), ("error", 0)).toDF("t", "priority")
          .coalesce(1).write.mode("overwrite").parquet(out)
        out
      }
    })

  /** Compact a parquet directory into ~`targetBytes` output files —
    * the OPTIMIZE/small-files pass every long-running ingest needs:
    * streaming ingest and over-parallel writers leave directories of
    * KB-sized files, and at 100 TB a scan's cost becomes per-file
    * overhead (listing, footer reads, task scheduling) instead of
    * bytes. File count is sized from the ACTUAL on-disk bytes (not row
    * counts — compression ratios vary wildly); a round-robin
    * repartition gives uniform output sizes. Returns the new
    * directory; the input is left untouched (swap is the caller's
    * atomic-rename concern). */
  def compactDir(s: SparkSession, inDir: String,
                 targetBytes: Long = 128L * 1024 * 1024): String = {
    // Path.getFileSystem resolves against fs.defaultFS exactly like the
    // read side will — a hand-rolled file: fallback would size the
    // LOCAL fs for schemeless paths on an hdfs-default deployment
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val out = graft.TempDirs.create("graft_compact_")
    s.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(out)
    out
  }

  /** A deliberately fragmented copy of the events table (64 shards of
    * ~1k rows each) — the post-streaming-ingest layout the compaction
    * pass exists to fix. Memoized write-once. */
  private val fragCache = new ConcurrentHashMap[String, String]()
  def fragmentedEvents(s: SparkSession, dir: String, nShards: Int = 64): String =
    fragCache.computeIfAbsent(s"$dir|$nShards", { _ =>
      graft.BuildLedger.timed("layout_fragmented") {
        val out = graft.TempDirs.create("graft_frag_")
        s.read.parquet(s"$dir/events.parquet")
          .repartition(nShards)
          .write.mode("overwrite").parquet(out)
        out
      }
    })

  /** Memoized compaction of the fragmented events copy — the catalog's
    * s_compact_scan consumes THIS: compactDir itself stays
    * memoization-free (a library user compacting a live directory wants
    * a fresh pass), but the catalog's input is the immutable fragmented
    * mirror, and before this memo every bench/verify execution rewrote
    * the full table into a fresh TempDirs leaf — one abandoned copy per
    * run on disk and a full write folded into measured serving time. */
  private val compactCache = new ConcurrentHashMap[String, String]()
  def compactedFragmentedEvents(s: SparkSession, dir: String,
                                targetBytes: Long): String =
    compactCache.computeIfAbsent(s"$dir|$targetBytes", { _ =>
      graft.BuildLedger.timed("layout_compacted") {
        compactDir(s, fragmentedEvents(s, dir), targetBytes)
      }
    })

  /** The co-located fact⋈fact join on the bucketed tables — exposed for
    * the plan spec (asserts zero shuffle below the aggregation). */
  def colocatedJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (liT, ordT) = bucketedOrderTables(s, dir)
    val li = s.table(liT).select(col("l_orderkey"),
      col("l_extendedprice"), col("l_discount"))
    val ord = s.table(ordT).select(col("o_orderkey"), col("o_orderpriority"))
    // merge hint: at any real scale this join is fact⋈fact — broadcast is
    // the local-bench accident, SMJ-on-buckets is the plan being proven
    li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
  }
}
