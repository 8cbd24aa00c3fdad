package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.hnsw.{FurthestQueue, GraphFrames, HnswParams, Neighbor}

/** Parquet-backed [[GraphStore]] — the durable twin of [[InMemoryGraph]],
  * mirroring the reference's two-impl split (GraphMem / GraphPg,
  * graph_store/graph_mem.rs + graph_pg.rs). Adjacency lives in the links
  * parquet table (schema [[GraphFrames.linksSchema]], the typed image of
  * `hawk_graph_links`); the entry point in a 1-row parquet
  * (`hawk_graph_entry`).
  *
  * The links table is stored LSM-style in versioned directories sharing
  * one monotone counter: FULL versions (`links_v{N}`, the whole table)
  * and DELTA versions (`links_d{N}`, only the (src, layer) rows one
  * micro-batch created or rewrote). The live table = the highest full
  * version plus every delta above it, resolved per (src, layer) by
  * highest version (latest wins). [[mergeBatch]] writes a DELTA — an
  * O(batch) write instead of rewriting the O(graph) table per
  * micro-batch, which is the difference between an O(n^2/b) and an O(n)
  * total build write volume at corpus scale — and compacts back to one
  * full version whenever [[CompactionDeltas]] deltas have stacked up, so
  * read amplification stays bounded. A writer never overwrites a path
  * its own plan may be reading (new version while old versions stay
  * intact); readers always resolve complete versions only (the plain
  * legacy `links` dir is read as version -1).
  *
  * Per-op semantics match GraphPg: one storage round-trip per
  * get/set (the reference pays one SQL round-trip per op,
  * graph_pg.rs:82-123). Point ops buffer writes in memory and flush on
  * [[flush]] — the batch path for bulk mutation is
  * [[GraphFrames.connectBidirMerge]] via [[mergeBatch]], not per-vertex
  * setLinks. `num_layers` is derived from the table (the reference pg
  * impl left it `todo!()`, graph_pg.rs:125-127).
  */
final class ParquetGraphStore(val spark: SparkSession, val path: String) extends GraphStore {

  // Write-through overlay: pending (src, layer) -> links not yet flushed.
  private val pending = scala.collection.mutable.Map.empty[(Long, Int), FurthestQueue]
  private var pendingEntry: Option[EntryPoint] = None

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Both tables use the same versioned-directory scheme: a writer
  // produces version N+1 while readers (and its own plan) still see the
  // intact version N, then drops older versions. Completeness = the
  // Spark committer's `_SUCCESS` marker — a crash mid-write leaves a
  // higher-numbered partial directory, which must never shadow the
  // intact previous version (the restart-recovery contract). Legacy
  // unversioned dirs (`links`, `entry`) are read as version -1.

  /** Complete version stack of `name`: (version, isDelta) ascending.
    * Fulls are `${name}_v{N}`, deltas `${name}_d{N}` (links only), and a
    * legacy unversioned dir reads as full version -1. Incomplete dirs
    * (no `_SUCCESS`: crash junk) are never resolved. */
  private def versionStack(name: String): Seq[(Int, Boolean)] = {
    val root = new Path(path)
    val full = s"${name}_v(\\d+)".r
    val delta = s"${name}_d(\\d+)".r
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      val complete = fs.exists(new Path(st.getPath, "_SUCCESS"))
      st.getPath.getName match {
        case full(n) if complete  => Some((n.toInt, false))
        case delta(n) if complete => Some((n.toInt, true))
        case `name` if complete   => Some((-1, false))
        case _                    => None
      }
    }.sortBy(_._1)
  }

  /** The LIVE stack: the highest full version plus every delta above it
    * (older fulls/deltas are superseded; kept on disk only until the
    * next write's cleanup). */
  private def liveStack(name: String): Seq[(Int, Boolean)] = {
    val all = versionStack(name)
    val lastFull = all.filterNot(_._2).map(_._1).maxOption
    lastFull match {
      case None    => all // delta-only stack (fresh store built by deltas)
      case Some(f) => all.filter { case (v, d) => v == f || (d && v > f) }
    }
  }

  private def currentVersion(name: String): Option[Int] =
    versionStack(name).map(_._1).maxOption

  private def versionPath(name: String, v: Int): String =
    if (v == -1) s"$path/$name" else s"$path/${name}_v$v"
  private def deltaPath(name: String, v: Int): String = s"$path/${name}_d$v"

  /** Delete every version dir of `name` except `keep` — everything else
    * is either superseded or crash junk. Single-writer store. */
  private def dropOtherVersions(name: String, keep: Int): Unit = {
    val full = s"${name}_v(\\d+)".r
    val delta = s"${name}_d(\\d+)".r
    fs.listStatus(new Path(path)).foreach { st =>
      val drop = st.getPath.getName match {
        case full(n)  => n.toInt != keep
        case delta(n) => n.toInt != keep
        case `name`   => true
        case _        => false
      }
      if (drop) fs.delete(st.getPath, true)
    }
  }

  /** Write `df` as the next FULL version of `name` and drop every other
    * version: older versions are superseded, and a complete higher
    * version cannot exist (currentVersion would have resolved it). */
  private def writeVersioned(name: String, df: DataFrame): Unit = {
    val next = currentVersion(name).map(_ + 1).getOrElse(0)
    df.write.mode(SaveMode.Overwrite).parquet(versionPath(name, next))
    dropOtherVersions(name, next)
  }

  // ---- bucketed full image (the overlay-compaction key ranges) --------

  private def bucketCol(src: org.apache.spark.sql.Column) =
    pmod(hash(src), lit(ParquetGraphStore.CompactionBuckets))

  /** Marker recording the bucket modulus a full version was laid out
    * with — incremental compaction must NOT prune by bucket against a
    * layout hashed with a different K (rows would duplicate across the
    * copied and rewritten ranges); a mismatch falls back to the full
    * rewrite, which re-buckets at the current K. */
  private def bucketMarker(dir: String): Path =
    new Path(dir, s"_BUCKETS_${ParquetGraphStore.CompactionBuckets}")

  private def isBucketedAtCurrentK(dir: String): Boolean =
    fs.exists(bucketMarker(dir))

  /** Write `df` as the next FULL version of the LINKS table, laid out
    * in [[ParquetGraphStore.CompactionBuckets]] hash(src) key ranges
    * (one `bucket=B` directory each) so a later compaction can rewrite
    * only the ranges its deltas touch. An empty frame writes
    * unbucketed (a zero-row partitionBy write leaves no readable
    * schema on disk). */
  private def writeVersionedLinks(df: DataFrame): Unit = {
    val next = currentVersion("links").map(_ + 1).getOrElse(0)
    val dir = versionPath("links", next)
    if (df.isEmpty) df.write.mode(SaveMode.Overwrite).parquet(dir)
    else {
      df.withColumn("bucket", bucketCol(col("src")))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(dir)
      fs.create(bucketMarker(dir), true).close()
    }
    dropOtherVersions("links", next)
  }

  /** Fold the delta stack into the next full version INCREMENTALLY:
    * resolve latest-wins only inside the key ranges (buckets) the
    * deltas touch, and carry every untouched range over as a raw file
    * copy from the previous full — no decode, no shuffle, no re-encode
    * for data no delta rewrote. Write-new-while-reading-old per range:
    * the resolved ranges land in a staging dir first (their plan READS
    * the old stack), then the new version assembles from staged +
    * copied ranges and turns complete only when its `_SUCCESS` lands —
    * every crash window leaves the old stack intact and resolvable.
    * Falls back to the whole-image rewrite when the previous full is
    * unbucketed (legacy) or bucketed at a different K. */
  private def compactStack(): Unit = {
    val live = liveStack("links")
    val deltas = live.filter(_._2)
    val fullV = live.filterNot(_._2).map(_._1).maxOption
    val incremental = fullV.exists(f =>
      f >= 0 && isBucketedAtCurrentK(versionPath("links", f)))
    if (!incremental || deltas.isEmpty) { writeVersionedLinks(linksTable); return }

    val fullDir = versionPath("links", fullV.get)
    val deltaDf = deltas.map { case (v, _) =>
      readPiece(v, isDelta = true).withColumn("__v", lit(v))
    }.reduce(_ unionByName _)
    val touched = deltaDf.select(bucketCol(col("src")).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val touchedSet = touched.toSet

    // stage: resolve ONLY the touched ranges (partition pruning keeps
    // the full-side scan to those bucket dirs)
    val staging = s"$path/links_stage"
    fs.delete(new Path(staging), true)
    val fullTouched = spark.read.parquet(fullDir)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      .select(col("src"), col("layer").cast("int").as("layer"), col("links"))
      .withColumn("__v", lit(fullV.get))
    val resolved = fullTouched.unionByName(deltaDf)
      .groupBy(col("src"), col("layer"))
      .agg(max_by(col("links"), col("__v")).as("links"))
    resolved.withColumn("bucket", bucketCol(col("src")))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)

    // assemble the next version: staged ranges move (rename — O(1)
    // metadata), untouched ranges COPY from the old full (it must stay
    // intact until the new version is complete), then the marker +
    // _SUCCESS flip the version live
    val next = currentVersion("links").map(_ + 1).getOrElse(0)
    val dir = versionPath("links", next)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    fs.listStatus(new Path(staging)).foreach { st =>
      if (st.getPath.getName.startsWith("bucket="))
        fs.rename(st.getPath, new Path(dir, st.getPath.getName))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(new Path(fullDir)).foreach { st =>
      val nm = st.getPath.getName
      val keep = nm.startsWith("bucket=") &&
        !touchedSet(nm.stripPrefix("bucket=").toInt)
      if (keep)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, st.getPath, fs, new Path(dir, nm), false, conf)
    }
    fs.create(bucketMarker(dir), true).close()
    fs.create(new Path(dir, "_SUCCESS"), true).close()
    fs.delete(new Path(staging), true)
    dropOtherVersions("links", next)
  }

  /** Write `df` as the next DELTA version of the links table. Prior
    * COMPLETE versions stay (compaction folds the stack back into one
    * full); incomplete dirs are crash junk — they can never resolve, and
    * a single-writer store may reclaim them on any write. */
  private def writeDelta(df: DataFrame): Unit = {
    val next = currentVersion("links").map(_ + 1).getOrElse(0)
    df.write.mode(SaveMode.Overwrite).parquet(deltaPath("links", next))
    val full = s"links_v(\\d+)".r
    val delta = s"links_d(\\d+)".r
    fs.listStatus(new Path(path)).foreach { st =>
      val isLinksDir = st.getPath.getName match {
        case full(_) | delta(_) | "links" => true
        case _                            => false
      }
      if (isLinksDir && !fs.exists(new Path(st.getPath, "_SUCCESS")))
        fs.delete(st.getPath, true)
    }
  }

  private def readPiece(v: Int, isDelta: Boolean): DataFrame = {
    val p = if (isDelta) deltaPath("links", v) else versionPath("links", v)
    spark.read.parquet(p)
      .select(col("src"), col("layer").cast("int").as("layer"), col("links"))
  }

  private def resolveStack(stack: Seq[(Int, Boolean)]): Option[DataFrame] = {
    if (stack.isEmpty) None
    else if (stack.size == 1) Some(readPiece(stack.head._1, stack.head._2))
    else {
      // latest wins per (src, layer): one max_by aggregation over the
      // stack — the single resolution shuffle that delta writes buy.
      val tagged = stack.map { case (v, d) =>
        readPiece(v, d).withColumn("__v", lit(v))
      }.reduce(_ unionByName _)
      Some(tagged.groupBy(col("src"), col("layer"))
        .agg(max_by(col("links"), col("__v")).as("links")))
    }
  }

  private def linksDF: Option[DataFrame] = resolveStack(liveStack("links"))

  /** Version numbers currently readable, ascending: the last full plus
    * the deltas stacked above it. Compaction and full writes fold older
    * history — the LSM retention window, not an infinite log. */
  def retainedVersions: Seq[Int] = liveStack("links").map(_._1)

  /** Time travel: the links table AS OF version `v` — the same
    * latest-wins resolution over the live stack truncated to versions
    * <= `v`. Every version a [[mergeBatch]] delta produced since the
    * last full write is addressable (a build's recent batches; a
    * streaming ingest's recent micro-batches). Throws if `v` predates
    * the retention window. */
  def linksTableAt(v: Int): DataFrame = {
    val live = liveStack("links")
    require(live.headOption.exists(_._1 <= v),
      s"version $v predates the retention window (retained: " +
        s"${live.map(_._1).mkString(", ")})")
    resolveStack(live.filter(_._1 <= v)).get
  }

  override def getEntryPoint: Option[EntryPoint] =
    pendingEntry.orElse {
      currentVersion("entry").flatMap { v =>
        spark.read.parquet(versionPath("entry", v)).collect()
          .headOption.map(r => EntryPoint(r.getLong(0), r.getInt(1)))
      }
    }

  override def setEntryPoint(point: Long, layer: Int): Unit = {
    getEntryPoint.foreach { prev =>
      require(prev.layer < layer,
        s"a new entry point must be on a higher layer (${prev.layer} -> $layer)")
    }
    pendingEntry = Some(EntryPoint(point, layer))
  }

  override def getLinks(base: Long, lc: Int): FurthestQueue =
    pending.get((base, lc)).map(_.copy()).getOrElse {
      linksDF.map { df =>
        val rows = df.filter(col("src") === base && col("layer") === lc)
          .select(explode(col("links")).as("e"))
          .select(col("e.dst"), col("e.dist")).collect()
        FurthestQueue.fromAscending(
          rows.map(r => Neighbor(r.getLong(0), r.getDouble(1))).toSeq)
      }.getOrElse(FurthestQueue.empty)
    }

  override def setLinks(base: Long, links: FurthestQueue, lc: Int): Unit =
    pending((base, lc)) = links.copy()

  override def numLayers: Int = {
    val stored = linksDF.flatMap { df =>
      df.agg(max(col("layer"))).collect().headOption
        .filterNot(_.isNullAt(0)).map(_.getInt(0) + 1)
    }.getOrElse(0)
    val buffered = (pending.keysIterator.map(_._2 + 1) ++
      getEntryPoint.map(_.layer + 1).iterator).foldLeft(0)(math.max)
    math.max(stored, buffered)
  }

  private def pendingAsDF(): DataFrame = {
    import spark.implicits._
    pending.toSeq.map { case ((src, lc), q) =>
      (src, lc, q.toArray.map(n => (n.dst, n.dist)).toSeq)
    }.toDF("src", "layer", "raw")
      .select(col("src"), col("layer"),
        expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
  }

  private def flushPendingEntry(): Unit = pendingEntry.foreach { ep =>
    import spark.implicits._
    writeVersioned("entry",
      Seq((ep.point, ep.layer)).toDF("point", "layer").coalesce(1))
    pendingEntry = None
  }

  /** Merge buffered point-writes into the parquet tables as a new FULL
    * version — O(graph) write volume; prefer [[flushDelta]] for
    * repeated small flushes. */
  def flush(): Unit = {
    if (pending.nonEmpty) {
      val updates = pendingAsDF()
      val merged = linksDF match {
        case Some(existing) =>
          existing.join(updates.select("src", "layer"), Seq("src", "layer"), "left_anti")
            .unionByName(updates)
        case None => updates
      }
      writeVersionedLinks(merged)
      pending.clear()
    }
    flushPendingEntry()
  }

  /** Merge buffered point-writes as a DELTA version — O(pending) write
    * volume per call where [[flush]] rewrites the whole table; identical
    * read-side semantics (latest-wins per (src, layer) over the stack,
    * exactly the overwrite contract of the buffered setLinks). The
    * streaming mirror calls this per micro-batch, so N batches cost
    * O(rows touched) total instead of O(N x graph); compaction folds the
    * stack after [[ParquetGraphStore.CompactionDeltas]] deltas, same as
    * [[mergeBatch]]. */
  def flushDelta(): Unit = {
    if (pending.nonEmpty) {
      val updates = pendingAsDF()
      // a fresh store takes its first flush as the base full version
      if (currentVersion("links").isEmpty) writeVersionedLinks(updates)
      else {
        writeDelta(updates)
        val deltas = liveStack("links").count(_._2)
        if (deltas >= ParquetGraphStore.CompactionDeltas)
          compactStack()
      }
      pending.clear()
    }
    flushPendingEntry()
  }

  /** The persisted links table as a DataFrame (empty-but-typed when the
    * store is fresh) — the distributed read surface for frontier search
    * and the durable build, which must never pull layer 0 to the driver. */
  def linksTable: DataFrame = linksDF.getOrElse(
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      GraphFrames.linksSchema))

  /** Bulk write a whole snapshot (the batch-build path). */
  def save(snapshot: GraphSnapshot): Unit = {
    writeVersionedLinks(GraphFrames.toLinksDF(spark, snapshot))
    import spark.implicits._
    writeVersioned("entry",
      snapshot.entryPoint.toSeq.map(e => (e.point, e.layer))
        .toDF("point", "layer").coalesce(1))
    pending.clear(); pendingEntry = None
  }

  def loadSnapshot(): GraphSnapshot = {
    require(pending.isEmpty && pendingEntry.isEmpty, "flush before snapshotting")
    GraphFrames.fromLinksDF(linksTable, getEntryPoint)
  }

  /** Soft-delete bookkeeping: tombstoned vertex ids awaiting compaction,
    * versioned like the other tables. Serving layers exclude these
    * (HnswDistributed.searchExcluding); [[compactTombstones]] folds them
    * out of the graph once they reach the trigger threshold. */
  def addTombstones(ids: DataFrame): Unit = {
    val incoming = ids.select(col(ids.columns.head).cast("long").as("id"))
    val next = currentVersion("tombstones") match {
      case Some(v) => spark.read.parquet(versionPath("tombstones", v))
        .select(col("id")).unionByName(incoming).distinct()
      case None => incoming.distinct()
    }
    writeVersioned("tombstones", next.coalesce(1))
  }

  /** The current tombstone set (empty-but-typed when none recorded). */
  def tombstones: DataFrame = currentVersion("tombstones")
    .map(v => spark.read.parquet(versionPath("tombstones", v)).select(col("id")))
    .getOrElse(spark.range(0).select(col("id")))

  private def clearTombstones(): Unit = {
    val full = "tombstones_v(\\d+)".r
    fs.listStatus(new Path(path)).foreach { st =>
      st.getPath.getName match {
        case full(_) => fs.delete(st.getPath, true)
        case _       => ()
      }
    }
  }

  /** Threshold-triggered tombstone COMPACTION: when the tombstone set has
    * grown to `threshold` of the layer-0 graph, fold it out — rewrite the
    * links table without the tombstoned vertices via the relational
    * links-out pass ([[GraphFrames.compactTombstones]]: surviving queues
    * bridge through their deleted neighbors and re-trim to M_max), repair
    * the entry point if it was tombstoned (highest surviving layer,
    * lowest id — the deterministic twin of set_ep), and clear the
    * tombstone set. Below the threshold it is a no-op: soft-delete
    * serving (exclusion-set search) stays cheaper than the O(graph)
    * rewrite until enough deletes amortize it. Returns true iff the
    * compaction ran. `vectors` must cover every surviving id (bridge
    * distances are recomputed for real).
    */
  def compactTombstones(vectors: DataFrame, metricName: String,
                        params: HnswParams, threshold: Double = 0.2): Boolean = {
    require(pending.isEmpty && pendingEntry.isEmpty, "flush before compacting")
    val del = tombstones
    val nDel = del.count()
    if (nDel == 0L) return false
    val n0 = linksTable.filter(col("layer") === 0).count()
    if (n0 == 0L || nDel.toDouble / n0.toDouble < threshold) return false

    val compacted = GraphFrames.compactTombstones(
      linksTable, del, vectors, metricName, params)
      // materialize BEFORE the version swap: the plan reads the very
      // directories writeVersioned is about to drop
      .localCheckpoint()

    // Crash-ordering: entry repair FIRST, then the links swap, then the
    // tombstone clear — every interruption window leaves a servable
    // store. The repaired entry is a SURVIVOR, a valid entry in the old
    // graph too (it exists there, and serving descends from any vertex);
    // links-then-entry would instead leave a window where the entry
    // references a vertex the compacted graph no longer contains.
    // Crash after links, before clear: stale tombstones only re-exclude
    // already-removed ids — harmless; the next threshold crossing folds
    // nothing and clears them.
    val entryDead = getEntryPoint.exists(ep =>
      del.filter(col("id") === ep.point).count() > 0L)
    if (entryDead) {
      import spark.implicits._
      val cand = compacted.orderBy(desc("layer"), asc("src"))
        .select(col("src"), col("layer")).limit(1).collect()
      writeVersioned("entry",
        cand.toSeq.map(r => (r.getLong(0), r.getInt(1)))
          .toDF("point", "layer").coalesce(1))
    }
    writeVersionedLinks(compacted)
    compacted.unpersist(blocking = false)
    clearTombstones()
    true
  }

  /** Apply one batch of new-vertex links via the relational connect_bidir
    * merge and persist ONLY the changed rows as a delta version
    * ([[GraphFrames.connectBidirDelta]]) — an O(batch) write. When
    * [[ParquetGraphStore.CompactionDeltas]] deltas have stacked above the
    * last full version, fold the stack into one full version (bounded
    * read amplification; amortized write volume stays O(rows inserted)). */
  def mergeBatch(newLinks: DataFrame, params: HnswParams,
                 current: Option[DataFrame] = None): Unit = {
    // `current` lets a build loop pass its already-pinned resolution of
    // THIS store's links table (it must be exactly that — stale or
    // foreign frames would corrupt the merge).
    val delta = GraphFrames.connectBidirDelta(
      current.getOrElse(linksTable), newLinks, params)
    writeDelta(delta)
    val deltas = liveStack("links").count(_._2)
    if (deltas >= ParquetGraphStore.CompactionDeltas)
      compactStack()
  }
}

object ParquetGraphStore {
  /** Max delta versions above the last full before [[ParquetGraphStore.mergeBatch]]
    * compacts. Read amplification is bounded by this count; raising it
    * trades read-side resolution work for fewer full rewrites. */
  val CompactionDeltas = 6

  /** Key ranges (hash(src) buckets) a full links version is laid out
    * in. Compaction resolves only the ranges its deltas touch and
    * carries the rest over as raw file copies — at a given delta size
    * the merge compute per compaction is O(graph / K × touched), not
    * O(graph). More buckets = finer-grained carryover but more small
    * files; 32 keeps files ≥ tens of MB up to multi-TB graphs. */
  val CompactionBuckets = 32
}
