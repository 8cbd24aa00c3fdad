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
  * The links table is stored in VERSIONED directories (`links_v{N}`): a
  * bulk mutation writes version N+1 while reading version N — one parquet
  * write per merge (no tmp-dir double write), never overwriting a path
  * that the merge plan is still reading — then drops version N. Readers
  * always resolve the highest version present (the plain legacy `links`
  * dir is also recognized).
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

  /** Highest COMPLETE version of `name` present, if any. */
  private def currentVersion(name: String): Option[Int] = {
    val root = new Path(path)
    val versioned = s"${name}_v(\\d+)".r
    if (!fs.exists(root)) None
    else {
      val versions = fs.listStatus(root).toSeq.flatMap { st =>
        val complete = fs.exists(new Path(st.getPath, "_SUCCESS"))
        st.getPath.getName match {
          case versioned(n) if complete  => Some(n.toInt)
          case `name` if complete        => Some(-1)
          case _                         => None
        }
      }
      if (versions.isEmpty) None else Some(versions.max)
    }
  }

  private def versionPath(name: String, v: Int): String =
    if (v == -1) s"$path/$name" else s"$path/${name}_v$v"

  /** Write `df` as the next version of `name`, then drop every OTHER
    * version directory: older complete versions are superseded, and any
    * dir that is not the one just written is crash junk (a complete
    * higher version cannot exist — currentVersion would have resolved
    * it and `next` would sit above it). Single-writer store. */
  private def writeVersioned(name: String, df: DataFrame): Unit = {
    val next = currentVersion(name).map(_ + 1).getOrElse(0)
    df.write.mode(SaveMode.Overwrite).parquet(versionPath(name, next))
    val versioned = s"${name}_v(\\d+)".r
    fs.listStatus(new Path(path)).foreach { st =>
      val drop = st.getPath.getName match {
        case versioned(n) => n.toInt != next
        case `name`       => true
        case _            => false
      }
      if (drop) fs.delete(st.getPath, true)
    }
  }

  private def linksDF: Option[DataFrame] = currentVersion("links").map { v =>
    spark.read.parquet(versionPath("links", v))
      .select(col("src"), col("layer").cast("int").as("layer"), col("links"))
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

  /** Merge buffered point-writes into the parquet tables. */
  def flush(): Unit = {
    if (pending.nonEmpty) {
      import spark.implicits._
      val updates = pending.toSeq.map { case ((src, lc), q) =>
        (src, lc, q.toArray.map(n => (n.dst, n.dist)).toSeq)
      }.toDF("src", "layer", "raw")
        .select(col("src"), col("layer"),
          expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
      val merged = linksDF match {
        case Some(existing) =>
          existing.join(updates.select("src", "layer"), Seq("src", "layer"), "left_anti")
            .unionByName(updates)
        case None => updates
      }
      writeVersioned("links", merged)
      pending.clear()
    }
    pendingEntry.foreach { ep =>
      import spark.implicits._
      writeVersioned("entry",
        Seq((ep.point, ep.layer)).toDF("point", "layer").coalesce(1))
      pendingEntry = None
    }
  }

  /** The persisted links table as a DataFrame (empty-but-typed when the
    * store is fresh) — the distributed read surface for frontier search
    * and the durable build, which must never pull layer 0 to the driver. */
  def linksTable: DataFrame = linksDF.getOrElse(
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      GraphFrames.linksSchema))

  /** Bulk write a whole snapshot (the batch-build path). */
  def save(snapshot: GraphSnapshot): Unit = {
    writeVersioned("links", GraphFrames.toLinksDF(spark, snapshot))
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

  /** Apply one batch of new-vertex links via the relational connect_bidir
    * merge ([[GraphFrames.connectBidirMerge]]) and persist — one parquet
    * write (see the versioning note in the class doc). */
  def mergeBatch(newLinks: DataFrame, params: HnswParams): Unit = {
    val merged = GraphFrames.connectBidirMerge(linksTable, newLinks, params)
    writeVersioned("links", merged)
  }
}
