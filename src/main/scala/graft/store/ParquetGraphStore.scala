package graft.store

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
  * Per-op semantics match GraphPg: one storage round-trip per
  * get/set (the reference pays one SQL round-trip per op,
  * graph_pg.rs:82-123). Point ops buffer writes in memory and flush on
  * [[flush]] — the batch path for bulk mutation is
  * [[GraphFrames.connectBidirMerge]] + [[save]], not per-vertex setLinks.
  * `num_layers` is derived from the table (the reference pg impl left it
  * `todo!()`, graph_pg.rs:125-127).
  */
final class ParquetGraphStore(val spark: SparkSession, val path: String) extends GraphStore {

  // Write-through overlay: pending (src, layer) -> links not yet flushed.
  private val pending = scala.collection.mutable.Map.empty[(Long, Int), FurthestQueue]
  private var pendingEntry: Option[EntryPoint] = None

  private def linksPath = s"$path/links"
  private def entryPath = s"$path/entry"

  // Probe path existence explicitly instead of catching exceptions: a
  // transient read error must NOT be treated as "table absent", or a
  // later flush()/mergeBatch() would Overwrite the persisted graph with
  // only the in-memory delta.
  private def pathExists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  private def linksDF: Option[DataFrame] =
    if (!pathExists(linksPath)) None
    else Some(spark.read.parquet(linksPath)
      .select(col("src"), col("layer").cast("int").as("layer"), col("links")))

  override def getEntryPoint: Option[EntryPoint] =
    pendingEntry.orElse {
      if (!pathExists(entryPath)) None
      else spark.read.parquet(entryPath).collect()
        .headOption.map(r => EntryPoint(r.getLong(0), r.getInt(1)))
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
      val tmp = s"$path/links_tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(linksPath)
      pending.clear()
    }
    pendingEntry.foreach { ep =>
      import spark.implicits._
      Seq((ep.point, ep.layer)).toDF("point", "layer")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(entryPath)
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
    GraphFrames.save(spark, snapshot, path)
    pending.clear(); pendingEntry = None
  }

  def loadSnapshot(): GraphSnapshot = {
    require(pending.isEmpty && pendingEntry.isEmpty, "flush before snapshotting")
    GraphFrames.load(spark, path)
  }

  /** Apply one batch of new-vertex links via the relational connect_bidir
    * merge ([[GraphFrames.connectBidirMerge]]) and persist. */
  def mergeBatch(newLinks: DataFrame, params: HnswParams): Unit = {
    val base = linksDF.getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        GraphFrames.linksSchema))
    val merged = GraphFrames.connectBidirMerge(base, newLinks, params)
    val tmp = s"$path/links_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(linksPath)
  }
}
