package graft.hnsw

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{EntryPoint, GraphSnapshot}

/** The HNSW graph as DataFrames — the Spark image of the reference's
  * Postgres graph store (graph_pg.rs:18-128; schema
  * migrations/20240909105321_init.up.sql:1-12):
  *
  *   links(src: long, layer: int, links: array<struct<dst: long, dist: double>>)
  *   entry(point: long, layer: int)            -- singleton
  *
  * jsonb becomes a typed nested array; `(source_ref, layer)` stays the
  * key. Layer `l` holds ~n*p^l vertices, so only layer 0 is large; links
  * arrays are bounded by M_max, keeping row width O(M).
  */
object GraphFrames {

  val linksSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("layer", IntegerType, nullable = false),
    StructField("links", ArrayType(StructType(Seq(
      StructField("dst", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))), containsNull = false),
      nullable = false)
  ))

  /** Snapshot -> links DataFrame (G7 export, graph_mem.rs:141-155). */
  def toLinksDF(spark: SparkSession, snapshot: GraphSnapshot): DataFrame = {
    val rows = for {
      (layer, lc) <- snapshot.layers.iterator.zipWithIndex
      (src, dsts, dists) <- layer.entriesIterator
    } yield Row(src, lc,
      dsts.indices.map(i => Row(dsts(i), dists(i))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), linksSchema)
  }

  /** Links DataFrame (+ entry point) -> snapshot (G7 import,
    * graph_mem.rs:25-40). num_layers = max(layer)+1, derived — the
    * reference's pg store left that op `todo!()` (graph_pg.rs:125-127). */
  def fromLinksDF(links: DataFrame, entryPoint: Option[EntryPoint]): GraphSnapshot = {
    val collected = links
      .select(col("src"), col("layer"), col("links"))
      .collect()
    val nLayers = math.max(
      if (collected.isEmpty) 0 else collected.map(_.getInt(1)).max + 1,
      entryPoint.map(_.layer + 1).getOrElse(0))
    val layerMaps = Array.fill(nLayers)(Map.newBuilder[Long, (Array[Long], Array[Double])])
    collected.foreach { r =>
      val ns = r.getSeq[Row](2)
      layerMaps(r.getInt(1)) += r.getLong(0) ->
        (ns.map(_.getLong(0)).toArray, ns.map(_.getDouble(1)).toArray)
    }
    GraphSnapshot.fromMaps(entryPoint, layerMaps.map(_.result()).toSeq)
  }

  /** Persist graph (links parquet partitioned by layer + 1-row entry
    * parquet). The entry point is scalar state — never shuffled for. */
  def save(spark: SparkSession, snapshot: GraphSnapshot, path: String): Unit = {
    toLinksDF(spark, snapshot).write.mode("overwrite")
      .partitionBy("layer").parquet(s"$path/links")
    import spark.implicits._
    val ep = snapshot.entryPoint.toSeq.map(e => (e.point, e.layer))
    ep.toDF("point", "layer").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/entry")
  }

  def load(spark: SparkSession, path: String): GraphSnapshot = {
    val entry = spark.read.parquet(s"$path/entry").collect()
      .headOption.map(r => EntryPoint(r.getLong(0), r.getInt(1)))
    // partitionBy writes `layer` back as a partition column; order columns
    val links = spark.read.parquet(s"$path/links")
      .select(col("src"), col("layer").cast("int").as("layer"), col("links"))
    fromLinksDF(links, entry)
  }

  /** connect_bidir (S9, hawk_searcher.rs:153-176) as a pure DataFrame
    * job — the merge path for a disk-backed graph (streaming/incremental
    * ingest), where the adjacency must not round-trip through the driver:
    *
    *   newLinks: (q, layer, links)  — each new vertex's forward queue,
    *             already trimmed to M by the search phase
    *   reverse edges: explode -> (dst, layer, (q, dist))
    *   merge: union with the touched vertices' existing queues, re-rank
    *          per (src, layer) by (dist, dst), keep M_max(layer), regroup
    *
    * Untouched rows pass through without exploding. One shuffle on the
    * touched set (small: batch x M rows), broadcast-joined against the
    * big links table.
    */
  /** The CHANGED rows of a connect_bidir merge — every (src, layer)
    * whose queue this batch creates or rewrites, with its new links
    * array. [[connectBidirMerge]] = untouched rows ∪ this; the delta
    * store path persists just this (O(batch), not O(graph)). */
  def connectBidirDelta(links: DataFrame, newLinks: DataFrame,
                        params: HnswParams): DataFrame =
    deltaImpl(links, newLinks, params, touchedKeysOf(newLinks))

  /** Every (src, layer) queue the batch creates or rewrites: each new
    * vertex with a non-empty queue (forward) plus every neighbor it
    * points at (reverse target). Shared by delta and merge so one plan
    * builds the key set once (identical broadcast subtrees reuse the
    * exchange). Extracting `links.dst` keeps it a long-array explode —
    * no struct materialization. */
  private def touchedKeysOf(newLinks: DataFrame): DataFrame =
    newLinks.filter(size(col("links")) > 0)
      .select(col("q").as("src"), col("layer"))
      .unionByName(newLinks
        .select(explode(col("links.dst")).as("src"), col("layer")))
      .distinct()

  private def deltaImpl(links: DataFrame, newLinks: DataFrame,
                        params: HnswParams, touchedKeys: DataFrame): DataFrame = {
    val mMaxExpr = {
      val cases = (0 until HnswParams.NParamLayers).map { lc =>
        s"WHEN layer >= $lc THEN ${params.getMMax(lc)}"
      }.reverse.mkString(" ")
      expr(s"CASE $cases ELSE ${params.getMMax(0)} END")
    }
    val forward = newLinks
      .select(col("q").as("src"), col("layer"), explode(col("links")).as("edge"))
    val emptyForward = newLinks.filter(size(col("links")) === 0)
      .select(col("q").as("src"), col("layer"), col("links"))
    val reverse = newLinks
      .select(col("q"), col("layer"), explode(col("links")).as("n"))
      .select(col("n.dst").as("src"), col("layer"),
        struct(col("q").as("dst"), col("n.dist").as("dist")).as("edge"))
    val newEdges = forward.unionByName(reverse)
    val touched = links.join(broadcast(touchedKeys), Seq("src", "layer"), "left_semi")
    val merged = touched
      .select(col("src"), col("layer"), explode(col("links")).as("edge"))
      .unionByName(newEdges)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src"), col("layer"))
          .orderBy(col("edge.dist"), col("edge.dst"))))
      .filter(col("rank") <= mMaxExpr)
      .groupBy(col("src"), col("layer"))
      .agg(expr("transform(array_sort(collect_list(struct(edge.dist AS dist, edge.dst AS dst)))," +
        " x -> struct(x.dst AS dst, x.dist AS dist))").as("links"))
    merged.unionByName(emptyForward)
  }

  /** Full connect_bidir merge: the whole links table with the batch
    * applied. Delegates the changed rows to [[connectBidirDelta]]; the
    * delta's semantics notes:
    *  - forward edges: q -> its (already M-trimmed) neighbor queue;
    *  - a new vertex with an EMPTY queue (first insert into a fresh
    *    layer) still gets its row — the reference stores the empty
    *    neighborhood, and same-batch reverse edges cannot target it
    *    (phase-1 neighbors come from the pre-batch snapshot);
    *  - reverse edges: each neighbor n gains n -> q, then every touched
    *    queue is re-ranked by (dist, dst) and degree-bounded to
    *    M_max(layer) — covers the corner where a new vertex is itself a
    *    reverse target in the same batch. */
  def connectBidirMerge(links: DataFrame, newLinks: DataFrame,
                        params: HnswParams): DataFrame = {
    // One touched-key subtree feeds both the anti-join (untouched rows
    // pass through) and the delta's semi-join — identical broadcast
    // exchanges, so the distinct runs once per execution.
    val touchedKeys = touchedKeysOf(newLinks)
    val untouched = links.join(broadcast(touchedKeys), Seq("src", "layer"), "left_anti")
    untouched.unionByName(deltaImpl(links, newLinks, params, touchedKeys))
  }

  /** Tombstone COMPACTION — the links-out pass that turns soft deletes
    * ([[HnswDistributed.searchExcluding]]'s exclusion set) back into a
    * clean graph, without a rebuild. Purely relational; the graph never
    * leaves the cluster:
    *
    *  - every row whose src is tombstoned is dropped;
    *  - surviving vertices lose their edges INTO the deletion set, and
    *    for each lost edge u -> d gain bridge candidates u -> n over d's
    *    own surviving neighbors n (the path u -> d -> n the walk used to
    *    take), scored with REAL distances via the codegen'd metric
    *    expression;
    *  - each touched queue is re-ranked by (dist, dst) and trimmed to
    *    M_max(layer) — identical semantics to the connect_bidir merge, so
    *    degree bounds hold by construction;
    *  - a vertex whose whole queue was tombstoned and found no surviving
    *    bridge keeps an explicit empty neighborhood (the merge contract).
    *
    * Cost shape at scale: the deletion set broadcasts (O(deletes), never
    * the corpus-sized complement); bridge fan-out is bounded by
    * |edges into deleted| x M_max; the only full-table pass is the edge
    * split. `vectors` is touched twice by candidate joins that are
    * O(bridges), not O(corpus).
    */
  def compactTombstones(links: DataFrame, deleted: DataFrame,
                        vectors: DataFrame, metricName: String,
                        params: HnswParams): DataFrame = {
    val del = deleted
      .select(col(deleted.columns.head).cast("long").as("del_id")).distinct()
    // deleted vertices' adjacency: |del| x layers rows — broadcast-sized
    // whenever the deletion set itself is
    val deletedAdj = broadcast(
      links.join(broadcast(del), col("src") === col("del_id"), "left_semi")
        .select(col("src").as("d"), col("layer"),
          col("links.dst").as("d_nbrs")))

    val survivors = links.join(broadcast(del), col("src") === col("del_id"), "left_anti")
    val exploded = survivors
      .select(col("src"), col("layer"), explode(col("links")).as("edge"))
    val kept = exploded
      .join(broadcast(del), col("edge.dst") === col("del_id"), "left_anti")
      .select(col("src"), col("layer"),
        col("edge.dst").as("dst"), col("edge.dist").as("dist"))

    // u --x--> d  bridges to  u -> n  for d's surviving neighbors n != u
    val bridgeIds = exploded
      .join(broadcast(del), col("edge.dst") === col("del_id"), "left_semi")
      .select(col("src"), col("layer"), col("edge.dst").as("d"))
      .join(deletedAdj, Seq("d", "layer"))
      .select(col("src"), col("layer"), explode(col("d_nbrs")).as("nbr"))
      .filter(col("nbr") =!= col("src"))
      .join(broadcast(del), col("nbr") === col("del_id"), "left_anti")
      .distinct()
    val dist = HnswFrontier.distCol(metricName)
    val bridges = bridgeIds
      .join(vectors.select(col("id").as("src"), col("vec").as("src_vec")), Seq("src"))
      .join(vectors.select(col("id").as("nbr"), col("vec").as("nbr_vec")), Seq("nbr"))
      .select(col("src"), col("layer"), col("nbr").as("dst"),
        dist(col("src_vec"), col("nbr_vec")).as("dist"))

    val mMaxExpr = {
      val cases = (0 until HnswParams.NParamLayers).map { lc =>
        s"WHEN layer >= $lc THEN ${params.getMMax(lc)}"
      }.reverse.mkString(" ")
      expr(s"CASE $cases ELSE ${params.getMMax(0)} END")
    }
    val merged = kept.unionByName(bridges)
      // a bridge may duplicate an edge u already had — keep one copy
      .groupBy(col("src"), col("layer"), col("dst"))
      .agg(min(col("dist")).as("dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src"), col("layer"))
          .orderBy(col("dist"), col("dst"))))
      .filter(col("rank") <= mMaxExpr)
      .groupBy(col("src"), col("layer"))
      .agg(expr("transform(array_sort(collect_list(struct(dist AS dist, dst AS dst)))," +
        " x -> struct(x.dst AS dst, x.dist AS dist))").as("links"))

    // fully-orphaned survivors keep explicit empty neighborhoods
    val emptied = survivors.select(col("src"), col("layer"))
      .join(merged.select(col("src"), col("layer")), Seq("src", "layer"), "left_anti")
      .withColumn("links",
        array().cast(linksSchema("links").dataType))

    merged.unionByName(emptied)
  }

  /** G6 — `from_another` as relational rewrite (graph_mem.rs:46-76):
    * remap every vertex id through `idMap` (old -> new), preserving
    * structure and distances (metric assumed unchanged, so queue order is
    * untouched). Joins only; the graph never leaves the cluster.
    *
    * Type-generic like the reference (`GraphMem<U> -> GraphMem<V>`): the
    * `new` column of `idMap` may be ANY type — long, string, struct — and
    * the output graph's id space follows it; `distMap` optionally rewrites
    * the distance ref type too (e.g. double -> string handle into a
    * secret-shared store). Structure-preserving like the reference:
    * vertices with EMPTY link arrays survive (posexplode would drop
    * them), and an id missing from `idMap` fails the job loudly (left
    * join + raise_error) instead of silently dropping the vertex or edge.
    */
  def remap(links: DataFrame, idMap: DataFrame,
            distMap: Column => Column = identity): DataFrame = {
    // Unmapped id -> runtime error, not a dropped row. raise_error is
    // NullType; the cast (to the TARGET id type — whatever `new` is)
    // lets it sit inside coalesce.
    val newIdType = idMap.schema(idMap.schema.fieldIndex("new")).dataType
    def mappedOrFail(newCol: Column, oldCol: Column): Column =
      coalesce(newCol,
        raise_error(concat(lit("remap: id missing from idMap: "),
          oldCol.cast("string"))).cast(newIdType))

    val srcMapped = links
      .join(idMap.withColumnRenamed("old", "src"), Seq("src"), "left")
      .select(mappedOrFail(col("new"), col("src")).as("src"),
        col("layer"), col("links"))

    // Empty neighborhoods pass through with only the src remapped — the
    // reference's from_another preserves them (graph_mem.rs:46-76), and
    // connectBidirMerge deliberately keeps them too.
    val emptyRows = srcMapped.filter(size(col("links")) === 0)

    val nonEmpty = srcMapped.filter(size(col("links")) > 0)
      .select(col("src"), col("layer"), posexplode(col("links")).as(Seq("pos", "edge")))
      .join(idMap.withColumnRenamed("old", "dst_old"),
        col("edge.dst") === col("dst_old"), "left")
      .groupBy(col("src"), col("layer"))
      .agg(array_sort(collect_list(
        struct(col("pos"),
          struct(mappedOrFail(col("new"), col("edge.dst")).as("dst"),
            distMap(col("edge.dist")).as("dist")).as("edge"))
      )).as("indexed"))
      .select(col("src"), col("layer"),
        expr("transform(indexed, x -> x.edge)").as("links"))

    // Under a type-CHANGING remap the empty rows still carry the OLD
    // element type in their (empty) arrays — retype them to the mapped
    // side's schema so the union resolves.
    val targetLinksType = nonEmpty.schema(nonEmpty.schema.fieldIndex("links")).dataType
    val emptyTyped = emptyRows.select(col("src"), col("layer"),
      array().cast(targetLinksType).as("links"))

    nonEmpty.unionByName(emptyTyped)
  }
}
