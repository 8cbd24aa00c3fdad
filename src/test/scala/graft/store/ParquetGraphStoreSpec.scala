package graft.store

import graft.SparkSpec
import graft.hnsw.{FurthestQueue, HnswParams, HnswSearcher, Neighbor}

/** Port of the reference graph-store CRUD round-trip test
  * (graph_pg.rs:231-286 test_db) plus the pg-backed searcher e2e
  * (graph_pg.rs:288-325, 10-vector self-match). */
class ParquetGraphStoreSpec extends SparkSpec {

  private def freshStore(): (ParquetGraphStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pgstore").toString
    (new ParquetGraphStore(spark, dir), dir)
  }

  test("entry point upsert/read-back; links set/get equality (test_db port)") {
    val (store, _) = freshStore()
    assert(store.getEntryPoint.isEmpty)
    store.setEntryPoint(7L, 0)
    assert(store.getEntryPoint.contains(EntryPoint(7L, 0)))
    // monotone enforcement against the buffered value
    assertThrows[IllegalArgumentException](store.setEntryPoint(8L, 0))
    store.setEntryPoint(8L, 2)
    store.flush()
    assert(store.getEntryPoint.contains(EntryPoint(8L, 2)))

    val q = FurthestQueue.fromUnsorted(Seq(Neighbor(2, 0.5), Neighbor(3, 0.25)))
    store.setLinks(1L, q, 0)
    assert(store.getLinks(1L, 0).toArray.toList == q.toArray.toList) // pre-flush
    store.flush()
    assert(store.getLinks(1L, 0).toArray.toList == q.toArray.toList) // post-flush
    assert(store.getLinks(99L, 0).isEmpty)
    assert(store.numLayers == 3)

    // overwrite semantics (ON CONFLICT DO UPDATE)
    val q2 = FurthestQueue.fromUnsorted(Seq(Neighbor(4, 0.1)))
    store.setLinks(1L, q2, 0)
    store.flush()
    assert(store.getLinks(1L, 0).toArray.toList == q2.toArray.toList)
  }

  test("searcher runs against the parquet store e2e: insert + self-match (pg test port)") {
    val (store, _) = freshStore()
    val params = HnswParams.standard(16, 16, 4)
    val searcher = new HnswSearcher(params)
    val vectors = new CodeVectorStore()
    val ids = (0 until 10).map { raw =>
      val q = vectors.prepareQuery(raw.toLong)
      searcher.insert(vectors, store, q, searcher.selectLayerByHash(q, 3L))
    }
    store.flush()
    ids.foreach { id =>
      val w = searcher.search(vectors, store, id, 1)
      assert(searcher.isMatch(vectors, Seq(w)), s"code $id missing self-match")
    }
    // durable: a fresh store instance over the same path sees the graph
    val reopened = store.loadSnapshot()
    assert(reopened.numLayers == store.numLayers)
  }

  test("crash safety: an incomplete higher links version cannot shadow the intact one") {
    val (store, dir) = freshStore()
    store.setEntryPoint(1L, 0)
    store.setLinks(1L, graft.hnsw.FurthestQueue.fromAscending(
      Seq(graft.hnsw.Neighbor(2L, 0.5))), 0)
    store.flush()
    val before = store.loadSnapshot()

    // simulate a merge killed mid-write: a higher-numbered version dir
    // with data files but NO _SUCCESS marker
    val crashed = java.nio.file.Paths.get(dir, "links_v99")
    java.nio.file.Files.createDirectories(crashed)
    java.nio.file.Files.write(crashed.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))

    val reopened = new ParquetGraphStore(spark, dir)
    val after = reopened.loadSnapshot()
    assert(after.entryPoint == before.entryPoint)
    assert(after.numLayers == before.numLayers)
    assert(after.layerMap(0).keySet == before.layerMap(0).keySet)

    // and the next merge works: the delta writer targets highest
    // COMPLETE version + 1 and reclaims incomplete junk; the intact full
    // version and the new delta both remain (LSM stack)
    import spark.implicits._
    val newLinks = Seq((3L, 0, Seq((1L, 0.25))))
      .toDF("q", "layer", "raw")
      .select(org.apache.spark.sql.functions.col("q"),
        org.apache.spark.sql.functions.col("layer"),
        org.apache.spark.sql.functions.expr(
          "transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
    reopened.mergeBatch(newLinks, HnswParams.standard(16, 16, 4))
    val merged = new ParquetGraphStore(spark, dir).loadSnapshot()
    assert(merged.layerMap(0).contains(3L))
    assert(merged.layerMap(0).contains(1L)) // pre-crash row survives the delta

    // junk is reclaimed; the live stack is the full version + one delta
    val linksDirs = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("links")).sorted
    assert(linksDirs.length == 2 && linksDirs.exists(_.startsWith("links_d")),
      linksDirs.mkString(","))
  }

  test("delta stack: latest wins per key; compaction folds to one full version") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val params = HnswParams.standard(16, 16, 4)
    def linksOf(rows: Seq[(Long, Int, Seq[(Long, Double)])]) =
      rows.toDF("q", "layer", "raw")
        .select(col("q"), col("layer"),
          expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))

    val (store, dir) = freshStore()
    store.setEntryPoint(0L, 0)
    store.setLinks(0L, FurthestQueue.empty, 0)
    store.flush() // full v: {0 -> []}

    // each merge adds one vertex linked to vertex 0 -> vertex 0's queue
    // is REWRITTEN by every delta; latest must win
    val n = ParquetGraphStore.CompactionDeltas + 2
    (1 to n).foreach { i =>
      store.mergeBatch(linksOf(Seq((i.toLong, 0, Seq((0L, i / 100.0))))), params)
    }
    val snap = store.loadSnapshot()
    assert(snap.layerMap(0).keySet == (0L to n.toLong).toSet)
    // vertex 0 accumulated reverse edges across deltas, degree-bounded
    val deg0 = snap.layerMap(0)(0L)._1.length
    assert(deg0 == math.min(n, params.getMMax(0)), s"deg0=$deg0")

    // compaction fired at least once and bounded the stack
    val dirs = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("links_"))
    val deltas = dirs.count(_.startsWith("links_d"))
    assert(dirs.count(_.startsWith("links_v")) == 1, dirs.mkString(","))
    assert(deltas < ParquetGraphStore.CompactionDeltas, dirs.mkString(","))

    // a reopened store resolves the identical graph
    val reread = new ParquetGraphStore(spark, dir).loadSnapshot()
    assert(reread.layerMap(0).map { case (k, v) => (k, v._1.toList, v._2.toList) } ==
      snap.layerMap(0).map { case (k, v) => (k, v._1.toList, v._2.toList) })
  }

  test("flushDelta: point-write overwrite semantics at O(pending) write volume") {
    val (store, dir) = freshStore()
    store.setEntryPoint(0L, 0)
    store.setLinks(0L, FurthestQueue.fromAscending(Seq(Neighbor(1L, 0.5))), 0)
    store.flushDelta() // fresh store: lands as the base full version
    store.setLinks(0L, FurthestQueue.fromAscending(Seq(Neighbor(2L, 0.25))), 0)
    store.setLinks(3L, FurthestQueue.fromAscending(Seq(Neighbor(0L, 0.125))), 0)
    store.flushDelta() // one DELTA of exactly the two touched rows
    // latest wins: vertex 0's queue is the rewrite, vertex 3 appended
    assert(store.getLinks(0L, 0).toArray.toSeq == Seq(Neighbor(2L, 0.25)))
    assert(store.getLinks(3L, 0).toArray.toSeq == Seq(Neighbor(0L, 0.125)))
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
    assert(dirs.count(_.startsWith("links_d")) == 1, dirs.mkString(","))
    // a reopened store resolves identically (durable, not buffer-only)
    val reread = new ParquetGraphStore(spark, dir)
    assert(reread.getLinks(0L, 0).toArray.toSeq == Seq(Neighbor(2L, 0.25)))
  }

  test("crash safety: the entry point is versioned like the links table") {
    val (store, dir) = freshStore()
    store.setEntryPoint(5L, 1)
    store.flush()
    assert(store.getEntryPoint.contains(graft.store.EntryPoint(5L, 1)))

    // a crash mid-write leaves a higher entry version without _SUCCESS;
    // readers must keep resolving the intact one
    val crashed = java.nio.file.Paths.get(dir, "entry_v99")
    java.nio.file.Files.createDirectories(crashed)
    java.nio.file.Files.write(crashed.resolve("part-00000.parquet"), Array[Byte](9))
    val reopened = new ParquetGraphStore(spark, dir)
    assert(reopened.getEntryPoint.contains(graft.store.EntryPoint(5L, 1)))

    // the next entry write reclaims both the old version and the junk
    reopened.setEntryPoint(6L, 2)
    reopened.flush()
    val entryDirs = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("entry"))
    assert(entryDirs.length == 1, entryDirs.mkString(","))
    assert(new ParquetGraphStore(spark, dir).getEntryPoint
      .contains(graft.store.EntryPoint(6L, 2)))
  }

  test("time travel: as-of reads reproduce the table as it stood after each batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val params = HnswParams.standard(16, 16, 4)
    def linksOf(rows: Seq[(Long, Int, Seq[(Long, Double)])]) =
      rows.toDF("q", "layer", "raw")
        .select(col("q"), col("layer"),
          expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
    def tableState(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Seq[Long]] =
      df.select(col("src"), col("layer"), col("links.dst").as("dsts"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2).toList)
        .toMap

    val (store, dir) = freshStore()
    store.setEntryPoint(0L, 0)
    store.setLinks(0L, FurthestQueue.empty, 0)
    store.flush()

    // record the resolved state after every merge, along with the
    // version number that merge produced (stay under the compaction
    // threshold so the whole history is retained)
    val n = ParquetGraphStore.CompactionDeltas - 1
    val states = (1 to n).map { i =>
      store.mergeBatch(linksOf(Seq((i.toLong, 0, Seq((0L, i / 100.0))))), params)
      (store.retainedVersions.max, tableState(store.linksTable))
    }

    // every retained version must read back exactly as it stood
    states.foreach { case (v, expected) =>
      assert(tableState(store.linksTableAt(v)) == expected, s"as-of $v")
    }
    // and a version older than the retention window fails loudly
    val oldest = store.retainedVersions.min
    val ex = intercept[IllegalArgumentException] {
      store.linksTableAt(oldest - 1)
    }
    assert(ex.getMessage.contains("retention window"))
  }

  private def bucketFiles(dir: String): Map[String, Set[String]] = {
    val full = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("links_v\\d+")).head
    full.listFiles().filter(_.getName.startsWith("bucket="))
      .map(b => b.getName ->
        b.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
      .toMap
  }

  test("overlay compaction: only delta-touched key ranges are rewritten; untouched ranges carry over as raw file copies") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val (store, dir) = freshStore()
    store.setEntryPoint(0L, 0)
    (0L until 200L).foreach(i => store.setLinks(i,
      FurthestQueue.fromAscending(Seq(Neighbor((i + 1) % 200, 0.5))), 0))
    store.flush() // bucketed base full
    val before = bucketFiles(dir)
    assert(before.size > 10, s"base full should span many buckets: ${before.keySet}")

    // stack deltas all touching ONE src -> ONE key range
    val touchedSrc = 7L
    (1 to ParquetGraphStore.CompactionDeltas).foreach { i =>
      store.setLinks(touchedSrc,
        FurthestQueue.fromAscending(Seq(Neighbor(i.toLong, i / 100.0))), 0)
      store.flushDelta()
    }
    // compaction folded the stack: one full, no deltas, no staging junk
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.startsWith("links_v")) == 1, names.mkString(","))
    assert(!names.exists(_.startsWith("links_d")), names.mkString(","))
    assert(!names.contains("links_stage"))

    val after = bucketFiles(dir)
    val touchedBucket = "bucket=" + Seq(touchedSrc).toDF("src")
      .select(pmod(hash(col("src")), lit(ParquetGraphStore.CompactionBuckets)))
      .head.getInt(0)
    // the touched range was REWRITTEN (fresh file names), every other
    // range carried over byte-name-identical (copied, not re-encoded)
    assert(after(touchedBucket) != before(touchedBucket), "touched range must rewrite")
    (before.keySet - touchedBucket).foreach { b =>
      assert(after(b) == before(b), s"untouched range $b must carry over")
    }
    // resolution: latest delta won for the touched src, base intact elsewhere
    assert(store.getLinks(touchedSrc, 0).toArray.toSeq ==
      Seq(Neighbor(ParquetGraphStore.CompactionDeltas.toLong,
        ParquetGraphStore.CompactionDeltas / 100.0)))
    assert(store.getLinks(12L, 0).toArray.toSeq == Seq(Neighbor(13L, 0.5)))
    // a reopened store resolves identically
    val reread = new ParquetGraphStore(spark, dir)
    assert(reread.getLinks(touchedSrc, 0).toArray.toSeq ==
      store.getLinks(touchedSrc, 0).toArray.toSeq)
    assert(reread.getLinks(199L, 0).toArray.toSeq == Seq(Neighbor(0L, 0.5)))
  }

  test("overlay compaction over a legacy UNBUCKETED full falls back to the whole rewrite and re-buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val dir = java.nio.file.Files.createTempDirectory("graft-pgstore").toString
    // simulate a pre-overlay store: a plain (unbucketed) full version
    (0L until 50L).map(i => (i, 0, Seq((i + 1, 0.5))))
      .toDF("src", "layer", "raw")
      .select(col("src"), col("layer"),
        expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
      .write.parquet(s"$dir/links_v0")
    val store = new ParquetGraphStore(spark, dir)
    assert(store.getLinks(3L, 0).toArray.toSeq == Seq(Neighbor(4L, 0.5)))
    (1 to ParquetGraphStore.CompactionDeltas).foreach { i =>
      store.setLinks(3L,
        FurthestQueue.fromAscending(Seq(Neighbor(i.toLong, i / 100.0))), 0)
      store.flushDelta()
    }
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.startsWith("links_v")) == 1, names.mkString(","))
    assert(!names.exists(_.startsWith("links_d")))
    // the fold re-bucketed the image (next compaction goes incremental)
    assert(bucketFiles(dir).nonEmpty)
    assert(store.getLinks(3L, 0).toArray.toSeq ==
      Seq(Neighbor(ParquetGraphStore.CompactionDeltas.toLong,
        ParquetGraphStore.CompactionDeltas / 100.0)))
    assert(store.getLinks(10L, 0).toArray.toSeq == Seq(Neighbor(11L, 0.5)))
  }
}
