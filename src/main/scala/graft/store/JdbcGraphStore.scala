package graft.store

import java.sql.{Connection, DriverManager}

import graft.hnsw.{FurthestQueue, Neighbor}

/** JDBC-backed [[GraphStore]] — the RDBMS twin of [[ParquetGraphStore]],
  * completing the reference's two-impl split (in-memory GraphMem +
  * Postgres GraphPg, reference src/graph_store/graph_pg.rs:18-128).
  *
  * Mirrors the reference store's surface row for row: one
  * `hawk_graph_links(source_ref, layer, links)` row per adjacency with
  * the serialized neighbor queue in the `links` column (jsonb there, a
  * JSON text column here — Derby has no json type) under a
  * (source_ref, layer) primary key, a singleton `hawk_graph_entry` row
  * (id = 0), and one point-read / upsert round-trip per op
  * (graph_pg.rs:53-123; schema migrations/20240909105321_init.up.sql:1-12).
  * The upsert is UPDATE-then-INSERT rather than a vendor `ON CONFLICT`
  * so any JDBC engine works — tested on embedded Derby, the one JDBC
  * engine already on Spark's classpath. Writes assume a single writer
  * (the build loop's shape here and in the reference, whose searcher
  * holds `&mut self` across every mutation).
  *
  * `numLayers` derives from MAX(layer)+1 and the entry layer — the
  * reference pg impl left it `todo!()` (graph_pg.rs:125-127); ours is
  * real, same contract as [[ParquetGraphStore.numLayers]].
  *
  * Scale role: the SERVING-tier point-read store (the reference's
  * deployment shape — bounded connections, one round-trip per
  * get/set_links during a sequential online insert). Batch builds stay
  * on [[ParquetGraphStore]]: an RDBMS row-at-a-time surface is not
  * where a 100 TB build writes its adjacency.
  */
final class JdbcGraphStore(url: String) extends GraphStore with AutoCloseable {

  private val conn: Connection = DriverManager.getConnection(url)
  conn.setAutoCommit(true)

  // Derby has no CREATE TABLE IF NOT EXISTS: attempt and swallow the
  // already-exists state (X0Y32 on Derby, 42P07 on pg — match by
  // SQLState family rather than message).
  private def ensureTable(ddl: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(ddl)
    catch {
      case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" => ()
    } finally st.close()
  }

  // CLOB, not VARCHAR(n): a bounded column truncation-fails mid-build
  // for neighbor queues above ~1k entries (large ef_construction), where
  // the reference's jsonb column is unbounded. CLOB is ANSI and Derby /
  // Oracle / DB2-native; a Postgres deployment pre-creates the schema
  // with TEXT/jsonb via its own migration (as the reference does).
  ensureTable(
    """CREATE TABLE hawk_graph_links (
      |  source_ref BIGINT NOT NULL,
      |  layer INT NOT NULL,
      |  links CLOB NOT NULL,
      |  PRIMARY KEY (source_ref, layer))""".stripMargin)
  ensureTable(
    """CREATE TABLE hawk_graph_entry (
      |  id INT NOT NULL,
      |  point BIGINT NOT NULL,
      |  layer INT NOT NULL,
      |  PRIMARY KEY (id))""".stripMargin)

  /** Queue -> JSON array of [dst, dist] pairs, ascending by distance
    * (the queue's own order). Double.toString round-trips exactly, so
    * distances survive persistence bit-for-bit. */
  private def serialize(links: FurthestQueue): String =
    links.toArray.map(n => s"[${n.dst},${n.dist}]").mkString("[", ",", "]")

  private def deserialize(s: String): FurthestQueue = {
    val body = s.trim.stripPrefix("[").stripSuffix("]")
    if (body.isEmpty) FurthestQueue.empty
    else FurthestQueue.fromAscending(
      body.split("\\],\\s*\\[").toSeq.map { pair =>
        val Array(dst, dist) = pair.stripPrefix("[").stripSuffix("]").split(",")
        Neighbor(dst.trim.toLong, dist.trim.toDouble)
      })
  }

  /** G1 (graph_pg.rs:53-68: SELECT ... WHERE id = 0). */
  override def getEntryPoint: Option[EntryPoint] = {
    val ps = conn.prepareStatement(
      "SELECT point, layer FROM hawk_graph_entry WHERE id = 0")
    try {
      val rs = ps.executeQuery()
      if (rs.next()) Some(EntryPoint(rs.getLong(1), rs.getInt(2))) else None
    } finally ps.close()
  }

  /** G2 upsert (graph_pg.rs:70-84), with the monotone-layer contract
    * every other impl enforces. */
  override def setEntryPoint(point: Long, layer: Int): Unit = {
    getEntryPoint.foreach { prev =>
      require(prev.layer < layer,
        s"a new entry point must be on a higher layer (${prev.layer} -> $layer)")
    }
    val up = conn.prepareStatement(
      "UPDATE hawk_graph_entry SET point = ?, layer = ? WHERE id = 0")
    val updated =
      try { up.setLong(1, point); up.setInt(2, layer); up.executeUpdate() }
      finally up.close()
    if (updated == 0) {
      val ins = conn.prepareStatement(
        "INSERT INTO hawk_graph_entry (id, point, layer) VALUES (0, ?, ?)")
      try { ins.setLong(1, point); ins.setInt(2, layer); ins.executeUpdate() }
      finally ins.close()
    }
  }

  /** G3 point read (graph_pg.rs:86-107); absent row -> empty queue. */
  override def getLinks(base: Long, lc: Int): FurthestQueue = {
    val ps = conn.prepareStatement(
      "SELECT links FROM hawk_graph_links WHERE source_ref = ? AND layer = ?")
    try {
      ps.setLong(1, base); ps.setInt(2, lc)
      val rs = ps.executeQuery()
      if (rs.next()) deserialize(rs.getString(1)) else FurthestQueue.empty
    } finally ps.close()
  }

  /** G4 upsert (graph_pg.rs:109-123). */
  override def setLinks(base: Long, links: FurthestQueue, lc: Int): Unit = {
    val payload = serialize(links)
    val up = conn.prepareStatement(
      "UPDATE hawk_graph_links SET links = ? WHERE source_ref = ? AND layer = ?")
    val updated =
      try { up.setString(1, payload); up.setLong(2, base); up.setInt(3, lc); up.executeUpdate() }
      finally up.close()
    if (updated == 0) {
      val ins = conn.prepareStatement(
        "INSERT INTO hawk_graph_links (source_ref, layer, links) VALUES (?, ?, ?)")
      try { ins.setLong(1, base); ins.setInt(2, lc); ins.setString(3, payload); ins.executeUpdate() }
      finally ins.close()
    }
  }

  /** G5 — derived (the reference pg impl's `todo!()`, graph_pg.rs:125-127). */
  override def numLayers: Int = {
    val st = conn.createStatement()
    val stored =
      try {
        val rs = st.executeQuery("SELECT MAX(layer) FROM hawk_graph_links")
        if (rs.next()) { val m = rs.getInt(1); if (rs.wasNull()) 0 else m + 1 }
        else 0
      } finally st.close()
    math.max(stored, getEntryPoint.map(_.layer + 1).getOrElse(0))
  }

  override def close(): Unit = conn.close()
}

object JdbcGraphStore {
  /** Embedded-Derby store in `dir` (created on first open) — the
    * dependency-free local analog of the reference's Postgres URL. */
  def derby(dir: String): JdbcGraphStore =
    new JdbcGraphStore(s"jdbc:derby:$dir;create=true")
}
