package graft.hnsw

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The versioned-directory persistence discipline shared by the durable
  * index tiers ([[HnswRouted]], [[HnswRoutedCodes]]) — the same
  * contract ParquetGraphStore uses for the LSM tier: a writer creates
  * `idx_v{N}`, writes every table, and drops a `_DONE` marker LAST;
  * readers resolve only marker-complete versions; the writer reclaims
  * superseded versions only after its own marker lands. A crash
  * mid-save leaves junk that can never resolve to a reader, and a
  * crash mid-reclaim leaves a complete old version alongside the new
  * one (next save cleans it) — no torn read is possible at any point.
  */
private[graft] object VersionedIndexDirs {
  private val vRe = "idx_v(\\d+)".r

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fresh version directory to write into (one past the highest
    * existing version number, complete or not — junk never gets
    * overwritten, only reclaimed by [[commit]]). */
  def nextDir(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    val existing =
      if (!fs.exists(new Path(path))) Seq.empty
      else fs.listStatus(new Path(path)).toSeq.flatMap { st =>
        st.getPath.getName match {
          case vRe(n) => Some(n.toInt)
          case _      => None
        }
      }
    s"$path/idx_v${existing.maxOption.getOrElse(-1) + 1}"
  }

  /** Mark `dir` complete, then reclaim superseded versions under
    * `path`: crashed partials always; complete versions beyond the
    * newest `keepLast`. `keepLast = 1` (the batch default) keeps only
    * the version just written. Streaming save-while-attached loops
    * pass `keepLast = 2` — a LIVE handle attached from the PREVIOUS
    * version still reads that version's parquet through its RDD
    * lineage (cache eviction / executor loss recompute), so the
    * writer must not delete it until the handle has been REBASED onto
    * the new image (the [[StreamingRouted]]-family rebase-after-save
    * discipline; with rebase each save, the live handle is never more
    * than one version behind). */
  def commit(spark: SparkSession, path: String, dir: String,
             keepLast: Int = 1): Unit = {
    val fs = fsOf(spark, path)
    fs.create(new Path(s"$dir/_DONE"), true).close()
    val complete = fs.listStatus(new Path(path)).toSeq.flatMap { st =>
      st.getPath.getName match {
        case vRe(n) if fs.exists(new Path(st.getPath, "_DONE")) =>
          Some(n.toInt)
        case _ => None
      }
    }.sorted(Ordering.Int.reverse)
    val keep = complete.take(math.max(1, keepLast))
      .map(n => s"idx_v$n").toSet + new Path(dir).getName
    fs.listStatus(new Path(path)).foreach { st =>
      st.getPath.getName match {
        case vRe(_) if !keep(st.getPath.getName) => fs.delete(st.getPath, true)
        case _                                   => ()
      }
    }
  }

  /** Newest complete (`_DONE`-marked) version dir under `path`. */
  def newestDone(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    val versions =
      if (!fs.exists(new Path(path))) Seq.empty
      else fs.listStatus(new Path(path)).toSeq.flatMap { st =>
        st.getPath.getName match {
          case vRe(n) if fs.exists(new Path(st.getPath, "_DONE")) => Some(n.toInt)
          case _                                                  => None
        }
      }
    require(versions.nonEmpty, s"no complete index version at $path")
    s"$path/idx_v${versions.max}"
  }
}
