package graft

import java.nio.file.{Files, Path}

/** Scratch directories for memoized corpus artifacts (truth tables,
  * format mirrors, layout rewrites, candidate stages). Every artifact
  * the path-memo pattern writes is JVM-scoped — the ConcurrentHashMap
  * memo dies with the process, so the files would never be read again —
  * yet plain createTempDirectory leaves table-sized parquet under
  * java.io.tmpdir after every bench/test run. Creating through here
  * registers the directory for a best-effort recursive delete at JVM
  * exit: repeated runs on a long-lived host no longer accumulate
  * copies. (In a real deployment these artifacts belong in a durable
  * cache keyed by corpus path — the HnswDurable/buildCached shape —
  * which is a deployment decision, not a library default.)
  */
object TempDirs {
  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { root =>
      // best-effort: deepest-first walk; a file Spark still holds open
      // (or a races-with-Spark's-own-hooks failure) must not abort exit
      try {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
      } catch { case _: Throwable => () }
    }
  }, "graft-tempdir-cleanup"))

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
