package graft.hnsw

/** One switch for the process-wide index memos.
  *
  * The memo pattern (buildCached & friends) deliberately pins built
  * indexes for the life of the JVM so catalog queries share one build —
  * but a long mixed workload that is DONE with its ANN phase then
  * carries every pinned model (driver heap) and persisted shard RDD
  * (executor storage pool) into its later phases, where they tax GC and
  * evict the caches those phases actually need. The round-14 driver
  * bench read the `t`/`v` families 3x their band with the `h` family's
  * ten lifecycle handles resident; releasing at the family boundary is
  * how the bench attributes (and avoids) that interference.
  *
  * Releasing is always SAFE: a later query that re-hits a released memo
  * rebuilds it (one build ledger entry, same result — the memos hold
  * only derived state). */
object IndexCaches {

  /** Drop every memoized ANN handle: unpersist shard RDDs, clear the
    * model maps. Heap objects become collectable; executor storage
    * blocks are released asynchronously. */
  def releaseAll(): Unit = {
    HnswDistributed.releaseCaches()
    HnswRouted.releaseCaches()
    HnswRoutedCodes.releaseCaches()
    HnswCodes.releaseCaches()
    HnswPq.releaseCaches()
    HnswRoutedPq.releaseCaches()
  }
}
