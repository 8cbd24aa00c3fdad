package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * missing last stage of every pair-emitting dedup operator (MinHash /
  * SimHash / ANN near-dup all emit PAIRS; a pipeline must resolve pairs
  * into duplicate GROUPS before it can pick one canonical survivor per
  * group, else chains A~B~C drop either too little or too much).
  *
  * Algorithm: iterative minimum-label propagation. Every vertex starts
  * labelled with its own id; each round every vertex takes the minimum
  * label among itself and its neighbors; converged when no label changed.
  * Rounds = O(graph diameter) shuffles — near-dup graphs are unions of
  * small dense clusters (diameter a handful), so the loop terminates in a
  * few rounds regardless of corpus size; each round is one
  * join + groupBy on the edge list, fully distributed (no driver state
  * beyond the changed-count). For adversarially long path graphs the
  * round count grows with the diameter (the large-star/small-star
  * alternating-contraction trick from the MapReduce CC literature cuts it
  * to O(log^2 n)); dedup workloads never look like that, so we keep the
  * simpler invariant-friendly loop.
  *
  * Lineage is truncated every round with localCheckpoint — without it the
  * iterated plan doubles per round and optimizer time dominates (the
  * HnswFrontier lesson).
  */
object ConnectedComponents {

  /** Edge-count bound under which [[run]] resolves components with a
    * driver-side union-find instead of the iterative loop (round-19):
    * 2M symmetrized (long, long) edges collect to ~32 MB — the
    * allowProbe-style bounded-collect pattern. Below the bound the whole
    * resolution is one collect + one parallelize instead of
    * O(diameter) join+aggregate barriers; above it the distributed
    * loop runs unchanged. Identical output by construction (same
    * min-label-per-component contract, pinned by
    * ConnectedComponentsSpec's cutover-parity test). */
  val CollectEdgeMax = 2000000L

  /** Resolve components of the undirected graph given by `edges`
    * (columns `src`, `dst`; direction ignored; self-loops fine).
    * Returns (id, comp) for every vertex appearing in `edges`, where
    * `comp` is the minimum vertex id in the component. */
  def run(edges: DataFrame, maxIter: Int = 25,
          collectMax: Long = CollectEdgeMax): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // symmetrize once; min-propagation then only needs src->dst messages.
    // Vertices are taken BEFORE the self-loop filter: a vertex whose only
    // edge is a self-loop is still a (singleton) component member.
    val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    // Bounded driver cutover: the symmetrized list is already
    // materialized, so the size probe is a cheap count over the
    // checkpointed (immutable) blocks, and the collect below is
    // count-gated to at most collectMax rows.
    if (sym.count() <= collectMax) {
      import org.apache.spark.sql.Encoders
      val pairs = sym.as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
        .collect()
      return driverComponents(edges.sparkSession, pairs)
    }
    val messages = sym.filter(col("src") =!= col("dst"))

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // message: each vertex offers its current label to every neighbor.
      // The previous label rides along in the same aggregation (labels
      // rows carry comp as `prev`, offers carry +inf), so the
      // changed-count needs no second join — and the count action
      // doubles as the lazy checkpoint's materialization: ONE job and
      // one shuffle barrier per round, not two.
      val offers = messages
        .join(labels, messages("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"),
          lit(Long.MaxValue).as("prev"))
      val next = labels
        .select(col("id"), col("comp"), col("comp").as("prev"))
        .unionByName(offers)
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"), min(col("prev")).as("prev"))
        .localCheckpoint(eager = false)
      changed = next.filter(col("comp") < col("prev")).count()
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    // Unconverged labels are not components — a silent partial answer
    // under-merges duplicate groups; fail loudly instead (raise maxIter
    // for pathological diameters).
    if (changed > 0) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds " +
        s"($changed labels still improving — graph diameter exceeds the budget)")
    labels
  }

  /** Union-find (path-halving + union-by-smaller-root) over a collected
    * symmetrized edge list; labels are the component MINIMUM id — the
    * exact contract of the distributed loop. */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
                               pairs: Array[(Long, Long)]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      while (p != x) {
        val gp = parent.get(p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.get(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      // union by MIN root: the root is then the component minimum by
      // induction (every union keeps the smaller id on top)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    val out = parent.keySet().asScala.toArray.sorted
      .map(id => (id, find(id)))
    import spark.implicits._
    spark.createDataset(out.toSeq).toDF("id", "comp")
  }
}
