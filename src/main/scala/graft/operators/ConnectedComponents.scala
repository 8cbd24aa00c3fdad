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

  /** Resolve components of the undirected graph given by `edges`
    * (columns `src`, `dst`; direction ignored; self-loops fine).
    * Returns (id, comp) for every vertex appearing in `edges`, where
    * `comp` is the minimum vertex id in the component. */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // symmetrize once; min-propagation then only needs src->dst messages.
    // Vertices are taken BEFORE the self-loop filter: a vertex whose only
    // edge is a self-loop is still a (singleton) component member.
    val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
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
}
