package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.GroupTopK.{GroupTopKAgg, Ranked, TopKBuf}

/** Continuous per-group top-k leaderboard over an append stream.
  *
  * The state per group is exactly [[graft.operators.GroupTopK]]'s
  * k-bounded sorted buffer — O(k) longs, independent of stream length —
  * folded forward by `flatMapGroupsWithState`. Each micro-batch emits the
  * group's refreshed leaderboard (Update semantics), so a sink always
  * holds the current top-k per group without ever re-scanning history.
  * The same total order (v DESC, id ASC) makes the stream's final state
  * bit-identical to the batch aggregate over the union of all batches,
  * for ANY batch split — the equivalence StreamingTopKSpec asserts.
  *
  * Input columns: (g string, v long, id long).
  * Output columns: (g, rank, v, id), ranks 1..k, refreshed per batch.
  */
object StreamingTopK {

  def leaderboard(rows: DataFrame, k: Int): DataFrame = {
    val sess = rows.sparkSession
    import sess.implicits._
    rows.select(col("g"), col("v").cast("long"), col("id").cast("long"))
      // a null value/id cannot hold a rank and would crash the primitive
      // state encoder — drop, don't rank (GroupTopK precondition)
      .filter(col("g").isNotNull && col("v").isNotNull && col("id").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[TopKBuf]) =>
          val agg = new GroupTopKAgg(k)
          var buf = state.getOption.getOrElse(agg.zero)
          it.foreach { case (_, v, id) => buf = agg.reduce(buf, Ranked(v, id)) }
          state.update(buf)
          buf.vs.indices.iterator.map(i => (g, (i + 1).toLong, buf.vs(i), buf.ids(i)))
      }
      .toDF("g", "rank", "v", "id")
  }
}
