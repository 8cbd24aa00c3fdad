package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series join Spark lacks natively: for
  * every left row, the single right row with the greatest
  * `rightTime <= leftTime` in the same key group (null-padded when no
  * such row exists). The canonical shapes: trade→latest-quote,
  * purchase→latest-preceding-click attribution, reading→latest-config.
  *
  * Implementation composes existing operators (no custom physical node
  * needed): tag both sides, union, and take `last(right payload,
  * ignoreNulls)` over a (key, time)-ordered running window, then keep
  * the left rows. ONE shuffle on the key — same cost as a plain equi
  * join — and no range-condition explosion: the naive formulation
  * (`l.k = r.k AND r.t <= l.t` theta join + max filter) degenerates to
  * a per-key cross product, O(|l|·|r|) within every key; this is
  * O((|l|+|r|) log) via the window sort. Right rows sort BEFORE left
  * rows at equal time, so a tick at exactly leftTime is matched
  * (`>=` semantics, mirroring e.g. DuckDB's ASOF JOIN).
  *
  * Contract: (rightKey, rightTime) pairs must be unique on the right
  * (the standard as-of contract — with duplicates "the latest tick" is
  * ill-defined); pre-aggregate the right side otherwise. Column names
  * must be disjoint between the sides (the relational-catalog
  * convention).
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    // df(name) + getField keep arbitrary column names intact (a dotted
    // name inside an interpolated path would parse as nested navigation)
    val lPay = struct(left.columns.map(left(_)): _*)
    val rPay = struct(right.columns.map(right(_)): _*)
    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lPay.as("__lpay"))
    // SQL semantics (and DuckDB ASOF, our oracle): a NULL key or NULL
    // time on the right can never match anything — but a NULL __t sorts
    // FIRST in the ascending window and a NULL __k forms its own window
    // partition, so left unfiltered they would fabricate matches.
    // NULL-key/time LEFT rows stay (they must appear in the output) and
    // correctly get a null-padded right side: their partition/prefix
    // contains no surviving right row.
    val lSchema = left.schema
    val rSchema = right.schema
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lSchema).as("__lpay"), rPay.as("__rpay"))
    val unioned = lTagged
      .withColumn("__rpay", lit(null).cast(rSchema))
      .unionByName(rTagged)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      left.columns.map(c => col("__lpay").getField(c).as(c)) ++
        right.columns.map(c => col("__match").getField(c).as(c)): _*)
  }
}
