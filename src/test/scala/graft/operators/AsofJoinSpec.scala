package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Backward as-of semantics against a naive driver-side reference:
  * greatest right time <= left time per key, ties at equal time matched,
  * null-padded when no earlier right row exists. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive per-row maximum-earlier-tick reference") {
    val rng = new scala.util.Random(11)
    val lrows = (0 until 400).map { i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)
    } // (lid, k, t)
    val rrows = (0 until 300).map { i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)
    }.distinctBy(r => (r._2, r._3)) // unique (key, time): the contract
      .map { case (rid, k, t) => (rid, k, t, s"q$rid") }

    val got = AsofJoin.backward(
        lrows.toDF("lid", "k", "t"),
        rrows.toDF("rid", "rk", "rt", "quote"),
        "k", "rk", "t", "rt")
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    lrows.foreach { case (lid, k, t) =>
      val expect = rrows.filter(r => r._2 == k && r._3 <= t)
        .sortBy(_._3).lastOption.map(_._1)
      assert(got(lid) == expect, s"lid=$lid k=$k t=$t")
    }
  }

  test("a tick at exactly the left time is matched (>= semantics)") {
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 100L, "x")).toDF("rid", "rk", "rt", "v")
    val out = AsofJoin.backward(l, r, "k", "rk", "t", "rt").collect().head
    assert(out.getLong(3) == 7L && out.getString(6) == "x")
  }

  test("no earlier tick yields a null-padded right side") {
    val l = Seq((1L, 1L, 50L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 99L, "x")).toDF("rid", "rk", "rt", "v")
    val out = AsofJoin.backward(l, r, "k", "rk", "t", "rt").collect().head
    assert(out.isNullAt(3) && out.isNullAt(6))
    assert(out.getLong(0) == 1L)
  }

  test("NULL right times and NULL keys never match (SQL/ASOF semantics)") {
    // a NULL tick time would sort first ascending and a NULL key forms
    // its own window partition — both must be excluded, not matched
    val l = Seq(
      (1L, Some(1L), Some(50L)),  // real key/time, only a null-time tick exists
      (2L, None, Some(60L)),      // null key
      (3L, Some(2L), None)        // null time
    ).toDF("lid", "k", "t")
    val r = Seq(
      (7L, Some(1L), Option.empty[Long], "nulltime"),
      (8L, Option.empty[Long], Some(10L), "nullkey"),
      (9L, Some(2L), Some(10L), "real")
    ).toDF("rid", "rk", "rt", "v")
    val rows = AsofJoin.backward(l, r, "k", "rk", "t", "rt")
      .collect().map(x => x.getLong(0) -> x.isNullAt(3)).toMap
    assert(rows == Map(1L -> true, 2L -> true, 3L -> true))
  }
}
