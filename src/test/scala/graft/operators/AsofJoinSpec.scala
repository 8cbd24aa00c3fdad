package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of semantics against a naive driver-side reference: greatest right
  * time <= left time (backward) / smallest >= (forward) per key, ties at
  * equal time matched, null-padded when no such row exists; tolerance
  * null-pads out-of-window matches; the broadcast (never-shuffle-left)
  * strategy is row-identical to the union-window strategy. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // shared random fixtures: (lid, k, t) / (rid, k, t, payload), unique
  // (key, time) on the right per the as-of contract
  private lazy val (lrows, rrows) = {
    val rng = new scala.util.Random(11)
    val l = (0 until 400).map { i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)
    }
    val r = (0 until 300).map { i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)
    }.distinctBy(x => (x._2, x._3))
      .map { case (rid, k, t) => (rid, k, t, s"q$rid") }
    (l, r)
  }
  private def lDf = lrows.toDF("lid", "k", "t")
  private def rDf = rrows.toDF("rid", "rk", "rt", "quote")
  private def matchMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("matches the naive per-row maximum-earlier-tick reference") {
    val got = matchMap(AsofJoin.backward(lDf, rDf, "k", "rk", "t", "rt"))
    lrows.foreach { case (lid, k, t) =>
      val expect = rrows.filter(r => r._2 == k && r._3 <= t)
        .sortBy(_._3).lastOption.map(_._1)
      assert(got(lid) == expect, s"lid=$lid k=$k t=$t")
    }
  }

  test("forward matches the naive per-row minimum-later-tick reference") {
    val got = matchMap(AsofJoin.forward(lDf, rDf, "k", "rk", "t", "rt"))
    lrows.foreach { case (lid, k, t) =>
      val expect = rrows.filter(r => r._2 == k && r._3 >= t)
        .sortBy(_._3).headOption.map(_._1)
      assert(got(lid) == expect, s"lid=$lid k=$k t=$t")
    }
  }

  test("tolerance null-pads out-of-window matches (both directions)") {
    val tol = 50L
    val back = matchMap(AsofJoin.backward(lDf, rDf, "k", "rk", "t", "rt",
      tolerance = Some((lt, rt) => lt - rt <= lit(tol))))
    val fwd = matchMap(AsofJoin.forward(lDf, rDf, "k", "rk", "t", "rt",
      tolerance = Some((lt, rt) => rt - lt <= lit(tol))))
    lrows.foreach { case (lid, k, t) =>
      val eb = rrows.filter(r => r._2 == k && r._3 <= t && t - r._3 <= tol)
        .sortBy(_._3).lastOption.map(_._1)
      val ef = rrows.filter(r => r._2 == k && r._3 >= t && r._3 - t <= tol)
        .sortBy(_._3).headOption.map(_._1)
      assert(back(lid) == eb, s"backward lid=$lid k=$k t=$t")
      assert(fwd(lid) == ef, s"forward lid=$lid k=$k t=$t")
    }
  }

  test("nearest matches the naive minimum-|gap| reference with backward ties") {
    val got = matchMap(AsofJoin.nearest(lDf, rDf, "k", "rk", "t", "rt"))
    lrows.foreach { case (lid, k, t) =>
      val cands = rrows.filter(_._2 == k)
      val expect =
        if (cands.isEmpty) None
        // min |gap|; ties -> the EARLIER tick (backward), like merge_asof
        else Some(cands.minBy(r => (math.abs(r._3 - t), r._3))._1)
      assert(got(lid) == expect, s"lid=$lid k=$k t=$t")
    }
  }

  test("nearest with a symmetric tolerance null-pads when the closest tick is too far") {
    val tol = 30L
    val got = matchMap(AsofJoin.nearest(lDf, rDf, "k", "rk", "t", "rt",
      tolerance = Some((lt, rt) => abs(rt - lt) <= lit(tol))))
    lrows.foreach { case (lid, k, t) =>
      val cands = rrows.filter(r => r._2 == k && math.abs(r._3 - t) <= tol)
      val expect =
        if (cands.isEmpty) None
        else Some(cands.minBy(r => (math.abs(r._3 - t), r._3))._1)
      assert(got(lid) == expect, s"lid=$lid k=$k t=$t")
    }
  }

  test("nearest with an ASYMMETRIC tolerance picks the other direction when the closest fails") {
    // backward-only bound: ticks behind by <= 2 are fine, any forward
    // gap is fine. Left t=100 with ticks at 97 (gap 3, fails) and 104
    // (forward, passes): the match must be 104, not null.
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 97L, "b"), (8L, 1L, 104L, "f")).toDF("rid", "rk", "rt", "v")
    val tol: AsofJoin.TolerancePredicate =
      (lt, rt) => (rt >= lt) || (lt - rt <= lit(2L))
    val out = AsofJoin.nearest(l, r, "k", "rk", "t", "rt", Some(tol)).collect().head
    assert(out.getLong(3) == 8L, out.toString)
  }

  test("broadcast and nearest reject a non-integral time axis with a clear error") {
    val l = Seq((1L, 1L, new java.sql.Timestamp(1000L)))
      .toDF("lid", "k", "t")
    val r = Seq((7L, 1L, new java.sql.Timestamp(500L), "x"))
      .toDF("rid", "rk", "rt", "v")
    for (call <- Seq(
      () => AsofJoin.backwardBroadcast(l, r, "k", "rk", "t", "rt"),
      () => AsofJoin.forwardBroadcast(l, r, "k", "rk", "t", "rt"),
      () => AsofJoin.nearest(l, r, "k", "rk", "t", "rt"))) {
      val e = intercept[IllegalArgumentException](call())
      assert(e.getMessage.contains("integral"), e.getMessage)
    }
  }

  test("broadcast strategy is row-identical to the union-window strategy") {
    val tol: Option[AsofJoin.TolerancePredicate] =
      Some((lt, rt) => lt - rt <= lit(120L))
    val tolF: Option[AsofJoin.TolerancePredicate] =
      Some((lt, rt) => rt - lt <= lit(120L))
    for ((a, b) <- Seq(
      AsofJoin.backward(lDf, rDf, "k", "rk", "t", "rt") ->
        AsofJoin.backwardBroadcast(lDf, rDf, "k", "rk", "t", "rt"),
      AsofJoin.forward(lDf, rDf, "k", "rk", "t", "rt") ->
        AsofJoin.forwardBroadcast(lDf, rDf, "k", "rk", "t", "rt"),
      AsofJoin.backward(lDf, rDf, "k", "rk", "t", "rt", tol) ->
        AsofJoin.backwardBroadcast(lDf, rDf, "k", "rk", "t", "rt", tol),
      AsofJoin.forward(lDf, rDf, "k", "rk", "t", "rt", tolF) ->
        AsofJoin.forwardBroadcast(lDf, rDf, "k", "rk", "t", "rt", tolF))) {
      val sa = a.collect().map(_.toString).sorted.toSeq
      val sb = b.collect().map(_.toString).sorted.toSeq
      assert(sa == sb)
    }
  }

  test("broadcast plan never shuffles the left side") {
    val plan = AsofJoin.backwardBroadcast(lDf, rDf, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    // the ONLY hash shuffle allowed is the right-side groupBy (ticks);
    // a second one would mean the probe side moved
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected <=1 hash shuffle, got $shuffles:\n$plan")
  }

  test("broadcast null right keys/times never match; null left rows survive") {
    val l = Seq(
      (1L, Some(1L), Some(50L)),
      (2L, None, Some(60L)),
      (3L, Some(2L), None)
    ).toDF("lid", "k", "t")
    val r = Seq(
      (7L, Some(1L), Option.empty[Long], "nulltime"),
      (8L, Option.empty[Long], Some(10L), "nullkey"),
      (9L, Some(2L), Some(10L), "real")
    ).toDF("rid", "rk", "rt", "v")
    val rows = AsofJoin.backwardBroadcast(l, r, "k", "rk", "t", "rt")
      .collect().map(x => x.getLong(0) -> x.isNullAt(3)).toMap
    assert(rows == Map(1L -> true, 2L -> true, 3L -> true))
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

  test("forward: a null-time left row is null-padded (it sorts last in the descending window)") {
    val l = Seq((1L, Some(1L), Option.empty[Long])).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 10L, "x"), (8L, 1L, 20L, "y")).toDF("rid", "rk", "rt", "v")
    val out = AsofJoin.forward(l, r, "k", "rk", "t", "rt").collect().head
    assert(out.isNullAt(3) && out.isNullAt(6))
  }

  test("sorted_count_le/lt binary search edges (empty, below-all, above-all, exact hits)") {
    import graft.functions.AsofFunctions.{countLE, countLT}
    val df = Seq(
      (1L, Seq.empty[Long], 5L),
      (2L, Seq(10L, 20L, 30L), 5L),
      (3L, Seq(10L, 20L, 30L), 35L),
      (4L, Seq(10L, 20L, 30L), 20L),
      (5L, Seq(10L, 20L, 30L), 10L)
    ).toDF("id", "arr", "v")
    val got = df.select(col("id"), countLE(col("arr"), col("v")).as("le"),
        countLT(col("arr"), col("v")).as("lt"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got == Map(1L -> ((0, 0)), 2L -> ((0, 0)), 3L -> ((3, 3)),
      4L -> ((2, 1)), 5L -> ((1, 0))))
  }

  test("nearestBroadcast is row-identical to the union-window nearest") {
    val symTol: Option[AsofJoin.TolerancePredicate] =
      Some((lt, rt) => abs(rt - lt) <= lit(30L))
    val asymTol: Option[AsofJoin.TolerancePredicate] =
      Some((lt, rt) => (rt >= lt) || (lt - rt <= lit(2L)))
    for (tol <- Seq(None, symTol, asymTol)) {
      val a = AsofJoin.nearest(lDf, rDf, "k", "rk", "t", "rt", tol)
        .collect().map(_.toString).sorted.toSeq
      val b = AsofJoin.nearestBroadcast(lDf, rDf, "k", "rk", "t", "rt", tol)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"tol=$tol")
    }
  }

  test("nearestBroadcast exact-hit forward candidate is the tick itself, not its successor") {
    // left t = 100 sits ON tick 100; the tolerance rejects gap 0 but
    // passes gap >= 5. The window strategy considers only the CLOSEST
    // tick per direction — forward = the exact tick itself — so both
    // directions null-pad. A broadcast probe that took countLE+1 (the
    // successor, 110) as the forward candidate would pass tolerance and
    // fabricate a match the window twin null-pads.
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 100L, "hit"), (8L, 1L, 110L, "succ"))
      .toDF("rid", "rk", "rt", "v")
    // rejects gap 0, passes gap >= 5 — adversarial for a bidx+1 probe
    val tol: AsofJoin.TolerancePredicate =
      (lt, rt) => abs(rt - lt) >= lit(5L)
    val win = AsofJoin.nearest(l, r, "k", "rk", "t", "rt", Some(tol))
      .collect().head
    val bc = AsofJoin.nearestBroadcast(l, r, "k", "rk", "t", "rt", Some(tol))
      .collect().head
    assert(win.isNullAt(3), win.toString)
    assert(bc.isNullAt(3), bc.toString)
  }

  test("nearestBroadcast plan never shuffles the left side") {
    val plan = AsofJoin.nearestBroadcast(lDf, rDf, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected <=1 hash shuffle, got $shuffles:\n$plan")
  }

  test("broadcast strategies fail fast on an oversized right side, naming the alternative") {
    for (call <- Seq(
      () => AsofJoin.backwardBroadcast(lDf, rDf, "k", "rk", "t", "rt",
        maxRightRows = 10L),
      () => AsofJoin.forwardBroadcast(lDf, rDf, "k", "rk", "t", "rt",
        maxRightRows = 10L),
      () => AsofJoin.nearestBroadcast(lDf, rDf, "k", "rk", "t", "rt",
        maxRightRows = 10L))) {
      // plan construction is FREE (the guard rides the job — no eager
      // right-side scan); the fail-fast surfaces on the first action,
      // raised executor-side before the broadcast collects
      val df = call()
      val e = intercept[Throwable](df.collect())
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(chain.contains("union+window"), chain)
      assert(chain.contains("maxRightRows"), chain)
    }
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
