package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.cents

/** The rest of the TPC-H query shapes (the first nine live in
  * [[Relational]]) — completing the 22-query relational shell.
  *
  * The driver testdata is TPC-H-ISH: no `partsupp` table, and lineitem
  * carries no commitdate/receiptdate/shipmode. Queries whose canonical
  * form needs those (q2, q11, q12, q16, q20, q21) are ADAPTED — same
  * plan shape (correlated min, HAVING over a scalar subquery, CASE
  * aggregation, distinct-count, semi/anti correlation) with the
  * part-supplier relation derived from lineitem and lateness derived
  * from shipdate vs orderdate; each notes its adaptation inline.
  *
  * Exactness discipline per Tables: money in integer cents, ratio
  * comparisons cross-multiplied in integers, every query deterministically
  * ordered.
  */
object Relational2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2 (adapted: no partsupp -> supplier-of-part via lineitem; "min
    // supplycost" -> max s_acctbal): for each large BRASS-ish part, the
    // best EUROPE supplier among those who actually shipped it. The q2
    // shape: groupBy-extremum + join-back on the extremum key.
    "q2_best_supplier" -> ((s, dir) => {
      val part = t(s, dir, "part")
        .filter(col("p_size") >= 30 && col("p_type").endsWith("D"))
        .select("p_partkey", "p_name", "p_size", "p_type")
      val region = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val nation = t(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = t(s, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      // filter BEFORE the pair-dedup exchange (round-19, guide §2.3 —
      // the q16 treatment, via broadcast SEMI-joins so the distinct
      // stays a narrow two-long hash aggregate rather than a string-
      // buffered first() SortAggregate): the part + EUROPE-supplier
      // keys keep a few percent of lineitem pairs, so the dedup
      // shuffles that fraction instead of the whole table. Identical
      // result: a pair survives the semi-filters iff it would have
      // joined, and the attribute joins after the dedup attach exactly
      // the rows the old distinct-then-join produced.
      val pairs = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(part.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(supp.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .distinct()
      val cand = pairs
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      val best = cand.groupBy(col("p_partkey").as("bk"))
        .agg(max(cents(col("s_acctbal"))).as("best_bal_c"))
      cand.join(broadcast(best),
          col("p_partkey") === col("bk") && cents(col("s_acctbal")) === col("best_bal_c"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          cents(col("s_acctbal")).as("s_acctbal_c"))
        .orderBy(col("s_acctbal_c").desc, col("p_partkey"), col("s_name"))
        .limit(50)
    }),

    // Q6 forecast revenue: the purest pushdown query — every predicate
    // reaches the parquet scan, one partial-agg to a single row.
    "q6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
          count(lit(1)).as("n_lines"))
    }),

    // Q8 national market share: the two-level aggregation over an 7-way
    // join; all dims broadcast, lineitem x orders the one shuffle. Share
    // = exact integer cents ratio.
    "q8_market_share" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_type").startsWith("STANDARD"))
        .select("p_partkey")
      val region = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      val nation2 = t(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("ck"))
      val cust = t(s, dir, "customer")
        .join(broadcast(nation2), col("c_nationkey") === col("ck"))
        .select("c_custkey")
      val nation1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val supp = t(s, dir, "supplier")
        .join(broadcast(nation1), col("s_nationkey") === col("sk"))
        .select("s_suppkey", "supp_nation")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_9",
            cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).otherwise(0L))
            .as("brazil_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("total_c"))
        .withColumn("mkt_share", col("brazil_c") / col("total_c"))
        .orderBy(col("o_year"))
    }),

    // Q10 returned-item reporting: who returned goods and what did it
    // cost — customer-grain aggregation, top 20.
    "q10_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-06-01") && col("o_orderdate") < lit("1997-12-01"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue_c").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q11 (adapted: no partsupp -> shipped inventory value from lineitem;
    // suppliers of one nation): parts whose shipped value exceeds
    // 1/1000 of the nation's total — the HAVING-over-scalar-subquery
    // shape, cross-multiplied in integers so the cut is exact.
    "q11_important_stock" -> ((s, dir) => {
      val nation = t(s, dir, "nation").filter(col("n_name") === "NATION_9")
      val supp = t(s, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val li = t(s, dir, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      val byPart = li.groupBy(col("l_partkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
      val total = byPart.agg(sum(col("value_c")).as("total_c"))
      byPart.join(broadcast(total))
        .filter(col("value_c") * 1000 > col("total_c"))
        .select(col("l_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("l_partkey"))
    }),

    // Q12 (adapted: lateness = shipped > 60 days after order date, no
    // shipmode -> split by order priority class): the CASE-aggregation
    // shape over one lineitem x orders join.
    "q12_late_shipments" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
      t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy(col("l_year"))
    }),

    // Q15 top supplier: quarter revenue per supplier, keep the max-revenue
    // supplier(s) — the view + scalar-max shape, exact on integer cents.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("total_revenue_c"))
      val mx = rev.agg(max(col("total_revenue_c")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue_c") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_c"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16 (adapted: supplier-of-part via lineitem): how many distinct
    // suppliers serve each (brand, type, size) bucket, excluding one
    // brand — distinct-count after a distinct pair projection.
    "q16_part_supplier_counts" -> ((s, dir) => {
      val part = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#3" && col("p_size").isin(5, 10, 15, 20, 25, 30))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      // filter BEFORE the pair-distinct (round-19, guide §2.3 filter
      // before the exchange): the broadcast part filter keeps ~11% of
      // lineitem rows, so the (l_partkey, l_suppkey) dedup shuffles that
      // fraction instead of the whole table. Session 2: the filter is a
      // broadcast SEMI-join on p_partkey and the attributes join AFTER
      // the dedup — the first form (dropDuplicates after the full
      // attribute join) dragged the p_brand/p_type strings through the
      // dedup as a string-buffered first() SortAggregate pair; the
      // semi-filter keeps it a narrow two-long HashAggregate. Identical
      // result: a pair survives the semi-filter iff it would have
      // joined, and p attrs are functionally dependent on l_partkey.
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(part.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .distinct()
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // Q17 small-quantity revenue: lines under 20% of their part's average
    // quantity, for one brand. The correlated-average shape; the cut is
    // cross-multiplied in integer cents (5 * qty_c * n < sum_qty_c) so
    // both engines decide every boundary row identically.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_brand") === "Brand#1")
        .select("p_partkey")
      val li = t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      val avgQ = li.groupBy(col("l_partkey").as("ak"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"),
          count(lit(1)).as("n_lines"))
      li.join(broadcast(avgQ), col("l_partkey") === col("ak"))
        .filter(cents(col("l_quantity")) * col("n_lines") * 5 < col("sum_qty_c"))
        .agg(expr("sum(CAST(floor(l_extendedprice*100) AS BIGINT)) div 7").as("avg_yearly_c"),
          count(lit(1)).as("n_small"))
    }),

    // Q18 large-volume customers: orders whose total quantity exceeds the
    // threshold — groupBy-HAVING then join back to the order/customer.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          cents(col("o_totalprice")).as("o_totalprice_c"), col("sum_qty"))
        .orderBy(col("o_totalprice_c").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q19 bracketed revenue: disjunctive (brand, size, quantity) brackets
    // — the OR-of-conjunctions predicate that exercises the optimizer's
    // predicate normalization across a broadcast join.
    "q19_bracket_revenue" -> ((s, dir) => {
      val part = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
            && col("l_quantity").between(20, 30)))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_lines"))
    }),

    // Q20 (adapted: "has excess availability" -> shipped more than 40
    // units of some 'b'-part): suppliers qualifying via a semi-join on an
    // aggregated subquery, listed with their nation.
    "q20_excess_suppliers" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_name").startsWith("b"))
        .select("p_partkey")
      val qualifying = t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(floor(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 40)
        .select(col("l_suppkey")).distinct()
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
      t(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    }),

    // Q21 (adapted: no receipt/commit dates -> "the order's latest-shipping
    // line belongs to this supplier" and the order has other suppliers):
    // the multi-correlation shape — window max over the order, an exists
    // (other supplier) via conditional count, per-supplier tally.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey")
      val li = t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = li
        .withColumn("max_ship", max(col("l_shipdate")).over(w))
        .withColumn("n_supps", size(collect_set(col("l_suppkey")).over(w)))
        .filter(col("l_shipdate") === col("max_ship") && col("n_supps") > 1)
        .select("l_orderkey", "l_suppkey").distinct()
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_name")
      flagged.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(25)
    }),

    // Full outer join: per-nation demand vs supply where each side is
    // filtered so some nations exist on only one side — both
    // null-extension directions exercised, sentinel-coalesced for
    // engine-exact hashing.
    "q_outer_nation_balance" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE" && col("c_acctbal") > 9500)
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("cust_bal_c"))
      val supp = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 7500)
        .groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"), sum(cents(col("s_acctbal"))).as("supp_bal_c"))
      cust.join(supp, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("cust_bal_c"), lit(0L)).as("cust_bal_c"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("supp_bal_c"), lit(0L)).as("supp_bal_c"))
        .orderBy(col("nationkey"))
    }),

    // Bounded sliding window frame: 4-order moving sum per customer
    // (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) in integer cents, with
    // the frame row count so the moving average stays integer-exact.
    "q_moving_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 150)
        .withColumn("price_c", cents(col("o_totalprice")))
        .withColumn("mov_sum_c", sum(col("price_c")).over(w))
        .withColumn("mov_n", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("price_c"),
          col("mov_sum_c"), col("mov_n"),
          expr("mov_sum_c div mov_n").as("mov_avg_c"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Bloom semi-join reduction: the urgent-orders⋈lineitem join with the
    // fact side pruned by a Bloom filter over the filtered order keys
    // BEFORE the join shuffle (~1/5 selectivity here; at 100 TB the
    // shuffle shrinks by the same factor while the result stays
    // bit-identical to the plain join — FPs die in the exact join, FNs
    // are impossible). Oracle: the plain join.
    "q_bloom_join" -> ((s, dir) => {
      val dim = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val fact = t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // expectedKeys is a sizing hint, not a correctness input; a cheap
      // count of the already-filtered dim keeps the filter right-sized
      val expected = dim.count()
      graft.operators.BloomJoin
        .join(fact, dim, "l_orderkey", "o_orderkey", expected, fpp = 0.01)
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue_c"))
        .orderBy(col("o_year"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q2_best_supplier" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |cand AS (
        |  SELECT p_partkey, p_name, s_name, n_name,
        |    CAST(floor(s_acctbal*100) AS BIGINT) AS s_acctbal_c
        |  FROM pairs
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size >= 30 AND p_type LIKE '%D' AND r_name = 'EUROPE')
        |SELECT p_partkey, p_name, s_name, n_name, s_acctbal_c
        |FROM cand
        |WHERE s_acctbal_c = (SELECT max(s_acctbal_c) FROM cand c2
        |                     WHERE c2.p_partkey = cand.p_partkey)
        |ORDER BY s_acctbal_c DESC, p_partkey, s_name
        |LIMIT 50""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(floor(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(CASE WHEN n1.n_name = 'NATION_9'
        |   THEN CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS brazil_c,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_c,
        | CAST(sum(CASE WHEN n1.n_name = 'NATION_9'
        |   THEN CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |   / CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA' AND p_type LIKE 'STANDARD%'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-06-01' AND o_orderdate < TIMESTAMP '1997-12-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_c DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q11_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_9'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value_c FROM v
        |WHERE value_c * 1000 > (SELECT sum(value_c) FROM v)
        |ORDER BY value_c DESC, l_partkey""".stripMargin,

    "q12_late_shipments" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_revenue_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_c
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_part_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_size IN (5, 10, 15, 20, 25, 30)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'),
        |a AS (
        |  SELECT l_partkey AS ak,
        |    CAST(sum(CAST(floor(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |    count(*) AS n_lines
        |  FROM li GROUP BY l_partkey)
        |SELECT
        | CAST(CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) // 7 AS BIGINT) AS avg_yearly_c,
        | count(*) AS n_small
        |FROM li JOIN a ON l_partkey = ak
        |WHERE CAST(floor(l_quantity*100) AS BIGINT) * n_lines * 5 < sum_qty_c""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 300)
        |SELECT c_custkey, c_name, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        | CAST(floor(o_totalprice*100) AS BIGINT) AS o_totalprice_c, sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice_c DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_bracket_revenue" ->
      """SELECT
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH q AS (
        |  SELECT DISTINCT l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'b%'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 40)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM q)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |flagged AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM (
        |    SELECT l_orderkey, l_suppkey, l_shipdate,
        |      max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
        |      count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supps
        |    FROM li) x
        |  WHERE l_shipdate = max_ship AND n_supps > 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM flagged JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 25""".stripMargin,

    "q_outer_nation_balance" ->
      """WITH c AS (SELECT c_nationkey AS nk_c, count(*) AS n_cust,
        |  CAST(sum(CAST(floor(c_acctbal*100) AS BIGINT)) AS BIGINT) AS cust_bal_c
        |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9500
        |  GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk_s, count(*) AS n_supp,
        |  CAST(sum(CAST(floor(s_acctbal*100) AS BIGINT)) AS BIGINT) AS supp_bal_c
        |  FROM supplier WHERE s_acctbal > 7500 GROUP BY 1)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(cust_bal_c, 0) AS cust_bal_c,
        |  coalesce(n_supp, 0) AS n_supp, coalesce(supp_bal_c, 0) AS supp_bal_c
        |FROM c FULL OUTER JOIN s ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,

    "q_moving_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(o_totalprice*100) AS BIGINT) AS price_c,
        |  CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_c,
        |  count(*) OVER w AS mov_n,
        |  CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) OVER w
        |       // count(*) OVER w AS BIGINT) AS mov_avg_c
        |FROM orders WHERE o_custkey <= 150
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_bloom_join" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n_items,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
