package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.cents

/** The relational shell: TPC-H-shaped queries over the driver testdata.
  *
  * The reference has no relational operators (SURVEY.md §2.7) — this layer
  * is what a user of the engine gets "for free" from Spark SQL, declared
  * DataFrame-first so Catalyst does pushdown/pruning/join-selection. Scale
  * posture per query is noted inline (broadcast vs shuffle joins, partial
  * aggregation).
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style pricing summary: single scan, partial-agg-friendly (6 groups).
    // At 100 TB this is the ideal Spark shape: map-side combine reduces each
    // partition to <=6 rows before the shuffle.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(floor(col("l_quantity"))).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge_c"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q3-style shipping priority: selective dimension filters reach the
    // scans (pushdown), then join; customer is the small side -> broadcast.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-06-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-06-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"))
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"), col("revenue_c"))
        .orderBy(col("revenue_c").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Q5-style local-supplier revenue: 6-way join; region/nation/supplier/
    // customer are broadcast-size dims at any SF, lineitem x orders is the
    // one real shuffle join.
    "q5_region_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"))
        .orderBy(col("revenue_c").desc, col("n_name"))
    }),

    // Q14-style promo share: conditional aggregation; BIGINT/BIGINT division
    // yields a deterministic double in both engines.
    "q14_promo_share" -> ((s, dir) => {
      val part = t(s, dir, "part").select("p_partkey", "p_type")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-03-01"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"),
            cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).otherwise(0L)).as("promo_revenue_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("total_revenue_c"))
        .withColumn("promo_share", col("promo_revenue_c") / col("total_revenue_c"))
    }),

    // Top-3 suppliers per nation by revenue: shuffle agg + window top-k.
    "q_top_suppliers" -> ((s, dir) => {
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
      val li = t(s, dir, "lineitem")
      val rev = li.groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"))
      rev.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("n_name")).orderBy(col("revenue_c").desc, col("s_suppkey"))))
        .filter(col("rnk") <= 3)
        .select(col("n_name"), col("s_name"), col("revenue_c"), col("rnk"))
        .orderBy(col("n_name"), col("rnk"))
    }),

    // Q7-style nation volume: two nation aliases through supplier and
    // customer sides; dims broadcast, lineitem x orders the one shuffle.
    "q7_nation_volume" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("volume_c"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q22-style idle customers: scalar aggregate subquery (above-average
    // balance) + anti join (no orders). The scalar is a broadcast single
    // row; the anti join hashes on o_custkey.
    "q22_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      // the above-average cut is cross-multiplied in integer cents
      // (2-decimal balances are exact in cents): c > sum/n <=>
      // cents(c) * n > sum_c. avg() over raw doubles is partial-sum-
      // order dependent, and a strict cut exactly AT the mean could
      // flip at the last ulp between engines — the Tables.scala rule.
      val stats = cust.filter(col("c_acctbal") > 0.0)
        .agg(sum(cents(col("c_acctbal"))).as("sum_c"), count(lit(1)).as("n_pos"))
      val rich = cust.join(broadcast(stats))
        .filter(cents(col("c_acctbal")) * col("n_pos") > col("sum_c"))
      val ord = t(s, dir, "orders").select("o_custkey")
      rich.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("sum_bal_c"))
        .orderBy(col("c_nationkey"))
    }),

    // Q9-lite part profit: LIKE-filtered part dim, profit by nation/year.
    "q9_part_profit" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_name").contains("a"))
        .select("p_partkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
      val li = t(s, dir, "lineitem")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("profit_c"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // Q4-style order priority: EXISTS as a left-semi join.
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
      val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select("l_orderkey")
      ord.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q13-style customer order-count distribution: outer join + two-level agg.
    "q13_customer_distribution" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey")
      val ord = t(s, dir, "orders").filter(col("o_orderstatus") =!= "P")
        .select("o_custkey", "o_orderkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Window functions: running totals + lag per customer. Exact: the
    // running sum is over integer cents.
    "q_running_totals" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 150)
        .withColumn("price_c", cents(col("o_totalprice")))
        .withColumn("running_c", sum(col("price_c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_price_c", lag(col("price_c"), 1).over(w))
        .withColumn("seq", row_number().over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          col("price_c"), col("running_c"), col("prev_price_c"), col("seq"))
        .orderBy(col("o_custkey"), col("seq"))
    }),

    // ROLLUP: hierarchical aggregates in one pass.
    "q_rollup_returns" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(floor(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // Set operations: INTERSECT / EXCEPT (both DISTINCT semantics).
    "q_setops_customers" -> ((s, dir) => {
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 7000)
        .select(col("c_custkey").as("k"))
      val bigSpenders = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k"))
      val debt = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      val recent = t(s, dir, "orders").filter(col("o_orderdate") >= lit("2000-01-01"))
        .select(col("o_custkey").as("k"))
      rich.intersect(bigSpenders).withColumn("tag", lit("rich_big_spender"))
        .unionByName(debt.except(recent).withColumn("tag", lit("debt_inactive")))
        .select(col("tag"), col("k"))
        .orderBy(col("tag"), col("k"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        | min(l_discount) AS min_disc, max(l_discount) AS max_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_c DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_c DESC, n_name""".stripMargin,

    "q14_promo_share" ->
      """SELECT
        | CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |   THEN CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_revenue_c,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_revenue_c,
        | CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |   THEN CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |   / CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-03-01'""".stripMargin,

    "q_top_suppliers" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |   CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT n_name, s_name, revenue_c, rnk FROM (
        |  SELECT n_name, s_name, revenue_c,
        |   CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue_c DESC, s_suppkey) AS INT) AS rnk
        |  FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey) x
        |WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS volume_c,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q22_idle_customers" ->
      """SELECT c_nationkey, count(*) AS n_cust,
        | CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_c
        |FROM customer
        |WHERE CAST(floor(c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
        |      > (SELECT sum(CAST(floor(c_acctbal * 100) AS BIGINT))
        |         FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q9_part_profit" ->
      """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS profit_c
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%a%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey) x
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_running_totals" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        | CAST(floor(o_totalprice*100) AS BIGINT) AS price_c,
        | CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c,
        | lag(CAST(floor(o_totalprice*100) AS BIGINT), 1) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price_c,
        | CAST(row_number() OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
        |FROM orders WHERE o_custkey <= 150
        |ORDER BY o_custkey, seq""".stripMargin,

    "q_rollup_returns" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_setops_customers" ->
      """SELECT 'rich_big_spender' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7000
        |  INTERSECT
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000)
        |UNION ALL
        |SELECT 'debt_inactive' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY tag, k""".stripMargin
  )
}
