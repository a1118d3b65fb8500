package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}

/** Relational baseline queries over the TPC-H-ish testdata. These exercise
  * the engine plumbing Catalyst gives us for free (pushdown, broadcast
  * joins, partial aggregation) and anchor the BENCH numbers.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. Map-side partial aggregation; sums are
    * integer cents so the oracle hash-matches bit-exactly.
    */
  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
        sum(round(col("l_discount") * 100).cast("long")).as("sum_disc_c"),
        count(lit(1)).as("cnt"))
      .withColumn("avg_qty", round(col("sum_qty_c") / col("cnt") / 100.0, 6))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
      |  COUNT(*) AS cnt,
      |  ROUND(CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) / COUNT(*) / 100.0, 6) AS avg_qty
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Revenue per nation: customer ⋈ orders ⋈ nation. Only `nation` (25
    * rows, fixed) is broadcast; `customer` grows with the fact tables
    * (~15M rows at sf100) so a forced broadcast would OOM at scale — AQE
    * picks the right strategy for the orders⋈customer join per run.
    */
  private def q2Join(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val n = Tables.load(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_c"),
        count(lit(1)).as("order_cnt"))
      .orderBy(desc("revenue_c"), col("n_name"))
  }

  private val q2Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
      |  COUNT(*) AS order_cnt
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY revenue_c DESC, n_name""".stripMargin

  /** Top-3 orders per customer (SURVEY §2.7 O2: bounded per-group top-k).
    * Window rank + filter; Spark plans this as a single shuffle on the
    * partition key with no global sort.
    */
  private def q3TopK(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  private val q3Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // --- round 6: the everyday relational shapes (outer/semi/anti joins,
  // rollup/grouping sets, windowed fact aggregates). Each is declarative
  // DataFrame code so Catalyst keeps pushdown/pruning/partial-agg; plan
  // shape (broadcast vs shuffle, semi/anti) is asserted in
  // RelationalPlanSpec on the EXECUTED plan, not assumed.

  /** Per-customer order counts via LEFT OUTER join — customers without a
    * matching order keep a row (cnt 0, spend 0). One shuffle on the join
    * key; the groupBy reuses the customer side's hash partitioning.
    */
  private def q3OuterCounts(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_mktsegment"))
      .agg(
        count(o("o_orderkey")).as("order_cnt"),
        coalesce(sum(round(o("o_totalprice") * 100).cast("long")), lit(0L)).as("spend_c"))
      .orderBy("c_custkey")
  }

  private val q3OuterSql =
    """SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS order_cnt,
      |  COALESCE(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT), 0) AS spend_c
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin

  /** Customers holding at least one finished ('F') order — LEFT SEMI join,
    * which Spark executes without materializing the probe side's payload
    * (no duplicate-explosion, no post-join dedup shuffle).
    */
  private def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(
        col("c_custkey"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
      .orderBy("c_custkey")
  }

  private val q4Sql =
    """SELECT c_custkey, c_name, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Customers with NO finished order — LEFT ANTI join (NOT EXISTS). */
  private def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
      .orderBy("c_custkey")
  }

  private val q5Sql =
    """SELECT c_custkey, c_mktsegment, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Revenue ROLLUP over (nation, order priority): detail rows, per-nation
    * subtotals, and the grand total in one pass (Spark expands the rollup
    * into a single Expand + hash-aggregate — no re-scan per level). The
    * grouping id is built from single-column GROUPING() bits so the bit
    * order is engine-independent; NULL group keys are coalesced to a
    * sentinel so the hash never depends on engine NULL ordering.
    */
  private def q6Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val n = Tables.load(s, dir, "nation")
    val base = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"), col("o_orderpriority"), col("o_totalprice"))
    // The DF-API `.rollup` over a join-derived frame trips Spark 4.1's
    // ambiguous-self-join detector (the Expand duplicates the grouping
    // attributes); routing the rollup through SQL resolves purely by
    // name and plans the identical Expand + hash-aggregate. View name is
    // keyed by the MD5 of the fixture dir (Names.pathKey — same scheme
    // as the Warehouse subpaths) so concurrent sessions over different
    // fixtures can never collide and swap each other's base.
    val view = "graft_q6_base_" + graft.util.Names.pathKey(dir)
    base.createOrReplaceTempView(view)
    s.sql(
      s"""SELECT COALESCE(n_name, '(all)') AS nation,
         |  COALESCE(o_orderpriority, '(all)') AS priority,
         |  CAST(grouping_id() AS BIGINT) AS gid,
         |  SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS revenue_c,
         |  COUNT(*) AS order_cnt
         |FROM $view
         |GROUP BY ROLLUP (n_name, o_orderpriority)
         |ORDER BY gid, nation, priority""".stripMargin)
  }

  private val q6Sql =
    """SELECT COALESCE(n_name, '(all)') AS nation,
      |  COALESCE(o_orderpriority, '(all)') AS priority,
      |  CAST(GROUPING(n_name)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
      |  COUNT(*) AS order_cnt
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, o_orderpriority)
      |ORDER BY gid, nation, priority""".stripMargin

  /** GROUPING SETS over lineitem: ((flag,status), (flag), ()) — the
    * asymmetric-subtotal shape ROLLUP can't express. Uses the Dataset
    * groupingSets API (Spark 4) so the whole thing stays one Expand +
    * aggregate.
    */
  private def q7GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    l.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping("l_returnflag") * 2 + grouping("l_linestatus")).cast("long").as("gid"),
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("gid"), col("sum_qty_c"), col("cnt"))
      .orderBy("gid", "flag", "status")
  }

  private val q7Sql =
    """SELECT COALESCE(l_returnflag, '(all)') AS flag,
      |  COALESCE(l_linestatus, '(all)') AS status,
      |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, flag, status""".stripMargin

  /** Running (cumulative) per-order aggregates over lineitem: running
    * quantity sum and previous line's price. The testdata's
    * (l_orderkey, l_linenumber) is NOT unique — only the full
    * (orderkey, linenumber, partkey, suppkey) is — so the window orders
    * by the complete unique key and the frame is pinned to ROWS; any
    * shorter ordering would make the cumulation tie-order-dependent.
    */
  private def q8WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val ord = Seq("l_linenumber", "l_partkey", "l_suppkey")
    val w = Window.partitionBy("l_orderkey").orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        sum(round(col("l_quantity") * 100).cast("long")).over(w).as("run_qty_c"),
        coalesce(
          lag(round(col("l_extendedprice") * 100).cast("long"), 1)
            .over(Window.partitionBy("l_orderkey").orderBy(ord.map(col): _*)),
          lit(0L)).as("prev_price_c"))
      .orderBy(col("l_orderkey") +: ord.map(col): _*)
  }

  private val q8Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) OVER
      |    (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_qty_c,
      |  COALESCE(CAST(LAG(CAST(ROUND(l_extendedprice*100) AS BIGINT), 1) OVER
      |    (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS BIGINT), 0)
      |    AS prev_price_c
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Frame-bounded moving window per supplier: 3-row moving price sum and
    * row count over the supplier's lines in (orderkey, linenumber) order —
    * the composite key is unique within a supplier so the frame is
    * deterministic across engines.
    */
  private def q9MovingWindow(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    // (orderkey, linenumber, partkey) is unique WITHIN a suppkey (the full
    // 4-col key is the table's unique key), so the frame is deterministic
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
      .rowsBetween(-2, Window.currentRow)
    l.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        sum(round(col("l_extendedprice") * 100).cast("long")).over(w).as("mov_price_c"),
        count(lit(1)).over(w).as("mov_cnt"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
  }

  private val q9Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) OVER
      |    (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_partkey
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_price_c,
      |  COUNT(*) OVER
      |    (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_partkey
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_cnt
      |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""".stripMargin

  /** Orders priced above their priority class's average — the correlated-
    * aggregate filter shape, decorrelated to one window pass. The
    * comparison is the integer cross-multiply `price·cnt > sum` so no
    * engine ever divides: bit-exact by construction.
    */
  private def q10OverAvg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_orderpriority")
    o.withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("sum_c", sum(col("price_c")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("price_c") * col("cnt") > col("sum_c"))
      .select("o_orderkey", "o_orderpriority", "price_c")
      .orderBy("o_orderkey")
  }

  private val q10Sql =
    """SELECT o_orderkey, o_orderpriority, price_c FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER
      |      (PARTITION BY o_orderpriority) AS BIGINT) AS sum_c,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
      |  FROM orders) t
      |WHERE price_c * cnt > sum_c ORDER BY o_orderkey""".stripMargin

  /** Set operations: customers with BOTH a finished and an open order,
    * minus those holding any pending one — INTERSECT and EXCEPT with
    * their standard bag-to-set (distinct) semantics, planned by Spark
    * as joins (LeftSemi for intersect, LeftAnti for except) rather than
    * materialized distinct sets.
    */
  private def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    def custsWith(status: String): DataFrame =
      o.filter(col("o_orderstatus") === status).select(col("o_custkey").as("c_custkey"))
    custsWith("F").intersect(custsWith("O")).except(custsWith("P"))
      .orderBy("c_custkey")
  }

  private val q11Sql =
    """SELECT c_custkey FROM (
      |  (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      |   INTERSECT
      |   SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
      |  EXCEPT
      |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
      |) ORDER BY c_custkey""".stripMargin

  /** Date functions + a window over an aggregate: monthly revenue with
    * a running cumulative total. The month strings format identically
    * in both engines (the UTC session pins the parquet timestamps'
    * rendering to DuckDB's naive formatting — the EventJoins rule); the
    * unpartitioned cumulative window runs AFTER aggregation, over a
    * calendar-bounded (model-sized) frame, so the single-partition
    * window is not a scale hazard.
    */
  private def q12MonthlyRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val w = Window.orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_c"),
        count(lit(1)).as("order_cnt"))
      .withColumn("cum_revenue_c", sum(col("revenue_c")).over(w))
      .orderBy("month")
  }

  private val q12Sql =
    """SELECT month, revenue_c, order_cnt,
      |  CAST(SUM(revenue_c) OVER (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_revenue_c
      |FROM (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
      |    COUNT(*) AS order_cnt
      |  FROM orders GROUP BY 1)
      |ORDER BY month""".stripMargin

  /** JSON scalar extraction over the events stream: per event type,
    * count and sum of the `k` field inside the JSON `props` column —
    * the semi-structured column shape every event pipeline carries.
    * `get_json_object` is a codegen'd Catalyst expression (one shared
    * parse per row), not a UDF.
    */
  private def q13JsonExtract(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("k_cnt"),
        coalesce(sum(col("k")), lit(0L)).as("k_sum"),
        coalesce(max(col("k")), lit(0L)).as("k_max"))
      .orderBy("event_type")
  }

  // shared with layout_variant_extract: both layouts answer the SAME
  // question, so they must verify against the SAME oracle text
  private[graft] val q13Sql =
    """SELECT event_type,
      |  COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_cnt,
      |  COALESCE(CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT), 0) AS k_sum,
      |  COALESCE(CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT), 0) AS k_max
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Correlated scalar subquery — written as the user writes it; the
    * proof is that Catalyst DECORRELATES it (one aggregate + one join
    * in the executed plan, never a per-row subquery loop —
    * RelationalPlanSpec). COALESCE pins the no-orders NULL to 0 in both
    * engines.
    */
  private def q14ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val sfx = graft.util.Names.pathKey(dir)
    Tables.load(s, dir, "customer").createOrReplaceTempView(s"graft_q14_customer_$sfx")
    Tables.load(s, dir, "orders").createOrReplaceTempView(s"graft_q14_orders_$sfx")
    s.sql(
      s"""SELECT c_custkey,
         |  COALESCE((SELECT MAX(CAST(ROUND(o_totalprice*100) AS BIGINT))
         |            FROM graft_q14_orders_$sfx o
         |            WHERE o.o_custkey = c.c_custkey), 0) AS max_price_c
         |FROM graft_q14_customer_$sfx c
         |ORDER BY c_custkey""".stripMargin)
  }

  private val q14Sql =
    """SELECT c_custkey,
      |  COALESCE((SELECT MAX(CAST(ROUND(o_totalprice*100) AS BIGINT))
      |            FROM orders o WHERE o.o_custkey = c.c_custkey), 0) AS max_price_c
      |FROM customer c ORDER BY c_custkey""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q1_agg" -> QueryDef.sql(q1Agg, q1Sql, "TPC-H Q1-style pricing summary"),
    "q2_join_revenue" -> QueryDef.sql(q2Join, q2Sql, "broadcast dim joins + fact aggregate"),
    "o2_topk_per_group" -> QueryDef.sql(q3TopK, q3Sql, "per-group bounded top-k (SortedListMap analogue)"),
    "q3_outer_counts" -> QueryDef.sql(q3OuterCounts, q3OuterSql, "left outer join + null-preserving counts"),
    "q4_semi_join" -> QueryDef.sql(q4SemiJoin, q4Sql, "left semi join (EXISTS)"),
    "q5_anti_join" -> QueryDef.sql(q5AntiJoin, q5Sql, "left anti join (NOT EXISTS)"),
    "q6_rollup" -> QueryDef.sql(q6Rollup, q6Sql, "ROLLUP subtotals with engine-independent grouping id"),
    "q7_grouping_sets" -> QueryDef.sql(q7GroupingSets, q7Sql, "asymmetric GROUPING SETS"),
    "q8_window_running" -> QueryDef.sql(q8WindowRunning, q8Sql, "running sum + lag per order"),
    "q9_moving_window" -> QueryDef.sql(q9MovingWindow, q9Sql, "frame-bounded moving aggregate per supplier"),
    "q10_over_avg" -> QueryDef.sql(q10OverAvg, q10Sql, "decorrelated above-group-average filter"),
    "q11_setops" -> QueryDef.sql(q11SetOps, q11Sql, "INTERSECT/EXCEPT with distinct set semantics"),
    "q12_monthly_revenue" -> QueryDef.sql(q12MonthlyRevenue, q12Sql,
      "date functions + cumulative window over a monthly aggregate"),
    "q13_json_extract" -> QueryDef.sql(q13JsonExtract, q13Sql,
      "JSON scalar extraction + aggregate over the events props column"),
    "q14_scalar_subquery" -> QueryDef.sql(q14ScalarSubquery, q14Sql,
      "correlated scalar subquery, decorrelated to one aggregate + join"))
}
