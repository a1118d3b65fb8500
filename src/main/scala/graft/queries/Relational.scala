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

  val defs: Map[String, QueryDef] = Map(
    "q1_agg" -> QueryDef.sql(q1Agg, q1Sql, "TPC-H Q1-style pricing summary"),
    "q2_join_revenue" -> QueryDef.sql(q2Join, q2Sql, "broadcast dim joins + fact aggregate"),
    "o2_topk_per_group" -> QueryDef.sql(q3TopK, q3Sql, "per-group bounded top-k (SortedListMap analogue)"))
}
