package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}

/** Data profiling: exact per-group value percentiles — the corpus
  * inspection step before thresholding decisions (quality cutoffs,
  * outlier fences). Exact positional percentiles over integer cents
  * (the events value convention): p_q = the value at rank
  * ⌈q·n/100⌉ in (cents ASC) order — deterministic even under row-order
  * ties because only the VALUE at the rank is emitted, and cents at a
  * tied rank are equal by construction. Approximate sketches
  * (GK/t-digest) are order-dependent and not engine-portable; the
  * exact form costs ONE sort-shuffle per group set, which IS the
  * distributed exact-quantile lower bound.
  */
object Profile {

  private val Quantiles = Seq(25, 50, 75, 95)

  private[queries] def percentilesOf(ev: DataFrame): DataFrame = {
    val base = ev.select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val byType = Window.partitionBy("event_type").orderBy("cents")
    val cnt = base.groupBy("event_type").agg(count(lit(1)).as("n"))
    val ranked = base.withColumn("rn", row_number().over(byType))
      .join(cnt, "event_type")
    val qCols = Quantiles.map { q =>
      // ceil(q·n/100) in integers: (q·n + 99) div 100
      val r = call_function("div", lit(q.toLong) * col("n") + 99L, lit(100L))
      min(when(col("rn") === r, col("cents"))).as(s"p$q")
    }
    ranked.groupBy("event_type")
      .agg(min("cents").as("min_cents"),
        (qCols :+ max(col("cents")).as("max_cents") :+ first(col("n")).as("n")): _*)
      .select(col("event_type"), col("n"), col("min_cents"),
        col("p25"), col("p50"), col("p75"), col("p95"), col("max_cents"))
      .orderBy("event_type")
  }

  private def percentiles(s: SparkSession, dir: String): DataFrame =
    percentilesOf(Tables.load(s, dir, "events"))

  private val pctSql = {
    val qSelects = Quantiles.map { q =>
      s"MIN(CASE WHEN rn = ($q * n + 99) // 100 THEN cents END) AS p$q"
    }.mkString(",\n      |  ")
    s"""WITH base AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
      |), cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1
      |), ranked AS (
      |  SELECT b.event_type, b.cents, c.n,
      |    ROW_NUMBER() OVER (PARTITION BY b.event_type ORDER BY b.cents) AS rn
      |  FROM base b JOIN cnt c ON c.event_type = b.event_type)
      |SELECT event_type, MIN(n) AS n, MIN(cents) AS min_cents,
      |  $qSelects,
      |  MAX(cents) AS max_cents
      |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Footer-statistics table profile — the 100 TB "describe" path:
    * COUNT/MIN/MAX are computed by the parquet reader from row-group
    * footer statistics (`PushedAggregation` on the scan), so the job
    * reads NO data pages — at any table size the cost is one footer
    * read per file. DSv2 routing and aggregate pushdown are session
    * configs, so the query runs in a CLONED session: every other query
    * keeps its pinned v1 plan shapes (config isolation, not a global
    * source-list flip). ProfilePushdownSpec pins PushedAggregation on
    * the executed plan and value-equality with the v1 aggregate.
    */
  private[graft] def statsPushdown(s: SparkSession, dir: String): DataFrame = {
    graft.util.Pipelines.dsv2Session(s).read.parquet(s"$dir/lineitem.parquet")
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"))
  }

  private val pushSql =
    """SELECT COUNT(*) AS n_rows,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
      |  MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey
      |FROM lineitem""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "profile_percentiles" -> QueryDef.sql(percentiles, pctSql,
      "exact per-event-type value percentiles (p25/p50/p75/p95 at " +
        "integer-cents precision) — one sort-shuffle per group"),
    "profile_stats_pushdown" -> QueryDef.sql(statsPushdown, pushSql,
      "COUNT/MIN/MAX answered from parquet row-group footers " +
        "(DSv2 PushedAggregation) — no data pages read at any scale"))
}
