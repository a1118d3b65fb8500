package graft.queries

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Executed-plan gates for the relational surface: the join strategies we
  * claim (broadcast for fixed-size dims, shuffle for fact⋈fact, semi/anti
  * without payload materialization) must be what Spark actually runs, and
  * the rollup/grouping-sets queries must plan as ONE Expand + aggregate —
  * not a re-scan per subtotal level.
  */
class RelationalPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect() // force AQE to finalize the real physical plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def run(name: String): DataFrame =
    Relational.defs(name).impl(spark, dir)

  test("q2: fixed-size nation dim joins as BroadcastHashJoin") {
    assert(plan(run("q2_join_revenue")).contains("BroadcastHashJoin"))
  }

  test("q1: column pruning reaches the parquet scan") {
    val p = plan(run("q1_agg"))
    // the aggregate needs 5 of lineitem's 11 columns; the scan must not
    // read the rest (ReadSchema is the projection the reader executes)
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"), p.take(2000))
    assert(!read.contains("l_orderkey") && !read.contains("l_shipdate"), read)
  }

  test("q3 outer join survives without broadcasting the fact side") {
    // force the planner's hand with a per-plan hint (NOT a session-conf
    // toggle, which would race with other suites' plan assertions under
    // parallel execution): as a shuffle join the query must produce the
    // same result — proving nothing in it depends on a fact-sized
    // broadcast
    import org.apache.spark.sql.functions._
    val c = spark.read.parquet(s"$dir/customer.parquet").hint("merge")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val joined = c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("order_cnt"))
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    // shuffle-join totals match the registered query's
    val viaHint = joined.agg(sum("order_cnt")).head.getLong(0)
    val viaQuery = run("q3_outer_counts").agg(sum("order_cnt")).head.getLong(0)
    assert(viaHint == viaQuery)
  }

  test("q4/q5: semi and anti joins plan as LeftSemi/LeftAnti (no dedup shuffle)") {
    val semi = plan(run("q4_semi_join"))
    assert(semi.contains("LeftSemi"), semi)
    // the status predicate reaches the parquet scan, not a post-scan Filter
    assert(semi.contains("EqualTo(o_orderstatus,F)"), semi)
    val anti = plan(run("q5_anti_join"))
    assert(anti.contains("LeftAnti"), anti)
    // neither needs a post-join Aggregate for dedup — the join type IS the dedup
    assert(!semi.contains("HashAggregate"), semi)
  }

  test("q11: INTERSECT/EXCEPT plan as semi/anti joins, not materialized distinct sets") {
    val p = plan(run("q11_setops"))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
  }

  test("q14: correlated scalar subquery decorrelates to one aggregate + join") {
    val p = plan(run("q14_scalar_subquery"))
    // decorrelated = an aggregate feeding an outer join; a per-row
    // subquery would show a Subquery/ScalarSubquery node in the final plan
    assert(p.contains("Join") && p.contains("HashAggregate"), p)
    assert(!p.contains("ScalarSubquery"), p)
  }

  test("q6/q7: rollup and grouping sets are one Expand + aggregate, not per-level re-scans") {
    val rollup = plan(run("q6_rollup"))
    assert(countOf(rollup, "Expand") == 1, rollup)
    // one base scan feeds the Expand: no Union of per-level aggregates
    assert(!rollup.contains("Union"), rollup)
    val gs = plan(run("q7_grouping_sets"))
    assert(countOf(gs, "Expand") == 1, gs)
    assert(!gs.contains("Union"), gs)
  }

  test("q8/q9: windowed aggregates are a single Window over one sort per window spec") {
    val p = plan(run("q8_window_running"))
    // both the running sum and the lag share one (orderkey, unique-key)
    // window spec → exactly one fused Window operator over one
    // hash-partitioning shuffle; the only other exchange is the final
    // ORDER BY's range partitioning
    assert(countOf(p, "Window [") == 1, p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)
}
