package graft.pipeline

import graft.SparkSpec

/** The point of the bucketed layout is the PLAN: with auto-broadcast
  * off (forcing the sort-merge path a fact⋈fact join takes at scale),
  * the join over the bucketed tables must contain no Exchange — both
  * sides read co-located buckets. A plain parquet join under the same
  * settings shuffles both sides; asserting its Exchanges keeps the
  * assertion honest (same query, only the layout differs).
  */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("join over bucketed tables is exchange-free; over plain parquet it is not") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bucketed = planOf(Layout.colocatedJoin(spark, dir))
      assert(bucketed.contains("SortMergeJoin"), s"expected SMJ:\n$bucketed")
      assert(!bucketed.contains("Exchange"), s"bucketed join must not shuffle:\n$bucketed")

      val d = graft.util.Tables.load(spark, dir, "documents")
      val e = graft.util.Tables.load(spark, dir, "embeddings")
      val plain = planOf(d.join(e, d("doc_id") === e("vec_id")))
      assert(plain.contains("Exchange"), s"plain parquet join should shuffle:\n$plain")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("time-partitioned layout: the day range prunes at the scan and matches the plain rollup") {
    import org.apache.spark.sql.functions._
    val ev = Layout.timePartitionedEvents(spark, dir)
    val d0 = ev.agg(min("day")).head.getLong(0)
    val pruned = Layout.prunedRollup(ev, d0)
    // the pre-adaptive physical plan exposes the scan node directly
    // (AQE wraps it in query stages in executedPlan)
    val scan = pruned.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, s"no partition filters on the scan:\n$scan")
    assert(scan.partitionFilters.mkString.contains("day"),
      s"day predicate must reach the scan as a partition filter: ${scan.partitionFilters}")

    // and the result equals the same rollup computed without the layout
    val plain = graft.util.Tables.load(spark, dir, "events")
      .withColumn("tsus", unix_micros(col("ts").cast("timestamp")))
      .withColumn("day", call_function("div", col("tsus"), lit(86400000000L)))
    val expect = Layout.prunedRollup(plain, d0).collect().toSeq
    assert(pruned.collect().toSeq == expect)
  }

  test("dpp: a runtime-known dim filter prunes fact partitions dynamically") {
    import org.apache.spark.sql.functions._
    val df = Layout.dppJoin(spark, dir)
    // the fact scan must carry a DynamicPruning partition filter on day
    // (sparkPlan = post-strategy, pre-AQE — scans visible directly)
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    val factScan = scans.find(_.partitionFilters.nonEmpty)
    assert(factScan.isDefined, s"no partition-filtered scan:\n${df.queryExecution.sparkPlan}")
    val dpp = factScan.get.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(dpp, s"expected a DynamicPruning partition filter on the fact scan: " +
      s"${factScan.get.partitionFilters}")

    // executed plan: the pruning subquery REUSES the join's broadcast
    // (SubqueryBroadcast / ReusedExchange), not a second dim scan job
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    assert(ep.toLowerCase.contains("dynamicpruning"), s"executed plan lost DPP:\n$ep")
    assert(ep.contains("SubqueryBroadcast"), s"DPP should reuse the broadcast:\n$ep")

    // and the result equals the same join computed without any layout
    val ev = graft.util.Tables.load(spark, dir, "events")
      .withColumn("tsus", unix_micros(col("ts").cast("timestamp")))
      .withColumn("day", call_function("div", col("tsus"), lit(86400000000L)))
    val expect = ev.filter(pmod(col("day"), lit(7L)) === 3L)
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy("day", "event_type").collect().toSeq
    assert(df.collect().toSeq == expect)
  }

  test("bucketed-join rollup equals the plain-layout rollup") {
    import org.apache.spark.sql.functions._
    val viaBuckets = graft.SparkEntry.queries("layout_bucketed_join")(spark, dir).collect()
    val d = graft.util.Tables.load(spark, dir, "documents")
    val e = graft.util.Tables.load(spark, dir, "embeddings")
    val plain = d.join(e, d("doc_id") === e("vec_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        sum(col("label").cast("long")).as("sum_label"))
      .orderBy("lang").collect()
    assert(viaBuckets.toSeq == plain.toSeq)
  }
}
