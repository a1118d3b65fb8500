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
