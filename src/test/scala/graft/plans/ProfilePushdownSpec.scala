package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Executed-plan gate for the footer-statistics profile
  * (profile_stats_pushdown): the COUNT/MIN/MAX aggregate must be
  * answered by the parquet scan itself (`PushedAggregation`), not by
  * reading data pages — the property that makes a 100 TB table profile
  * cost one footer read per file. Also pins the config-isolation claim:
  * the cloned DSv2 session must leave the calling session's v1 routing
  * untouched.
  */
class ProfilePushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("COUNT/MIN/MAX are pushed to the parquet footer scan") {
    val df = graft.queries.Profile.statsPushdown(spark, dir)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("PushedAggregation: [COUNT(*)"), p.take(2000))
    assert(p.contains("MIN(l_quantity)") && p.contains("MAX(l_extendedprice)"), p.take(2000))
    // the scan's output schema is the aggregate columns, not table rows
    assert(p.contains("ReadSchema: struct<count(*):bigint"), p.take(2000))
  }

  test("pushed aggregate equals the v1 data-page aggregate bit-for-bit") {
    val pushed = graft.queries.Profile.statsPushdown(spark, dir).head
    val v1 = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(count(lit(1)), min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice")),
        min(col("l_orderkey")), max(col("l_orderkey"))).head
    assert(pushed == v1)
  }

  test("per-day layout stats push both the aggregate and the partition-column group-by") {
    val df = graft.pipeline.Layout.dayStatsPushdown(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("PushedAggregation: [COUNT(*)"), p.take(2000))
    assert(p.contains("PushedGroupBy: [day]"), p.take(2000))
    // grouped footer stats equal the data-page aggregate over the layout
    val viaData = graft.pipeline.Layout.timePartitionedEvents(spark, dir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("day").cast("long").as("day"), col("n"),
        col("min_value"), col("max_value"))
      .orderBy("day")
    assert(df.collect().toSeq == viaData.collect().toSeq)
  }

  test("variant layout: the typed field extraction pushes into the scan") {
    val df = graft.pipeline.Layout.variantExtract(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("PushedVariantExtractions"), p.take(2000))
    // the extraction is pushed at STRING type (the long cast happens
    // post-scan so non-integral values degrade like the string baseline)
    assert(p.contains("$.k") && p.contains("StringType"), p.take(2000))
    // variant-path results equal the string-JSON parse path (q13's
    // expression) over the original table
    val viaString = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("k_cnt"),
        coalesce(sum(col("k")), lit(0L)).as("k_sum"),
        coalesce(max(col("k")), lit(0L)).as("k_max"))
      .orderBy("event_type")
    assert(df.collect().toSeq == viaString.collect().toSeq)
  }

  test("variant layout degrades malformed props to NULL like the string baseline") {
    // one well-formed row, one broken-JSON row, one non-long k: the job
    // must complete and count only the well-formed long (the
    // try_parse_json/try_variant_get contract the scaladoc claims)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("variant_bad_").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 1L, 1L, "click", 1.0, """{"k": 7}"""),
        Row(2L, 2L, 1L, "click", 1.0, """{broken"""),
        Row(3L, 3L, 1L, "click", 1.0, """{"k": "abc"}"""),
        Row(4L, 4L, 1L, "click", 1.0, """{"k": 7.5}"""),
        Row(5L, 5L, 1L, "click", 1.0, """{"k": true}""")),
      schema).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = graft.pipeline.Layout.variantExtract(spark, tmp).collect()
    assert(rows.length == 1)
    val r = rows(0)
    // non-integral (7.5) and boolean (true) k must NOT be numerically
    // coerced (a 'long'-typed variant extraction would yield 7 and 1 —
    // numbers the string baseline and the DuckDB oracle can never
    // produce): they degrade to NULL, so only the integral 7 counts,
    // and the job completes despite the broken/ill-typed rows (the
    // ANSI string baseline would fail the whole job on them)
    assert(r.getString(0) == "click" && r.getLong(1) == 1L && r.getLong(2) == 7L && r.getLong(3) == 7L,
      r.toString)
  }

  test("the cloned session leaves the calling session's v1 routing untouched") {
    val before = spark.conf.get("spark.sql.sources.useV1SourceList")
    graft.queries.Profile.statsPushdown(spark, dir).collect()
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") == before)
    assert(before.contains("parquet"), s"v1 default expected to cover parquet: $before")
    // and the normal load path still plans as a v1 FileScan
    val v1Plan = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey").queryExecution.executedPlan.toString
    assert(v1Plan.contains("FileScan parquet"), v1Plan.take(1000))
  }
}
