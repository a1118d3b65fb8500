package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter runtime filtering — DPP's sibling for joins on
  * NON-partition keys: when a shuffle join's one side carries a
  * selective filter, Spark's InjectRuntimeFilter builds a bloom filter
  * over that side's join keys and applies `might_contain` on the OTHER
  * side's scan, so most of the big side's rows drop before the
  * exchange. At 100 TB this is the mechanism that saves a fact⋈fact
  * join when the pruning key is not the partition column (where DPP —
  * LayoutSpec's gate — cannot help).
  *
  * The production thresholds (10 GB application-side scan) can't be
  * met by a fixture, so the spec scopes them down — the gate pins that
  * the ENGINE'S QUERY SHAPES are eligible for injection (equi-join,
  * selective creation side, no broadcast) and that results are
  * unchanged under the filter, not the threshold tuning itself.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom runtime filter on the fact scan") {
    val docs = graft.util.Tables.load(spark, dir, "documents")
    val embs = graft.util.Tables.load(spark, dir, "embeddings")
    def joined = {
      val small = embs.select(col("vec_id"), col("label")).filter(col("vec_id") <= 50L)
      docs.select("doc_id", "lang")
        .join(small, col("doc_id") === col("vec_id"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang")
    }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join shape
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB") {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom runtime filter on the application side:\n$plan")
      // the filter is a pure reducer: results equal the unfiltered plan
      val got = joined.collect().toSeq
      val expect = {
        val small = embs.select(col("vec_id"), col("label")).filter(col("vec_id") <= 50L)
        docs.select("doc_id", "lang")
          .join(small.hint("broadcast"), col("doc_id") === col("vec_id"))
          .groupBy("lang").agg(count(lit(1)).as("n"))
          .orderBy("lang").collect().toSeq
      }
      assert(got == expect)
    }
  }
}
