package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Statistics-driven join planning over the bucketed catalog tables —
  * DPP's sibling in the scale story: on a real deployment the catalog
  * carries `ANALYZE TABLE` statistics, and the STATIC planner (CBO),
  * not the AQE runtime fallback, should already pick the broadcast
  * side of a selectively-filtered join.
  *
  * The gate is a contrast under AQE OFF and a broadcast threshold set
  * BETWEEN the two estimates:
  *  - without column statistics, a filter does not shrink the size
  *    estimate (size-only visitor), so the filtered side stays above
  *    the threshold → sort-merge join;
  *  - after `ANALYZE ... FOR COLUMNS` with CBO enabled, the range
  *    predicate's selectivity shrinks the estimate below the
  *    threshold → the SAME query plans a BroadcastHashJoin.
  */
class CboStatsSpec extends SparkSpec {

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

  test("ANALYZE TABLE statistics flip the filtered join to broadcast under CBO") {
    val (dn, en) = Layout.bucketedTableNames(spark, dir)
    def joined = {
      val big = spark.table(dn).select("doc_id", "lang")
      val small = spark.table(en).select("vec_id", "label")
        .filter(col("vec_id") <= 50L)
      big.join(small, col("doc_id") === col("vec_id"))
    }
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "16384") {
      // no stats yet: the file-size estimate of the embeddings table is
      // far above 16 KB and a filter does not shrink it → SMJ
      val before = joined.queryExecution.executedPlan.toString
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"without stats the filtered side must not broadcast:\n$before")

      spark.sql(s"ANALYZE TABLE $en COMPUTE STATISTICS FOR COLUMNS vec_id, label")
      spark.sql(s"ANALYZE TABLE $dn COMPUTE STATISTICS")
      // CBO: selectivity of vec_id <= 50 over the column's [min, max]
      // shrinks the estimate below the threshold → static BHJ, with no
      // AQE involved (it is off) and no broadcast hint anywhere
      val after = joined.queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"catalog statistics must flip the join to broadcast:\n$after")
    }
  }
}
