package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executable proof of the engine's skew story: fact⋈fact joins rely on
  * AQE's runtime skew-join splitting (OptimizeSkewedJoin) rather than
  * manual salting — a skewed shuffle partition is split into
  * sub-partitions at runtime and the executed plan says so. The spec
  * pins that this actually fires under this Spark version and our
  * session shape, so "AQE handles skew" stays a tested property, not a
  * doc claim. (Where a join is known-degenerate by construction the
  * engine avoids the shuffle entirely — bounded-vocabulary join keys in
  * j1, broadcast dims, bucketed layouts; this gate covers the residual
  * case: an unforeseen hot key at run time.)
  *
  * Uses its OWN session (like ExtensionsSpec): the skew thresholds must
  * be tiny to trigger at test scale, and tuning the shared session's
  * confs would race other suites' plan assertions.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val shared = graft.SparkSpec.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-skew-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so a ~200k-row hot key is "skewed" at test scale
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  test("AQE splits the hot key's shuffle partition at runtime") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // left: 95% of rows share key 0 (the hot key), tail uniform
    val left = spark.range(0, 200000)
      .select(when(col("id") < 190000, 0L).otherwise(col("id") % 64).as("k"),
        col("id").as("v"))
    val right = spark.range(0, 64).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k")
    // execute THIS dataset's own QueryExecution (agg/write would be new ones)
    joined.collect()
    val total = joined.agg(sum(col("v") + col("w"))).head.getLong(0)
    // correctness first: the join result is what a skew-free plan gives
    val expect = spark.range(0, 200000)
      .select(when(col("id") < 190000, 0L).otherwise(col("id") % 64).as("k"), col("id").as("v"))
      .withColumn("w", col("k") * 2)
      .agg(sum(col("v") + col("w"))).head.getLong(0)
    assert(total == expect)
    val plan = joined.queryExecution.executedPlan.toString
    // OptimizeSkewedJoin marks both: the join prints the skew flag and
    // the shuffle read shows the split
    assert(plan.contains("isSkew=true") || plan.contains("skewed"),
      s"expected AQE skew-join markers in:\n${plan.take(3000)}")
  }
}
