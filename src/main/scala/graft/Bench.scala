package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Failures are recorded
  * per-query (value -1, error listed) instead of silently benching a
  * broken query as fast; results are fully materialized through the
  * `noop` sink (sorts and projections included — `count()` would let
  * Spark skip them); session/codegen warmup runs before the measured
  * region.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch the tables and exercise each machinery class once —
    // scan+agg (q1), per-series UDF + broadcast-bins join + window lag
    // (a1_sfa_bags) — so the first measured query doesn't absorb
    // codegen/JIT compilation of the whole pipeline family
    Seq("q1_agg", "a1_sfa_bags").foreach { q =>
      SparkEntry.queries.get(q).foreach { fn =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    // drop warmup-built shared stages: the first MEASURED consumer of a
    // shared pipeline stage (sliding words, grid fits) pays for building
    // it; later consumers reuse it, as a real session would
    graft.util.Pipelines.clear()

    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors += s"$name: ${e.getClass.getSimpleName}"
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.map(e => "\"" + e + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
