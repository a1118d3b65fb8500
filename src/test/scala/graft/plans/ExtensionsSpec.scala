package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[GraftExtensions]]: the native expressions must be reachable from
  * pure SQL in an extension-configured session, bit-identical to their
  * direct-expression forms, and still inside whole-stage codegen.
  *
  * Uses its OWN SparkSession (extensions bind at session build); the
  * shared SparkSpec session stays extension-free.
  */
class ExtensionsSpec extends AnyFunSuite {

  /** Extensions bind at session BUILD, and `getOrCreate` returns the
    * active/default session when one exists — so force the shared spec
    * session into existence first, clear the registries, build the
    * extension session (same SparkContext), and restore the shared one
    * as default for later suites in this JVM.
    */
  private lazy val spark: SparkSession = {
    val shared = graft.SparkSpec.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  test("sfa_word SQL function matches the native expression, in codegen") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.Bridge
    import graft.sfa.expr.SfaWordExpr

    val rows = Seq(
      (1L, Array(0.1, -0.5, 2.0, 0.0)),
      (2L, Array(-3.0, 1.5, 0.25, 9.9)),
      (3L, Array(0.0, 0.0, 0.0, 0.0))).toDF("id", "approx")
    rows.createOrReplaceTempView("approx_rows")

    val edgesSql = "array(array(-1.0D, 0.0D, 1.0D), array(0.0D), array(CAST(0.5 AS DOUBLE), 1.5D), array(-2.0D, 2.0D, 5.0D))"
    val viaSql = spark.sql(
      s"SELECT id, sfa_word(approx, $edgesSql, 2) AS word FROM approx_rows ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val edgesCol = org.apache.spark.sql.functions.expr(edgesSql)
    val viaExpr = rows.select(col("id"),
      Bridge.column(SfaWordExpr(
        Bridge.expression(col("approx")), Bridge.expression(edgesCol), 2)).as("word"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    assert(viaSql.toSeq == viaExpr.toSeq)

    // ConvertToLocalRelation pre-evaluates projections over a local
    // Seq; a range-backed plan keeps the projection at execution time
    spark.range(8).selectExpr("id", "array(CAST(id AS DOUBLE) / 4, 0.5D) AS approx")
      .createOrReplaceTempView("approx_range")
    val plan = spark.sql(
      s"SELECT sfa_word(approx, $edgesSql, 2) AS word FROM approx_range")
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix IS the whole-stage-codegen marker in the
    // compact executedPlan rendering (SfaWordExprSpec uses the same)
    assert(plan.linesIterator.exists(l => l.contains("sfa_word") && l.trim.startsWith("*(")),
      s"no codegen span in:\n$plan")
  }

  test("long_dot SQL function matches the lambda form") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (2L, Array(-7L, 0L, 2L), Array(3L, 9L, -1L))).toDF("id", "a", "b")
    rows.createOrReplaceTempView("dot_rows")

    val viaSql = spark.sql(
      "SELECT id, long_dot(a, b) AS d FROM dot_rows ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaLambda = spark.sql(
      "SELECT id, aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS d " +
        "FROM dot_rows ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaLambda.toSeq)
  }

  test("array_ed2 SQL function matches the lambda form and interpreted eval") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0, 2.5, -3.0), Array(0.5, 2.5, 1.0)),
      (2L, Array(0.0, 0.0), Array(0.0, 0.0))).toDF("id", "a", "b")
    rows.createOrReplaceTempView("ed2_rows")

    val viaSql = spark.sql(
      "SELECT id, array_ed2(a, b) AS d FROM ed2_rows ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaLambda = spark.sql(
      "SELECT id, aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x) AS d " +
        "FROM ed2_rows ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaLambda.toSeq)
    // interpreted path (nullSafeEval) agrees with codegen
    val e = graft.sfa.expr.Ed2Expr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.5, -3.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5, 2.5, 1.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == viaSql.head._2)
  }

  test("boss_dist SQL function matches the reference fold") {
    import spark.implicits._
    val rows = Seq(
      // overlap on index 0; index 2 counts (t>0) even though r=0
      (1L, Array(3L, 0L, 2L), Array(1L, 5L, 0L)),
      // no shared populated coordinate -> -1
      (2L, Array(1L, 0L), Array(0L, 7L))).toDF("id", "a", "b")
    rows.createOrReplaceTempView("boss_rows")
    val got = spark.sql("SELECT id, boss_dist(a, b) AS d FROM boss_rows ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 8L), (2L, -1L))) // (3-1)² + (2-0)² = 8
  }

  test("sfa_lb_dist SQL function matches IndexOps.lbDistance") {
    import spark.implicits._
    val bins = Array(Array(-1.0, 0.0, 1.0), Array(0.5, 1.5, 2.5))
    val rows = Seq(
      (1L, Array(0, 3), Array(2, 1), Array(0.2, 0.9)),
      (2L, Array(1, 1), Array(1, 1), Array(0.0, 0.0))).toDF("id", "w", "qw", "qa")
    rows.createOrReplaceTempView("lb_rows")
    val binsSql = "array(array(-1.0D, 0.0D, 1.0D), array(0.5D, 1.5D, 2.5D))"
    for (normed <- Seq(true, false)) {
      val got = spark.sql(
        s"SELECT id, sfa_lb_dist(w, qw, qa, $binsSql, $normed) AS lb FROM lb_rows ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = rows.collect().map { r =>
        (r.getLong(0), graft.sfa.IndexOps.lbDistance(
          r.getSeq[Int](1).toArray, r.getSeq[Int](2).toArray,
          r.getSeq[Double](3).toArray, bins, normed))
      }.toSeq.sortBy(_._1)
      assert(got == want, s"normed=$normed")
    }
  }

  test("sfa_word rejects a non-literal usedBits") {
    val err = intercept[Exception] {
      spark.sql("SELECT sfa_word(array(1.0D), array(array(0.0D)), CAST(rand() * 2 AS INT))").collect()
    }
    assert(err.getMessage.contains("sfa_word"))
  }
}
