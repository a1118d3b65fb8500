package graft.sfa

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** The fused native expression must be bit-identical to the grouped
  * packWords form on arbitrary data, including short/empty edge rows,
  * and must run inside whole-stage codegen (driven off a range scan so
  * the optimizer cannot constant-fold it away).
  */
class SfaWordExprSpec extends SparkSpec {

  private val L = 6
  private val Bits = 2

  test("fused sfa_word equals the grouped packWords form, through codegen") {
    import spark.implicits._
    // per-coefficient edges: varying lengths incl. an empty row (its
    // symbol must be 0, matching packWords' left-join miss)
    val bins: Array[Array[Double]] = Array(
      Array(-0.5, 0.1, 0.7),
      Array(0.0),
      Array(-1.0, 1.0),
      Array.empty[Double],
      Array(-0.2, 0.2, 0.9),
      Array(0.4, 0.5))

    // deterministic pseudo-random approx arrays, materialized through
    // parquet: the transform() builder is a higher-order function that
    // would otherwise collapse into the same Project and push it out of
    // codegen — read back, the fused word is a pure codegen'd projection
    val path = "/tmp/graft_sfa_word_expr_spec"
    spark.range(500)
      .select(col("id").as("user_id"), lit(0).as("win"),
        expr(s"transform(sequence(0, ${L - 1}), j -> sin(id * (j + 3) * 0.37) * 1.4)")
          .as("approx"))
      .write.mode("overwrite").parquet(path)
    val arrays = spark.read.parquet(path)
    val fused = SFAOps.packWordsFused(arrays, bins, Bits)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    val binsDF = bins.zipWithIndex.flatMap { case (es, c) =>
      es.zipWithIndex.map { case (e, p) => (c, p, e) }
    }.toSeq.toDF("coef", "pos", "edge")
    val exploded = arrays
      .select(col("user_id"), col("win"), posexplode(col("approx")).as(Seq("coef", "v")))
    val grouped = SFAOps.packWords(exploded, binsDF, Bits)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    assert(fused.size == 500 && grouped.size == 500)
    fused.foreach { case (id, w) =>
      assert(w == grouped(id), s"id=$id fused=$w grouped=${grouped(id)}")
    }

    // the plan must be a codegen'd projection, not a fallback: the
    // sfa_word Project line carries the "*(n)" whole-stage marker
    val plan = SFAOps.packWordsFused(arrays, bins, Bits)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("sfa_word") && l.trim.startsWith("*(")),
      s"sfa_word projection not inside a whole-stage codegen span:\n$plan")
  }

  test("bridge column round-trips an expression") {
    val c = Bridge.column(graft.sfa.expr.SfaWordExpr(
      Bridge.expression(lit(Array(0.5, 0.5))),
      Bridge.expression(typedlit(Seq(Seq(0.0), Seq(1.0)))), 2))
    import spark.implicits._
    val out = Seq(1).toDF("x").select(c.as("w")).head().getLong(0)
    // coef0: 0.5 >= 0.0 -> sym 1; coef1: 0.5 < 1.0 -> sym 0 -> word = 1
    assert(out == 1L)
  }
}
