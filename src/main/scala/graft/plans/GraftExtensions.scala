package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}
import graft.sfa.expr.{BossDistExpr, Ed2Expr, LbDistExpr, LongDotExpr, SfaWordExpr}

/** Session-extension entry point registering the engine's native
  * Catalyst expressions as SQL functions, so pure-SQL consumers (and
  * `spark.sql(...)` pipelines) reach the same codegen'd kernels the
  * DataFrame API uses:
  *
  *  - `sfa_word(approx ARRAY<DOUBLE>, edges ARRAY<ARRAY<DOUBLE>>,
  *    usedBits INT)` → packed SFA word ([[graft.sfa.expr.SfaWordExpr]];
  *    `usedBits` must be a literal — it is baked into the generated
  *    code);
  *  - `long_dot(a ARRAY<BIGINT>, b ARRAY<BIGINT>)` → integer dot
  *    product ([[graft.sfa.expr.LongDotExpr]]);
  *  - `array_ed2(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)` → squared Euclidean
  *    distance ([[graft.sfa.expr.Ed2Expr]], the exact-verification
  *    kernel);
  *  - `boss_dist(a ARRAY<BIGINT>, b ARRAY<BIGINT>)` → the BOSS
  *    asymmetric bag distance, −1 on zero overlap
  *    ([[graft.sfa.expr.BossDistExpr]]);
  *  - `sfa_lb_dist(word ARRAY<INT>, qword ARRAY<INT>,
  *    qapprox ARRAY<DOUBLE>, bins ARRAY<ARRAY<DOUBLE>>, normed BOOLEAN)`
  *    → the SFA lower-bounding distance ([[graft.sfa.expr.LbDistExpr]];
  *    `normed` must be a literal — it selects the generated weighting).
  *
  * Activate with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)` on a builder). The functions
  * stay inside whole-stage codegen — registration adds surface, not a
  * different execution path (ExtensionsSpec asserts parity with the
  * DataFrame forms).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("sfa_word"),
      new ExpressionInfo(classOf[SfaWordExpr].getName, "sfa_word"),
      (children: Seq[Expression]) => children match {
        case Seq(approx, edges, Literal(bits: Int, IntegerType)) =>
          SfaWordExpr(approx, edges, bits)
        case _ => throw new IllegalArgumentException(
          "sfa_word(approx ARRAY<DOUBLE>, edges ARRAY<ARRAY<DOUBLE>>, usedBits INT-literal)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotExpr].getName, "long_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => LongDotExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "long_dot(a ARRAY<BIGINT>, b ARRAY<BIGINT>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_ed2"),
      new ExpressionInfo(classOf[Ed2Expr].getName, "array_ed2"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => Ed2Expr(a, b)
        case _ => throw new IllegalArgumentException(
          "array_ed2(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("boss_dist"),
      new ExpressionInfo(classOf[BossDistExpr].getName, "boss_dist"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => BossDistExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "boss_dist(a ARRAY<BIGINT>, b ARRAY<BIGINT>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sfa_lb_dist"),
      new ExpressionInfo(classOf[LbDistExpr].getName, "sfa_lb_dist"),
      (children: Seq[Expression]) => children match {
        case Seq(w, qw, qa, bins, Literal(normed: Boolean, BooleanType)) =>
          LbDistExpr(w, qw, qa, bins, normed)
        case _ => throw new IllegalArgumentException(
          "sfa_lb_dist(word ARRAY<INT>, qword ARRAY<INT>, qapprox ARRAY<DOUBLE>, " +
            "bins ARRAY<ARRAY<DOUBLE>>, normed BOOLEAN-literal)")
      }))
  }
}
