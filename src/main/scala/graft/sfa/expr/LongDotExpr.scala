package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two `ARRAY<BIGINT>` columns as a native
  * Catalyst expression with whole-stage codegen — the hot kernel of
  * every similarity/dedup re-score. The SQL-lambda form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)`
  * evaluates interpreted per row (HigherOrderFunction), which dominates
  * candidate re-ranking cost; this expression is one fused primitive
  * loop inside the generated code.
  *
  * Sums over min(len(a), len(b)) — the engine's vectors are
  * equal-length by construction (callers guard dimensionality); with
  * integer-scaled embeddings (|x| ≤ 2¹⁷) the accumulator cannot
  * overflow a long at any realistic dimension.
  */
case class LongDotExpr(a: Expression, b: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  // Analysis-time contract for the SQL surface: non-BIGINT element
  // types are implicitly cast (ARRAY<INT> literals etc.) or rejected —
  // without this, getLong() would misread 4-byte element storage and
  // return silently wrong dot products.
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(x: Any, y: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    val bv = y.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += av.getLong(i) * bv.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |long $acc = 0L;
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(a = newLeft, b = newRight)
}
