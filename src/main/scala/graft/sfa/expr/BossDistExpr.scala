package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The BOSS asymmetric bag distance over two dense `ARRAY<BIGINT>`
  * count vectors as a native codegen expression — the 1-NN join kernel
  * (reference `BOSSEnsembleClassifier.java` distance: only coordinates
  * the LEFT bag populates contribute, and a pair with no shared word is
  * no candidate at all). Returns Σ_{i: a_i>0} (a_i−b_i)², or −1 when no
  * i has a_i>0 ∧ b_i>0 (zero overlap — the caller's not-a-candidate
  * sentinel).
  *
  * Same single-pass fold as the Scala UDF it replaces (measured 2× the
  * two-HOF zip_with form even interpreted; this is that fold fused into
  * whole-stage codegen with no per-row `Seq` materialization).
  * Accumulation order is ascending index in both eval paths —
  * bit-identical integer results.
  */
case class BossDistExpr(a: Expression, b: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = LongType
  override def prettyName: String = "boss_dist"

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(x: Any, y: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    val bv = y.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    var d = 0L
    var ov = false
    var i = 0
    while (i < n) {
      val t = av.getLong(i)
      if (t > 0) {
        val r = bv.getLong(i)
        val diff = t - r
        d += diff * diff
        if (r > 0) ov = true
      }
      i += 1
    }
    if (ov) d else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val d = ctx.freshName("d")
      val ov = ctx.freshName("ov")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val r = ctx.freshName("r")
      val diff = ctx.freshName("diff")
      s"""
         |long $d = 0L;
         |boolean $ov = false;
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $t = $x.getLong($i);
         |  if ($t > 0L) {
         |    final long $r = $y.getLong($i);
         |    final long $diff = $t - $r;
         |    $d += $diff * $diff;
         |    if ($r > 0L) $ov = true;
         |  }
         |}
         |${ev.value} = $ov ? $d : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BossDistExpr =
    copy(a = newLeft, b = newRight)
}
