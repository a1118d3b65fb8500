package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused SFA quantize + word pack as a native Catalyst expression with
  * whole-stage codegen: given a window's Fourier approximation
  * (`ARRAY<DOUBLE>`) and the fitted per-coefficient bin edges
  * (`ARRAY<ARRAY<DOUBLE>>`, assigned edges only), produces the packed
  * word `Σ_c #[edges_c ≤ v_c] << (usedBits·c)` in one pass over the
  * row — no per-coefficient explosion, no join, no aggregation.
  *
  * Reference semantics: per-coefficient symbol lookup
  * (sfa/transformation/SFA.java:194-231) + bit packing
  * (sfa/classification/Classifier.java:163-192). The symbol counts ALL
  * edges ≤ v (no early break), bit-for-bit the grouped form
  * [[graft.sfa.SFAOps.packWords]] computes; a coefficient with no
  * edges row yields symbol 0, matching that form's left join.
  */
case class SfaWordExpr(approx: Expression, edges: Expression, usedBits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = approx
  override def right: Expression = edges
  override def dataType: DataType = LongType
  override def prettyName: String = "sfa_word"

  // Analysis-time contract for the SQL surface: mismatched element
  // types are implicitly cast or rejected instead of getDouble()
  // misreading the array storage at runtime.
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))

  override def nullSafeEval(a: Any, e: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val ev = e.asInstanceOf[ArrayData]
    val n = av.numElements()
    val m = ev.numElements()
    var word = 0L
    var c = 0
    while (c < n) {
      val v = av.getDouble(c)
      var sym = 0L
      if (c < m) {
        val es = ev.getArray(c)
        val em = es.numElements()
        var j = 0
        while (j < em) {
          if (v >= es.getDouble(j)) sym += 1
          j += 1
        }
      }
      word |= sym << (usedBits * c)
      c += 1
    }
    word
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, e) => {
      val word = ctx.freshName("word")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      val sym = ctx.freshName("sym")
      val es = ctx.freshName("es")
      val em = ctx.freshName("em")
      val j = ctx.freshName("j")
      s"""
         |long $word = 0L;
         |final int $n = $a.numElements();
         |final int $m = $e.numElements();
         |for (int $c = 0; $c < $n; $c++) {
         |  final double $v = $a.getDouble($c);
         |  long $sym = 0L;
         |  if ($c < $m) {
         |    final org.apache.spark.sql.catalyst.util.ArrayData $es = $e.getArray($c);
         |    final int $em = $es.numElements();
         |    for (int $j = 0; $j < $em; $j++) {
         |      if ($v >= $es.getDouble($j)) $sym++;
         |    }
         |  }
         |  $word |= $sym << ($usedBits * $c);
         |}
         |${ev.value} = $word;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SfaWordExpr =
    copy(approx = newLeft, edges = newRight)
}
