package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The SFA lower-bounding distance (reference SFADistance.java:22-67)
  * as a native codegen expression — THE index scan kernel: at scale the
  * LB pass touches every surviving member row (word + small approx),
  * and exact distances run only on the τ-qualifying rest, so this is
  * the loop the filter-and-refine engine spends its scan time in.
  *
  * Children: candidate word `ARRAY<INT>`, query word `ARRAY<INT>`,
  * query approximation `ARRAY<DOUBLE>`, fitted bin edges
  * `ARRAY<ARRAY<DOUBLE>>` (a plan literal — model-sized). `normed` is a
  * literal-only constructor flag: when the series keep their means the
  * DC slot counts once and the imaginary DC slot (index 1) is skipped;
  * when z-normed every coefficient counts twice.
  *
  * Per coefficient, distance of the query's Fourier value to the
  * candidate symbol's bin interval: 0 when symbols agree,
  * `edge(c1−1) − qa` when the candidate sits above, `qa − edge(c1)`
  * below. Same evaluation order as the Scala `IndexOps.lbDistance` it
  * replaces — bit-identical doubles, every oracle hash unchanged.
  */
case class LbDistExpr(
    word: Expression,
    queryWord: Expression,
    queryApprox: Expression,
    bins: Expression,
    normed: Boolean)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def first: Expression = word
  override def second: Expression = queryWord
  override def third: Expression = queryApprox
  override def fourth: Expression = bins
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sfa_lb_dist"

  override def inputTypes =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType),
      ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))

  override def nullSafeEval(w: Any, qw: Any, qa: Any, b: Any): Any = {
    val wv = w.asInstanceOf[ArrayData]
    val qwv = qw.asInstanceOf[ArrayData]
    val qav = qa.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    def dist(i: Int): Double = {
      val c1 = wv.getInt(i)
      val c2 = qwv.getInt(i)
      if (c1 == c2) 0.0
      else if (c1 > c2) bv.getArray(i).getDouble(c1 - 1) - qav.getDouble(i)
      else qav.getDouble(i) - bv.getArray(i).getDouble(c1)
    }
    val n = wv.numElements()
    var d = 0.0
    var i = 0
    if (!normed && n > 0) {
      val v = dist(0)
      d = v * v
      i = 2
    }
    while (i < n) {
      val v = dist(i)
      d += 2.0 * v * v
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, qw, qa, b) => {
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c1 = ctx.freshName("c1")
      val c2 = ctx.freshName("c2")
      val v = ctx.freshName("v")
      val dcInit =
        if (normed) s"double $d = 0.0; int $i = 0;"
        else
          s"""double $d = 0.0; int $i = 0;
             |if ($n > 0) {
             |  final int ${c1}0 = $w.getInt(0);
             |  final int ${c2}0 = $qw.getInt(0);
             |  double ${v}0 = 0.0;
             |  if (${c1}0 > ${c2}0) ${v}0 = $b.getArray(0).getDouble(${c1}0 - 1) - $qa.getDouble(0);
             |  else if (${c1}0 < ${c2}0) ${v}0 = $qa.getDouble(0) - $b.getArray(0).getDouble(${c1}0);
             |  $d = ${v}0 * ${v}0;
             |  $i = 2;
             |}""".stripMargin
      s"""
         |final int $n = $w.numElements();
         |$dcInit
         |for (; $i < $n; $i++) {
         |  final int $c1 = $w.getInt($i);
         |  final int $c2 = $qw.getInt($i);
         |  double $v = 0.0;
         |  if ($c1 > $c2) $v = $b.getArray($i).getDouble($c1 - 1) - $qa.getDouble($i);
         |  else if ($c1 < $c2) $v = $qa.getDouble($i) - $b.getArray($i).getDouble($c1);
         |  $d += 2.0 * $v * $v;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): LbDistExpr =
    copy(word = newFirst, queryWord = newSecond,
      queryApprox = newThird, bins = newFourth)
}
