package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared Euclidean distance of two `ARRAY<DOUBLE>` columns as a
  * native Catalyst expression with whole-stage codegen — the exact-
  * verification kernel of every k-NN/range query (the reference's
  * `getEuclideanDistance`, SFATrie.java:947-961, minus its early-abandon
  * which a columnar batch cannot exploit profitably). As a Scala UDF
  * this kernel pays per-row serialization of both arrays into
  * `Seq[Double]`; as an expression it is one fused primitive loop over
  * the unsafe array bytes inside the generated code.
  *
  * Sums over min(len(a), len(b)); accumulation order is ascending index
  * in BOTH the interpreted and codegen paths — bit-identical to the UDF
  * it replaces, so every oracle hash is unchanged.
  */
case class Ed2Expr(a: Expression, b: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_ed2"

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(x: Any, y: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    val bv = y.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = av.getDouble(i) - bv.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Ed2Expr =
    copy(a = newLeft, b = newRight)
}
