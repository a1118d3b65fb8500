package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The Shotgun distance (min aligned-ED² per disjoint query window over
  * every sliding train position, summed — reference
  * ShotgunClassifier.java:152-238) of two `ARRAY<DOUBLE>` columns as a
  * native codegen expression. As a Scala UDF the kernel paid per-PAIR
  * conversion of both full series into boxed `Seq[Double]` through
  * CatalystTypeConverters inside a cross join — the most expensive
  * serialization boundary in the registry. Here each side is one
  * primitive-array copy (`ArrayData.toDoubleArray`) and the kernel is
  * THE SAME [[graft.sfa.Shotgun.distance]] call in both the interpreted
  * and generated paths — bit-identical by construction, every oracle
  * hash unchanged. The O(windows × positions × w) loop itself is the
  * operator's semantics; what this removes is the boundary around it.
  */
case class ShotgunDistExpr(a: Expression, b: Expression, windowLength: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "shotgun_dist"

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(x: Any, y: Any): Any =
    graft.sfa.Shotgun.distance(
      x.asInstanceOf[ArrayData].toDoubleArray(),
      y.asInstanceOf[ArrayData].toDoubleArray(),
      windowLength)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // the object's static forwarder: the generated code calls the
      // exact kernel the UDF called (normMean = true, its default)
      s"""
         |${ev.value} = graft.sfa.Shotgun.distance(
         |  $x.toDoubleArray(), $y.toDoubleArray(), $windowLength, true);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShotgunDistExpr =
    copy(a = newLeft, b = newRight)
}
