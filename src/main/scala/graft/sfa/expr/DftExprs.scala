package graft.sfa.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Static-forwarder kernels for the per-series DFT expressions: the
  * generated code calls EXACTLY the Scala kernels the ScalaUDFs called
  * ([[graft.sfa.SFAOps.disjointKernelArr]] / [[graft.sfa.SFAOps.slidingKernelArr]] /
  * [[graft.sfa.Fourier.transformWindowing]]), so every value is
  * bit-identical; what the expressions remove is the per-row
  * serialization boundary — a ScalaUDF converts the full series into a
  * boxed `Seq[Double]` and the nested result array back through
  * CatalystTypeConverters on EVERY row of the hottest stage in the
  * engine. Here the input is one primitive-array copy and each window's
  * coefficients land in an UnsafeArrayData wrapper directly.
  */
object DftKernels {
  private def toCatalyst(a: Array[Array[Double]]): ArrayData =
    new GenericArrayData(a.map(UnsafeArrayData.fromPrimitiveArray(_): AnyRef))

  def disjoint(data: ArrayData, w: Int, l: Int, normMean: Boolean): ArrayData =
    toCatalyst(graft.sfa.SFAOps.disjointKernelArr(data.toDoubleArray(), w, l, normMean))

  def sliding(data: ArrayData, w: Int, l: Int, normMean: Boolean): ArrayData =
    toCatalyst(graft.sfa.SFAOps.slidingKernelArr(data.toDoubleArray(), w, l, normMean))

  def mft(data: ArrayData, w: Int, l: Int, normMean: Boolean): ArrayData =
    toCatalyst(graft.sfa.Fourier.transformWindowing(
      data.toDoubleArray(), w, l, normMean, lowerBounding = true, applyZNorm = true))
}

/** Disjoint-window DFT approximations of a series as a native
  * expression: `(ARRAY<DOUBLE>, w) → ARRAY<ARRAY<DOUBLE>>`, one inner
  * array per complete window. `w` is an expression child so the grid
  * pipelines (window length as DATA) and the fixed-w paths share one
  * node; `l` / `normMean` are plan literals. Nullable mirrors the
  * ScalaUDF it replaces. Structural canonicalization replaces the
  * memoized-UDF-instance workaround: two builds of the same plan now
  * compare equal by construction, with no function-reference key to
  * keep in lockstep with closed-over parameters.
  */
case class DisjointDftExpr(data: Expression, w: Expression, l: Int, normMean: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = data
  override def right: Expression = w
  override def dataType: DataType = ArrayType(ArrayType(DoubleType, containsNull = false))
  override def nullable: Boolean = true
  override def prettyName: String = "sfa_disjoint_dft"

  override def inputTypes = Seq(ArrayType(DoubleType), IntegerType)

  override def nullSafeEval(d: Any, wv: Any): Any =
    DftKernels.disjoint(d.asInstanceOf[ArrayData], wv.asInstanceOf[Int], l, normMean)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv) =>
      s"${ev.value} = graft.sfa.expr.DftKernels.disjoint($d, $wv, $l, $normMean);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DisjointDftExpr =
    copy(data = newLeft, w = newRight)
}

/** Sliding-window direct-DFT approximations with per-window 1/σ
  * scaling — the expression twin of [[graft.sfa.SFAOps.slidingKernelArr]];
  * see [[DisjointDftExpr]] for the boundary rationale.
  */
case class SlidingDftExpr(data: Expression, w: Expression, l: Int, normMean: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = data
  override def right: Expression = w
  override def dataType: DataType = ArrayType(ArrayType(DoubleType, containsNull = false))
  override def nullable: Boolean = true
  override def prettyName: String = "sfa_sliding_dft"

  override def inputTypes = Seq(ArrayType(DoubleType), IntegerType)

  override def nullSafeEval(d: Any, wv: Any): Any =
    DftKernels.sliding(d.asInstanceOf[ArrayData], wv.asInstanceOf[Int], l, normMean)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv) =>
      s"${ev.value} = graft.sfa.expr.DftKernels.sliding($d, $wv, $l, $normMean);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlidingDftExpr =
    copy(data = newLeft, w = newRight)
}

/** Sliding approximations via the O(1)-per-step MFT recurrence (the
  * scale path, [[graft.sfa.Fourier.transformWindowing]]) as a native
  * expression; see [[DisjointDftExpr]] for the boundary rationale.
  */
case class MftDftExpr(data: Expression, w: Int, l: Int, normMean: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = data
  override def dataType: DataType = ArrayType(ArrayType(DoubleType, containsNull = false))
  override def nullable: Boolean = true
  override def prettyName: String = "sfa_mft"

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def nullSafeEval(d: Any): Any =
    DftKernels.mft(d.asInstanceOf[ArrayData], w, l, normMean)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"${ev.value} = graft.sfa.expr.DftKernels.mft($d, $w, $l, $normMean);")

  override protected def withNewChildInternal(newChild: Expression): MftDftExpr =
    copy(data = newChild)
}
