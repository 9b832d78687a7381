package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tight-loop vector kernels shared by the interpreted and generated
  * paths (the [[graft.index.VarintCodec]] pattern). Accumulation is a
  * sequential left-to-right double fold — the SAME order as
  * `zip_with + aggregate` and DuckDB's `list_reduce`, so swapping the HOF
  * formulation for this expression changes performance, not one bit of
  * any result. */
object VectorOps {

  /** Σ aᵢ·bᵢ in double. Float elements are widened exactly (float→double
    * is lossless), multiplication happens in double — identical to the
    * `x.cast("double") * y.cast("double")` HOF it replaces. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"dot: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element is a data error, reported loudly — reading the slot
      // anyway would return reinterpreted garbage
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot: null vector element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Native dot product over two numeric arrays (array<float> or
  * array<double>, mixed allowed). Exists because Catalyst's higher-order
  * functions (`zip_with`, `aggregate`) evaluate interpreted lambdas per
  * row — on pair-join hot paths (embedding near-dup: millions of
  * candidate pairs × vector dim) that interpretation dominates the query.
  * This expression participates in whole-stage codegen via a static call
  * into [[VectorOps]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Only float/double element arrays are accepted — an int/long array
    * would be silently reinterpreted byte-wise by getDouble, producing
    * garbage rather than an error. (The HOF form this replaces casts any
    * numeric; callers with integer vectors must cast explicitly.) */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Column-level API. */
object vectors {
  def dotProduct(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))
}
