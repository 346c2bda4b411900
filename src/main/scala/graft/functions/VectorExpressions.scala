package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Runtime kernel for [[DotProduct]]. One tight unboxed loop over the
  * two ArrayData columns; `null` on length mismatch or any null
  * element — exactly the value the previous HOF formulation produced
  * (`zip_with` pads the shorter side with null, a null product poisons
  * the running sum). Summation is the same left-to-right double fold,
  * so results are bit-identical. */
object GraftVectors {
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Σ aᵢ·bᵢ over two float/double array columns as ONE expression with
  * an unboxed loop (r14, guide/task §"expressions and codegen"): the
  * previous `aggregate(zip_with(a, b, (x, y) => x·y), 0.0, +)` form is
  * a Catalyst higher-order function — never whole-stage-codegen'd, it
  * interprets the lambda tree and boxes every element, and it sat in
  * the hottest loops of the similarity family (the candidate-pair
  * verification of v3/v7 evaluates it once per pair). Same fold order,
  * same float→double widening, same null/length semantics — outputs
  * are bit-identical (oracle-gated v1–v7). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVectors.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double ${ev.value}_r = graft.functions.GraftVectors.dot(
         |  $a, $b, ${elemFloat(left)}, ${elemFloat(right)});
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(l, r)
}
