package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * Spark's higher-order functions (aggregate/zip_with) are evaluated
  * interpreted, element by element, outside whole-stage codegen — a
  * brute-force k-NN pass over millions of pairs pays ~50-100ns of
  * boxing per element. This expression compiles to a primitive `for`
  * loop inside the generated code (and the interpreted fallback is a
  * tight while loop on ArrayData).
  *
  * The fold order is left-to-right over i = 0..n-1 — identical to the
  * higher-order `aggregate` formulation, so oracle parity (SURVEY §6)
  * is unchanged.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-level API for the codegen'd dot product. */
  def dotD(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductD(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
