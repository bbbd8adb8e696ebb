package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * Why a custom Catalyst Expression (SURVEY §7.3 escalation ladder): the
  * built-in composition `aggregate(zip_with(a, b, *), 0.0, +)` is a
  * higher-order function — evaluated interpreted, one closure call and one
  * intermediate array per row. On an O(pairs) similarity workload that is
  * the hot path. This expression codegens to a tight primitive loop inside
  * whole-stage codegen: no allocation, no virtual calls.
  *
  * Registered as SQL function `graft_dot` via [[GraftExtensions]].
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Inputs are coerced to array<double> by the GraftFunctions builder
  // (ExpectsInputTypes would be cleaner, but AbstractDataType is
  // private[sql] in Spark 4).
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
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
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
