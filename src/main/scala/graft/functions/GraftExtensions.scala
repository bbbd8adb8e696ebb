package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Registration for graft's native expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the production path), or
  *  - [[GraftFunctions.ensureRegistered]] for sessions the harness hands us
  *    already constructed (idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
  }
}

object GraftFunctions {

  private[functions] val dotDescriptor
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      // Coerce both sides to array<double> (accepts array<float> inputs).
      def toDoubles(e: Expression): Expression = e.dataType match {
        case ArrayType(DoubleType, _) => e
        case _ => Cast(e, ArrayType(DoubleType))
      }
      ArrayDotProduct(toDoubles(children(0)), toDoubles(children(1)))
    })

  /** Idempotent per-session registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("graft_dot"))) {
      registry.registerFunction(dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)
    }
  }

  /** Column-API handle: `dot(a, b)` → codegen'd ArrayDotProduct. The
    * session must have the function registered (ensureRegistered). */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }
}
