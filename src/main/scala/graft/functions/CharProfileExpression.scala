package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static body the generated code calls (the [[StringNormalizeOps]]
  * pattern): sort the char array and run-length it — ascending char
  * order, so the entropy fold order is deterministic, and no per-char
  * boxing or map allocation. */
object CharProfileOps {
  def profile(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    if (n == 0) return InternalRow(0L, 0L, 0.0)
    val arr = str.toCharArray
    java.util.Arrays.sort(arr)
    val nd = n.toDouble
    var i = 0
    var types = 0L
    var ent = 0.0
    while (i < n) {
      val c = arr(i)
      var j = i
      while (j < n && arr(j) == c) j += 1
      val p = (j - i) / nd
      ent -= p * math.log(p)
      types += 1
      i = j
    }
    InternalRow(n.toLong, types, ent)
  }
}

/** Single-pass character profile — (n_chars_counted, char_types,
  * char_entropy in nats) as a struct, computed inside whole-stage codegen
  * (a Scala UDF here would fence the full-corpus quality scan out of the
  * generated pipeline). Registered as `graft_char_profile` via
  * [[GraftExtensions]]; empty strings profile as (0, 0, 0.0) so the
  * result is never a null struct. Chars are UTF-16 code units. */
case class CharProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars_counted", LongType, nullable = false),
    StructField("char_types", LongType, nullable = false),
    StructField("char_entropy", DoubleType, nullable = false)))
  override def prettyName: String = "graft_char_profile"

  override def nullSafeEval(input: Any): Any =
    CharProfileOps.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharProfileOps$$.MODULE$$.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): CharProfile =
    copy(child = newChild)
}
