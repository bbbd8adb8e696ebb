package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers the generated code calls — one JIT-compiled body shared
  * by every task, same pattern as Spark's own string expressions. */
object StringNormalizeOps {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: NFC-normalized (all ASCII is) → return the input as-is.
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def unaccent(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: nothing decomposes → no marks to strip.
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) && !hasMark(str)) return s
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    if (!hasMark(d)) return UTF8String.fromString(Normalizer.normalize(d, Normalizer.Form.NFC))
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    // Recompose what survives so unrelated compositions aren't left NFD.
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  private def hasMark(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.getType(s.charAt(i)) == Character.NON_SPACING_MARK) return true
      i += 1
    }
    false
  }
}

/** NFC Unicode normalization (Spark has no built-in normalizer; a UDF here
  * would break whole-stage codegen on the full-corpus canonicalize path).
  * Registered as `graft_nfc` via [[GraftExtensions]]. */
case class StringNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    StringNormalizeOps.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringNormalizeOps$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): StringNfc =
    copy(child = newChild)
}

/** Accent stripping: NFD-decompose, drop combining marks, recompose.
  * Registered as `graft_unaccent` via [[GraftExtensions]]. */
case class StringUnaccent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unaccent"

  override def nullSafeEval(input: Any): Any =
    StringNormalizeOps.unaccent(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringNormalizeOps$$.MODULE$$.unaccent($c)")

  override protected def withNewChildInternal(newChild: Expression): StringUnaccent =
    copy(child = newChild)
}
