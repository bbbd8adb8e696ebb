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
    ext.injectFunction(GraftFunctions.bloomContainsDescriptor)
    ext.injectFunction(GraftFunctions.nfcDescriptor)
    ext.injectFunction(GraftFunctions.unaccentDescriptor)
    ext.injectFunction(GraftFunctions.charProfileDescriptor)
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

  /** graft_bloom_contains(filterBytes, value): probe a serialized
    * [[org.apache.spark.util.sketch.BloomFilter]] with a long value —
    * Spark's own codegen'd BloomFilterMightContain (the expression its
    * injected runtime filters use), exposed as a registered function
    * because it has no public SQL surface. The filter argument must be a
    * foldable binary (the expression's own contract). */
  private[functions] val bloomContainsDescriptor
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_bloom_contains"),
    (children: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0), children(1)))

  private[functions] val nfcDescriptor
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[StringNfc].getName, "graft_nfc"),
    (children: Seq[Expression]) => StringNfc(children(0)))

  private[functions] val unaccentDescriptor
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_unaccent"),
    new ExpressionInfo(classOf[StringUnaccent].getName, "graft_unaccent"),
    (children: Seq[Expression]) => StringUnaccent(children(0)))

  private[functions] val charProfileDescriptor
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_char_profile"),
    new ExpressionInfo(classOf[CharProfile].getName, "graft_char_profile"),
    (children: Seq[Expression]) => CharProfile(children(0)))

  private val allDescriptors = Seq(dotDescriptor, bloomContainsDescriptor,
    nfcDescriptor, unaccentDescriptor, charProfileDescriptor)

  /** Idempotent per-session registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    allDescriptors.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }

  /** Column-API handle: `dot(a, b)` → codegen'd ArrayDotProduct. The
    * session must have the function registered (ensureRegistered). */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }

  /** Column-API handle: `bloomContains(filterBytes, value)` — true when
    * the serialized Bloom filter might contain the long value. */
  def bloomContains(spark: SparkSession, filter: Column, value: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_bloom_contains", filter, value)
  }

  /** Column-API handle: NFC Unicode normalization. */
  def nfc(spark: SparkSession, s: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_nfc", s)
  }

  /** Column-API handle: accent stripping (NFD → drop marks → NFC). */
  def unaccent(spark: SparkSession, s: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_unaccent", s)
  }

  /** Column-API handle: single-pass char profile struct
    * (n_chars_counted, char_types, char_entropy). */
  def charProfile(spark: SparkSession, s: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_char_profile", s)
  }
}
