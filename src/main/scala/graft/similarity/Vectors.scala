package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so the hot
  * path stays inside whole-stage codegen. Accumulation is a left fold in
  * doubles — deterministic element order, which keeps results reproducible
  * across partitionings (and hash-comparable against the DuckDB oracle). */
object Vectors {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
