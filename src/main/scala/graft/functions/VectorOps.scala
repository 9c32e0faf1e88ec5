package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType|DoubleType)` columns.
  *
  * Built on Spark's higher-order array functions (`transform`, `zip_with`,
  * `aggregate`) so everything stays inside Catalyst — no UDF/serialization
  * boundary, and the expressions participate in whole-stage codegen's
  * surrounding operators.
  *
  * Semantics mirror the reference engine (SURVEY.md §1.2):
  *   - L2-normalization before index/search (reference `main.py:87`).
  *   - distance = squared L2 over normalized vectors, so ascending distance
  *     ordering == descending cosine ordering (reference `main.py:60,155`).
  *
  * All math is done in DoubleType (fixtures store float32; the DuckDB oracle
  * computes in double — FIXTURES.md gotchas).
  */
object VectorOps {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Sum of elements of a double array column, accumulated in array order. */
  def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) in double (codegen'd native expression, [[ArrayDot]]). */
  def dot(a: Column, b: Column): Column =
    column(ArrayDot(expression(asDouble(a)), expression(asDouble(b))))

  /** ‖v‖₂ in double. */
  def l2Norm(c: Column): Column = sqrt(dot(c, c))

  /** v / ‖v‖₂ (elements cast to double). Reference `main.py:87`.
    * Codegen'd single-pass expression, [[ArrayL2Normalize]].
    */
  def l2Normalize(c: Column): Column =
    column(ArrayL2Normalize(expression(asDouble(c))))

  /** ‖a − b‖² in double — the metric FAISS IndexHNSWFlat returns
    * (reference `main.py:155,163`). Codegen'd, [[ArraySquaredL2]].
    */
  def squaredL2(a: Column, b: Column): Column =
    column(ArraySquaredL2(expression(asDouble(a)), expression(asDouble(b))))

  /** cos(a, b) = dot / (‖a‖·‖b‖). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
