package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codegen-friendly vector math over `array<float|double>` columns using
  * Catalyst higher-order functions — no UDFs, so everything stays inside
  * whole-stage codegen and scales embarrassingly parallel.
  *
  * Accumulation is SEQUENTIAL over the array (aggregate/zip_with), which
  * makes the double math bit-reproducible — the DuckDB oracles mirror the
  * same element order, so cosine values hash-match exactly.
  */
object VectorOps {

  /** Cast an array<float> to array<double> (exact, no rounding). */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** L1 distance (for the Laplacian kernel). */
  def l1Distance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 distance (for the RBF kernel). */
  def sqDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity; both inputs must already be double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize a vector. */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x / n)
  }
}
