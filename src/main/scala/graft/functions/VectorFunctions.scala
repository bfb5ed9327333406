package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as codegen-friendly
  * column expressions (`zip_with` + `aggregate` fold). The fold runs in
  * index order, so results are deterministic and bit-comparable against a
  * sequential oracle; all arithmetic is promoted to double.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance — cheaper than cosine when vectors are normalized. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Deterministic pseudo-random hyperplane sign for LSH bucketing:
    * sign derived from a 64-bit avalanche hash of (plane, dim) — reproducible
    * across engines and runs without RNG state. */
  def hyperplaneSign(plane: Int, dim: Column): Column =
    when(pmod(xxhash64(lit(plane), dim), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Signed projection of a vector onto deterministic hyperplane `plane`:
    * sum_i sign(plane, i) * v[i]. */
  def planeProjection(vec: Column, plane: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") * hyperplaneSign(plane, i)),
      lit(0.0),
      (acc, x) => acc + x)

  /** LSH bucket id from `nPlanes` sign bits (random-hyperplane / SimHash
    * family — approximates cosine similarity neighborhoods). */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      when(planeProjection(vec, p) >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
