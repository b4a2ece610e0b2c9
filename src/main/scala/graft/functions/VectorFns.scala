package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, written with
  * higher-order functions so everything stays inside Catalyst codegen —
  * no UDF boxing per element.
  *
  * Determinism note (oracle parity): every reduction is a *sequential left
  * fold* (`aggregate`), matching the DuckDB oracle's `list_reduce`, so the
  * IEEE-754 result is bit-identical across engines.
  */
object VectorFns {

  /** Sequential-left-fold sum of a double array. */
  private def foldSum(xs: Column): Column =
    aggregate(xs, lit(0.0), (acc, x) => acc + x)

  /** Dot product in double precision (floats are widened exactly). */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm in double precision. */
  def norm2(a: Column): Column =
    foldSum(transform(a, x => x.cast("double") * x.cast("double")))

  /** Cosine similarity: dot / (sqrt(|a|^2) * sqrt(|b|^2)).
    * Delegates to the native codegen'd expression — same sequential
    * accumulation order as the HOF formulation above, so the result is
    * bit-identical to the DuckDB `list_reduce` oracle.
    */
  def cosine(a: Column, b: Column): Column = SketchExprs.cosineSim(a, b)

  /** The HOF formulation kept for cross-checking the native expression
    * (CosineParitySpec): must agree bitwise with [[cosine]].
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine over two `array<double>` columns (sequential left folds —
    * oracle-parity rules as above). Used for centroid-space math where
    * inputs are already double.
    */
  def cosineDouble(a: Column, b: Column): Column = {
    val dotD = foldSum(zip_with(a, b, (x, y) => x * y))
    val na = foldSum(transform(a, x => x * x))
    val nb = foldSum(transform(b, x => x * x))
    dotD / (sqrt(na) * sqrt(nb))
  }

  /** 64-bit-capped random-hyperplane LSH signature of an embedding:
    * bit i = sign(sum_j planes(i)(j) * v(j)). `planes` must be generated
    * deterministically (see Dedup.hyperplanes). Packed into a Long.
    * Each projection is a native codegen'd dot product (SketchExprs).
    */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 63)
    planes.zipWithIndex.map { case (plane, i) =>
      when(SketchExprs.floatDot(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
