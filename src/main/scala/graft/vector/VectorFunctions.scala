package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding-vector primitives over Array[Float] columns, as Catalyst
  * higher-order functions (codegen'd, no UDFs, no shuffle).
  *
  * Determinism contract: all accumulation is LEFT-TO-RIGHT in double
  * precision — bit-identical to DuckDB's list_cosine_similarity over
  * DOUBLE[] (denominator sqrt(na)*sqrt(nb), verified empirically), which
  * the oracle uses.
  *
  * Scale notes: per-row expressions fuse into the scan; the wide ops
  * (top-k join, near-dup pair generation) live in SimilaritySearch.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, sequential — compiled via [[DotProductExpr]]
    * (whole-stage codegen; the `aggregate(zip_with(...))` higher-order
    * formulation computes the identical value but runs interpreted,
    * ~5-10× slower on similarity scans). */
  def dot(a: Column, b: Column): Column = DotProductExpr.dot(a, b)

  /** Σ aᵢ·bᵢ via interpreted higher-order functions — kept as the
    * reference/regression-check formulation for [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, p) => acc + p)

  /** Σ aᵢ² in double, sequential. */
  def normSq(a: Column): Column = DotProductExpr.dot(a, a)

  /** cosine(a,b) = dot / (sqrt(|a|²)·sqrt(|b|²)) — DuckDB-parity form. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** cosine given a precomputed squared norm for each side (avoids
    * recomputing norms per candidate pair in top-k joins). */
  def cosinePrenormed(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / (sqrt(normSqA) * sqrt(normSqB))

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a
    * long, computed by the compiled [[HyperplaneSigExpr]] (plane
    * components are deterministic ±1 from SplitMix64 of (plane, dim) —
    * no stored matrix, reproducible on any cluster). */
  def hyperplaneSignature(vec: Column, nBits: Int): Column =
    HyperplaneSigExpr.signature(vec, nBits)

  /** Wide banded signature as `array<long>`: element b is an
    * INDEPENDENT `bandWidth`-bit hyperplane signature over plane
    * window [b·bandWidth, (b+1)·bandWidth) of the global SplitMix64
    * plane family — nBands·bandWidth planes total, so band width is no
    * longer capped by the 64 bits of one packed long. For
    * nBands·bandWidth ≤ 64 element b equals the b-th width-w slice of
    * [[hyperplaneSignature]] bit-for-bit (same planes, same order). */
  def bandSignatures(vec: Column, nBands: Int, bandWidth: Int): Column =
    array((0 until nBands).map(b =>
      HyperplaneSigExpr.signature(vec, bandWidth, b * bandWidth)): _*)
}
