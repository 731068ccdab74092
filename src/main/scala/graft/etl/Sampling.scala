package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and splitting — the reproducible
  * alternative to rand()-based sampling for training-data pipelines:
  * membership depends only on the KEY, so re-runs, backfills, and
  * incremental loads route the same document to the same split, on any
  * cluster, at any parallelism.
  *
  * Mechanism: bucket = xxhash64(key, salt) mod denominator. No shuffle,
  * no state — a pure filter expression the scan can evaluate.
  */
object Sampling {

  private def bucket(key: Column, salt: String, denom: Int): Column =
    pmod(xxhash64(lit(salt), key), lit(denom.toLong))

  /** Keep ~numerator/denominator of rows, keyed. */
  def hashSample(df: DataFrame, key: String, numerator: Int, denominator: Int,
                 salt: String = "graft"): DataFrame = {
    require(numerator >= 0 && numerator <= denominator && denominator > 0)
    df.filter(bucket(col(key), salt, denominator) < numerator)
  }

  /** Tag each row train/test with a ~testPermille/1000 test share.
    * Complementary by construction: every key lands in exactly one split. */
  def trainTestSplit(df: DataFrame, key: String, testPermille: Int,
                     salt: String = "graft"): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000)
    df.withColumn("split",
      when(bucket(col(key), salt, 1000) < testPermille, lit("test"))
        .otherwise(lit("train")))
  }
}
