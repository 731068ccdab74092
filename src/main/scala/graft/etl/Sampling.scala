package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and splitting — the reproducible
  * alternative to rand()-based sampling for training-data pipelines:
  * membership depends only on the KEY, so re-runs, backfills, and
  * incremental loads route the same document to the same split, on any
  * cluster, at any parallelism.
  *
  * Mechanism: bucket = hash(key, salt) mod denominator. No shuffle,
  * no state — a pure filter expression the scan can evaluate. Two hash
  * flavors:
  *  - default: xxhash64 (Spark-native, codegen'd, fastest);
  *  - portable: md5-prefix → integer, reproducible in ANY engine with
  *    md5 (DuckDB, Postgres, Trino, …) — use when split membership must
  *    be auditable outside Spark (e.g. a held-out set shared across
  *    teams and engines).
  */
object Sampling {

  private def bucket(key: Column, salt: String, denom: Int,
                     portable: Boolean): Column =
    if (portable)
      // first 15 hex digits of md5(salt || key) = 60 bits, exact in a
      // signed long; any engine computes the same value from the same
      // string key
      pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
        16, 10).cast("long"), lit(denom.toLong))
    else
      pmod(xxhash64(lit(salt), key), lit(denom.toLong))

  /** Keep ~numerator/denominator of rows, keyed. */
  def hashSample(df: DataFrame, key: String, numerator: Int, denominator: Int,
                 salt: String = "graft", portable: Boolean = false): DataFrame = {
    require(numerator >= 0 && numerator <= denominator && denominator > 0)
    df.filter(bucket(col(key), salt, denominator, portable) < numerator)
  }

  /** Stratified hash sample: per-stratum keep rates (permille), for
    * corpus rebalancing (e.g. downsample the dominant language, keep
    * the rest). The stratum value participates in the hash, so strata
    * sample independently even for identical keys; membership stays
    * key-stable and engine-portable (with portable=true, any
    * md5-capable engine reproduces it). Strata not in the map keep
    * `defaultPermille`. */
  def stratifiedSample(df: DataFrame, key: String, strataCol: String,
                       permilleByStratum: Map[String, Int],
                       defaultPermille: Int = 1000,
                       salt: String = "graft",
                       portable: Boolean = false): DataFrame = {
    require((permilleByStratum.values ++ Seq(defaultPermille))
      .forall(p => p >= 0 && p <= 1000))
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    val strataKey = concat(col(strataCol).cast("string"), col(key).cast("string"))
    df.filter(bucket(strataKey, salt, 1000, portable) < rate)
  }

  /** Tag each row train/test with a ~testPermille/1000 test share.
    * Complementary by construction: every key lands in exactly one split. */
  def trainTestSplit(df: DataFrame, key: String, testPermille: Int,
                     salt: String = "graft", portable: Boolean = false): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000)
    df.withColumn("split",
      when(bucket(col(key), salt, 1000, portable) < testPermille, lit("test"))
        .otherwise(lit("train")))
  }
}
