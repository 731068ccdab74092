package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the patterns local tests can't surface but a
  * 1000-executor cluster lives or dies by: key-skew mitigation and
  * shuffle-free co-located joins.
  *
  * AQE (on by default) already splits skewed SORT-MERGE join partitions;
  * `saltedJoin` is for the cases AQE can't fix — e.g. skewed
  * AGGREGATIONS or joins where one hot key dwarfs everything (a null-ish
  * default key, a "unknown" hospital id). Bucketing removes the shuffle
  * from repeated large joins on a stable key (fact-to-fact joins on
  * orderkey every night).
  */
object Scale {

  /** Salted large⨝small join on one hot-keyed column: the large side
    * gets a random salt in [0, salts), the small side is exploded
    * `salts`× so every salted key finds its match. Equi-join semantics
    * preserved exactly; shuffle load per key divided by `salts`. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For algebraic aggregates (sum/count)
    * this is semantically identical and caps any single reducer's input
    * at ~|key|/salts. (Spark's own partial aggregation usually covers
    * this; use when a custom non-combinable step forces a raw shuffle.) */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Write a table bucketed+sorted by the join key. Two tables bucketed
    * the same way join with ZERO shuffle (SortMergeJoin over pre-sorted
    * buckets — verified in ScaleSpec by the absence of Exchange in the
    * plan). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
