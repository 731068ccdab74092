package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training order — the "shuffle the corpus"
  * step every pretraining pipeline runs last. Ordering by a seeded
  * key hash is reproducible (same seed → same order, on any cluster,
  * at any parallelism) and statistically uniform; the hard part at
  * scale is assigning each row its GLOBAL position without a single
  * total-order window (which moves the whole corpus to one reducer)
  * and without a driver-side zipWithIndex job at plan-build time.
  *
  * Two-level numbering keeps the plan lazy and distributed:
  *   1. bucket = first `hexPrefixLen` hex chars of the hash (16^len
  *      buckets); the within-bucket row_number() window partitions BY
  *      BUCKET, so each partition holds ~1/16^len of the data;
  *   2. bucket offsets come from a 16^len-row count frame via a
  *      prefix-sum window (unpartitioned, but over bucket COUNTS —
  *      never rows) joined back by broadcast.
  * Because the bucket is a prefix of the hash, (bucket asc, hash asc)
  * IS the global hash order, and pos = offset + within-bucket rank
  * equals ROW_NUMBER() OVER (ORDER BY hash) exactly — at ANY fanout:
  * the prefix length changes only HOW the work splits, never the
  * order, so results are fanout-invariant (sh01/sh02 pin both against
  * the same oracle).
  *
  * Sizing: each window partition holds ~corpus/16^len. The default 2
  * (256 buckets) suits bench scale; at 100 TB use 4 (65,536 buckets →
  * ~1.5 GB per bucket) — the offset frame is still only 16^len rows
  * aggregated map-side, and stays trivially broadcastable. */
object OrderedShuffle {

  /** Append `pos` (1-based global position in the seeded-hash order)
    * and `__h` (the hash itself) to `df`. `key` must be unique. */
  def globalOrder(df: DataFrame, key: String, seed: String,
                  hexPrefixLen: Int = 2): DataFrame = {
    require(hexPrefixLen >= 1 && hexPrefixLen <= 8,
      s"hexPrefixLen must be in [1,8] (16^len buckets), got $hexPrefixLen")
    val hashed = df
      .withColumn("__h", md5(concat(lit(seed), col(key).cast("string"))))
      .withColumn("__b", substring(col("__h"), 1, hexPrefixLen))
    val counts = hashed.groupBy("__b").agg(count(lit(1)).as("__n"))
    val offs = counts.withColumn("__off",
        coalesce(sum("__n").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val withinBucket = Window.partitionBy("__b").orderBy("__h")
    hashed.join(broadcast(offs), "__b")
      .withColumn("pos", col("__off") + row_number().over(withinBucket))
      .drop("__b", "__off")
  }
}
