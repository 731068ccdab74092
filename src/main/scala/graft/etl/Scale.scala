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

  /** Write range-CLUSTERED by `clusterCols`: rows are range-partitioned
    * across `nFiles` files and sorted within each, so every file covers
    * a narrow, non-overlapping slice of the cluster-key space. Parquet
    * then records tight min/max stats per file/row-group, and a
    * selective predicate on the cluster key prunes to the one or two
    * files whose range can match — data skipping at the storage layer,
    * the single biggest scan lever at 100 TB after partitioning (use
    * partitionBy for low-cardinality keys like dates, clustering for
    * high-cardinality keys like ids). ClusteredSpec proves the
    * locality: a key-range filter touches ≤2 files clustered vs nearly
    * all files unclustered. */
  def writeClustered(df: DataFrame, dir: String, clusterCols: Seq[String],
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)

  /** Compact a parquet directory to ~`targetFileBytes` output files —
    * the small-files pass every long-lived warehouse needs: streaming
    * micro-batches, per-load appends, and over-parallel writes leave
    * thousands of KB-scale files whose open/footer costs dominate scans
    * and whose listing hammers the metastore/namenode at 100 TB.
    *
    * File count derives from the directory's actual on-disk bytes (file
    * listing only — no data read) and repartitioning is a round-robin
    * rebalance: no key shuffle, parallel write, even output sizes.
    * Returns (filesBefore, filesAfter). Compaction rewrites in place
    * via a temp dir, then swaps add-first/delete-last: new files rename
    * in before any old file is deleted, so a crash at ANY point leaves
    * the directory with at least one complete copy of the data (briefly
    * both — a concurrent reader listing mid-swap may double-count, but
    * never sees an empty or partial directory). A leftover temp dir
    * from an interrupted run is an error, not something to silently
    * destroy: it may hold the about-to-be-swapped copy. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    require(!fs.exists(tmp),
      s"$tmp exists — a previous compaction was interrupted; the live dir " +
        "still holds a complete old generation, so inspect and DELETE the " +
        "leftover temp dir (do not rename its files in — any that were " +
        "already swapped would be double-added) before compacting again")
    val before = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val out = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    // part-file names carry a per-job UUID, so renaming into the live
    // dir cannot collide with the old generation's names. rename can
    // still fail by RETURNING FALSE (HDFS does for e.g. a missing dest
    // parent) — on failure, roll the already-swapped files BACK to tmp
    // so the live dir again holds exactly the intact old generation
    // (readers never keep seeing old+partial-new duplicates), then
    // abort with tmp intact for the leftover-tmp guard to surface.
    val swapped = scala.collection.mutable.ArrayBuffer
      .empty[(org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)]
    out.foreach { f =>
      val dest = new org.apache.hadoop.fs.Path(path, f.getPath.getName)
      if (!fs.rename(f.getPath, dest)) {
        val unrolled = swapped.reverseIterator
          .count { case (src, d) => fs.rename(d, src) }
        throw new IllegalStateException(
          s"compact aborted: rename ${f.getPath} -> $dest failed; " +
            s"rolled back $unrolled/${swapped.size} already-swapped files " +
            s"to $tmp — live dir holds the intact old generation" +
            (if (unrolled < swapped.size)
              s" PLUS ${swapped.size - unrolled} new files that also failed to " +
                "roll back (duplicates until removed)"
            else ""))
      }
      swapped += ((f.getPath, dest))
    }
    before.foreach(f => fs.delete(f.getPath, false))
    fs.delete(tmp, true)
    (before.length, out.length)
  }
}
