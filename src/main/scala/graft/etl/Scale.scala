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

  /** Morton (z-order) value: bit-interleave the low `bitsPer` bits of
    * two non-negative integer columns — bit i of `x` lands at position
    * 2i, bit i of `y` at 2i+1. Built entirely from codegen'd bitwise
    * built-ins (shift/and/or), so the z-value computes scan-side inside
    * whole-stage codegen; no UDF, no custom expression needed.
    *
    * Why: range-clustering on ONE key (writeClustered) gives perfect
    * pruning on that key and ZERO pruning on any other. Sorting by the
    * interleaved value instead makes every contiguous z-range a small
    * axis-aligned rectangle in (x, y) space, so parquet min/max stats
    * prune usefully for predicates on EITHER dimension (~√ of the file
    * count for a single-dim slice) — the standard multi-dimensional
    * layout trick for 100 TB tables with more than one hot filter
    * column. Values above 2^bitsPer−1 truncate (high bits ignored):
    * acceptable for LAYOUT, which may never affect query answers. */
  def zValue2(x: Column, y: Column, bitsPer: Int = 16): Column = {
    require(bitsPer >= 1 && bitsPer <= 31, s"bitsPer must be in [1,31], got $bitsPer")
    val xs = x.cast("bigint")
    val ys = y.cast("bigint")
    (0 until bitsPer).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write z-ORDERED on (xCol, yCol): rows range-partitioned and sorted
    * by the interleaved [[zValue2]] of both columns NORMALIZED to the
    * same `bitsPer`-bit domain, z-value dropped before write.
    *
    * Normalization is the step that makes interleaving work on real
    * keys: raw domains are never the same width (a 10-value suppkey vs
    * a 10⁹-value partkey), and interleaving raw bits parks the narrow
    * dimension entirely in the low bit positions — which every file
    * then spans, so its pruning is ZERO. Range-scaling each column to
    * [0, 2^bitsPer) first (integer arithmetic off a one-pass min/max of
    * the frame being rewritten — a cheap pre-scan of a write job)
    * gives both dimensions equal bit-weight, so each output file is a
    * compact rectangle of the 2-D key space and min/max stats prune a
    * single-dim slice to ~√(file count) files. Same contract as
    * [[writeClustered]]: layout changes bytes on disk, never one row of
    * any answer. */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
                    nFiles: Int, bitsPer: Int = 8): Unit = {
    val bRow = df.agg(min(col(xCol)).cast("bigint"), max(col(xCol)).cast("bigint"),
      min(col(yCol)).cast("bigint"), max(col(yCol)).cast("bigint")).head()
    // empty input (or all-null keys) → no range; write a degenerate
    // single-bucket layout rather than fail the job
    val b = (0 to 3).map(i => if (bRow.isNullAt(i)) 0L else bRow.getLong(i))
    // double math: overflow-free for any key range under ANSI mode, and
    // sub-ulp rounding can only nudge a row across a bucket boundary —
    // irrelevant for layout
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else (col(c).cast("double") - lit(lo.toDouble)) *
        lit(((1L << bitsPer) - 1).toDouble / (hi - lo))
    val z = zValue2(scaled(xCol, b(0), b(1)), scaled(yCol, b(2), b(3)), bitsPer)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

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
