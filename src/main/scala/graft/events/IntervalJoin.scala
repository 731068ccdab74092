package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join ([a.lo, a.hi] ∩ [b.lo, b.hi] ≠ ∅) as an
  * EQUI-join on coverage buckets — the time-range/genomic-interval
  * sibling of [[BandJoin]]'s point-proximity join.
  *
  * A naive overlap join is a theta join (`a.lo <= b.hi AND b.lo <=
  * a.hi`), which Spark can only execute as a nested-loop — quadratic
  * and broadcast-bound. Bucketizing restores a shuffle hash join: each
  * interval explodes to the width-`w` buckets it covers (≤2 per row
  * when interval length ≤ w, the required contract), the join keys on
  * the bucket, and each qualifying pair is emitted EXACTLY once by
  * keeping only the bucket containing the overlap's left edge
  * (`greatest(a.lo, b.lo) div w`) — no distinct pass, no pair blowup
  * from shared buckets.
  *
  * Coordinates are non-negative integers (epoch days/seconds/µs —
  * `div` truncation equals floor there); both sides' interval lengths
  * must be ≤ `bucketWidth`, checked structurally by the caller (longer
  * intervals → raise w, or split rows). At 100 TB this shuffles each
  * row ≤2× keyed by an 8-byte bucket — the overlap work per bucket is
  * bounded by co-resident intervals, exactly how a production range
  * join (Spark's own range-join hints, Delta's binning) behaves.
  */
object IntervalJoin {

  /** Overlapping pairs of `left` [loL, hiL] × `right` [loR, hiR].
    * Column names must be disjoint across the two inputs (pre-rename
    * one side); all four bound columns are integral, non-negative. */
  def overlapPairs(left: DataFrame, right: DataFrame,
                   loL: String, hiL: String, loR: String, hiR: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = bucketWidth
    val l = left.withColumn("__b",
      explode(expr(s"sequence($loL div $w, $hiL div $w)")))
    val r = right.withColumn("__b",
      explode(expr(s"sequence($loR div $w, $hiR div $w)")))
    l.join(r, "__b")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("__b") === expr(s"greatest($loL, $loR) div $w"))
      .drop("__b")
  }
}
