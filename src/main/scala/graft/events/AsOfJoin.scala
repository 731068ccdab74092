package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * the same key and rightTime <= leftTime — the time-series operator
  * Spark's join types don't provide (it IS in DuckDB/Pandas/kdb).
  *
  * Implementation is preference (a) from the custom-operator ladder:
  * COMPOSED from built-ins, no custom SparkPlan needed — union both
  * sides tagged, then a per-key window ordered by time with a RANGE
  * frame carries the latest right payload forward onto left rows.
  *
  * Scale notes: one shuffle on the key (same as any join on the key),
  * per-key time sort inside partitions, no point-in-time subquery per
  * row (the naive correlated form is O(n²) per key; this is O(n log n)).
  * Skewed keys: AQE-split; the frame is bounded by the carried payload
  * (one struct), so state is O(1) per row.
  */
object AsOfJoin {

  /** leftTime/rightTime must be the same orderable type (timestamp).
    * Right columns arrive as `right_<name>`; rows with no prior match
    * get nulls (left-outer as-of semantics). Equal timestamps match
    * (<=), consistent with DuckDB ASOF JOIN's `l.t >= r.t`. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String): DataFrame =
    joined(left, right, keys, leftTime, rightTime, forward = false)

  /** FORWARD as-of: the EARLIEST right row with rightTime >= leftTime —
    * "time to next event" lookups (signup → first purchase). Mirror
    * frame of [[asof]]: currentRow..unboundedFollowing with
    * first(ignoreNulls). Deterministic at equal instants for the same
    * reason as backward: at most one right row per (key, t) after the
    * caller's dedup, and left rows carry a null payload that
    * first(ignoreNulls) skips regardless of peer order. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String): DataFrame =
    joined(left, right, keys, leftTime, rightTime, forward = true)

  private def joined(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     forward: Boolean): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => keys.contains(c))
    val payload = struct(rightPayloadCols.map(col).toIndexedSeq: _*)

    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(1).as("__is_right")
        :+ payload.as("__payload")).toIndexedSeq: _*)
    val taggedLeft = left
      .withColumn("__left_row", struct(left.columns.map(col).toIndexedSeq: _*))
      .select(
        (keys.map(col) :+ col(leftTime).as("__t") :+ lit(0).as("__is_right")
          :+ lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")
          :+ col("__left_row")).toIndexedSeq: _*)
    val unioned = taggedRight.withColumn("__left_row",
      lit(null).cast(taggedLeft.schema("__left_row").dataType))
      .unionByName(taggedLeft)

    // RANGE frame to/from the current time value: rows with equal __t
    // are all in frame regardless of union order → right rows at the
    // same instant are visible to left rows at that instant (the
    // <= / >= contract in either direction).
    val w0 = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col("__t"))
    val (w, pick) =
      if (forward)
        (w0.rangeBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__payload"), ignoreNulls = true))
      else
        (w0.rangeBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__payload"), ignoreNulls = true))
    val carried = unioned.withColumn("__asof", pick.over(w))

    val leftCols = left.columns.map(c => col("__left_row").getField(c).as(c))
    val rightCols = rightPayloadCols.map(c =>
      col("__asof").getField(c).as(s"right_$c"))
    carried.filter(col("__is_right") === 0)
      .select((leftCols ++ rightCols).toIndexedSeq: _*)
  }

  /** Backward as-of with a TOLERANCE bound (pandas merge_asof's
    * `tolerance`): the latest right row at-or-before leftTime still
    * matches only if it is no older than `tolerance`; staler matches
    * degrade to the no-match (all-null payload) case. A post-projection
    * over [[asof]] — the window composition is unchanged, so the plan
    * stays join-free; the timestamp difference compares as an INTERVAL
    * (exact integer µs arithmetic, no float epoch). */
  def asofWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String,
                 tolerance: Column): DataFrame = {
    val base = asof(left, right, keys, leftTime, rightTime)
    val rt = s"right_$rightTime"
    val ok = col(rt).isNotNull && (col(leftTime) - col(rt)) <= tolerance
    val rightOut = right.columns.filterNot(keys.contains).map(c =>
      when(ok, col(s"right_$c")).otherwise(lit(null)).as(s"right_$c"))
    base.select(left.columns.map(col) ++ rightOut: _*)
  }
}
