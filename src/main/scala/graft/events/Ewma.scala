package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exponentially-weighted moving average per key — the smoothing pass
  * time-series feature pipelines run over event streams (load, price,
  * engagement decay). EWMA is an inherently SEQUENTIAL recursion
  * (acc' = α·x + (1−α)·acc), which no window frame expresses — but per
  * KEY it is a small fold, so the distributed shape is: one shuffle to
  * group by key, an ordered in-group fold via the `aggregate`
  * higher-order function (codegen'd, no UDF). Keys parallelize; the
  * recursion never crosses keys, so nothing else would parallelize
  * anyway.
  *
  * INTEGER-QUANTIZED for engine parity: α = num/den rational, values
  * pre-quantized to integers, each step
  * acc' = (num·x + (den−num)·acc) div den in exact floor division —
  * no float accumulation whose rounding order could drift between
  * engines (DuckDB replays the identical fold with list_reduce and
  * `//`). The EWMA is a convex combination, so the accumulator is
  * bounded by max|x| — no overflow growth across steps.
  *
  * Seeding matches the conventional (and DuckDB list_reduce) choice:
  * acc₀ = first element, fold over the rest.
  */
object Ewma {

  /** Exact floor division a div den for |a| < 2⁵³: a − (a mod den) is
    * divisible, so the double division is exact and cast truncation is
    * the floor (pmod keeps the remainder non-negative, so this is
    * FLOOR division on negatives too, matching `//`). */
  private def floorDiv(a: Column, den: Int): Column =
    ((a - pmod(a, lit(den))) / lit(den)).cast(LongType)

  /** @param df        input rows
    * @param keyCol    grouping key
    * @param orderCols total order within key (must be unique per row)
    * @param xqCol     pre-quantized integer value column
    * @param num α numerator; @param den α denominator (α = num/den)
    * @return (keyCol, n_events, ewma_q) one row per key */
  def quantized(df: DataFrame, keyCol: String, orderCols: Seq[String],
                xqCol: String, num: Int, den: Int): DataFrame = {
    require(num > 0 && num < den, "alpha must be in (0, 1)")
    val k = den - num
    val sorted = array_sort(collect_list(
      struct((orderCols.map(col) :+ col(xqCol)): _*)))
    df.groupBy(col(keyCol))
      .agg(transform(sorted, e => e.getField(xqCol)).as("__xs"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("n_events"),
        aggregate(
          slice(col("__xs"), lit(2), greatest(size(col("__xs")) - 1, lit(0))),
          element_at(col("__xs"), 1),
          (acc, x) => floorDiv(x * lit(num) + acc * lit(k), den))
          .as("ewma_q"))
  }
}
