package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch-family aggregates (the rows-only
  * queries x02/x03): approximate answers must land within their
  * documented error of the exact ones on real data. */
class SketchSpec extends SparkSpec {

  test("HLL++ distinct counts within 5% of exact (rsd 0.01 requested)") {
    val li = Tables.lineitem(spark, sfDir)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL off by ${math.abs(approx - exact) / exact}")
  }

  test("approx_percentile quartiles within 2% relative of exact") {
    val ords = Tables.orders(spark, sfDir)
    val exact = ords.agg(percentile(col("o_totalprice"), lit(0.5))).head().getDouble(0)
    val approx = ords.agg(
      approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx median $approx vs exact $exact")
  }
}
