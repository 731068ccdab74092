package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch-family aggregates — and, since r16,
  * the spec-side home of the DEMOTED raw-estimate forms of x02/x03
  * (the dd04/nn02 pattern): the registered x02/x03 rows are now
  * grouped bound queries the DuckDB oracle hash-checks, so the raw
  * global estimates (whose values legitimately differ between
  * engines' sketch internals) live here, asserted against exact
  * answers within their documented error on real data. */
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

  test("raw x03 quartile array (demoted form) within 2% relative of exact") {
    val ords = Tables.orders(spark, sfDir)
    val qs = Seq(0.25, 0.5, 0.75)
    val exact = ords.agg(percentile(col("o_totalprice"),
      array(qs.map(lit): _*))).head().getSeq[Double](0)
    val approx = ords.agg(approx_percentile(col("o_totalprice"),
      array(qs.map(lit): _*), lit(1000))).head().getSeq[Double](0)
    qs.indices.foreach { i =>
      assert(math.abs(approx(i) - exact(i)) / exact(i) < 0.02,
        s"q=${qs(i)}: approx ${approx(i)} vs exact ${exact(i)}")
    }
  }

  test("raw x02 per-column HLL estimates (demoted form) within 5% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL off by ${math.abs(approx - exact) / exact}")
  }
}
