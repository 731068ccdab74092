package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[Row] =
    df.orderBy("k").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.toString),
        Option(r.get(3)).map(_.toString), Option(r.get(4)).map(_.toString)))
  private type Row = (String, Long, Option[String], Option[String], Option[String])

  test("merge of batch states equals the from-scratch aggregate (nulls, disjoint keys)") {
    val full = Seq(
      ("a", Some(1.5)), ("a", Some(2.5)), ("a", None),
      ("b", Some(-3.0)), ("b", Some(0.0)),
      ("c", None), // all-null group: count 0, null sum/min/max
      ("d", Some(7.25))
    ).toDF("k", "v")
    val batches = Seq(
      full.filter($"v".isNull || $"v" > 0),   // overlapping, uneven split
      full.filter($"v".isNotNull && $"v" <= 0))
    val merged = batches.map(b => IncrementalAgg.state(b, Seq("k"), "v"))
      .reduce((x, y) => IncrementalAgg.merge(x, y, Seq("k")))
    assert(canon(merged) == canon(IncrementalAgg.state(full, Seq("k"), "v")))
  }

  test("fold of per-partition states over testdata equals one-shot state, any split") {
    val li = graft.Tables.lineitem(spark, sfDir).select("l_returnflag", "l_quantity")
    val oneShot = IncrementalAgg.state(li, Seq("l_returnflag"), "l_quantity")
    for (mod <- Seq(2, 5)) {
      val folded = (0 until mod)
        .map(i => IncrementalAgg.state(
          li.filter(pmod(hash(col("l_quantity")), lit(mod)) === i),
          Seq("l_returnflag"), "l_quantity"))
        .reduce((x, y) => IncrementalAgg.merge(x, y, Seq("l_returnflag")))
      val a = folded.orderBy("l_returnflag").collect().toSeq
      val b = oneShot.orderBy("l_returnflag").collect().toSeq
      assert(a == b, s"fold of $mod batch states diverged from the one-shot aggregate")
    }
  }

  test("result derives avg without perturbing merged exactness") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val r = IncrementalAgg.result(IncrementalAgg.state(df, Seq("k"), "v"))
      .select("k", "n_rows", "sum_v", "avg_v").as[(String, Long, Double, Double)]
      .head()
    assert(r == (("a", 2L, 3.0, 1.5)))
  }
}
