package graft.topk

import graft.SparkSpec
import graft.topk.TopKAgg.top_k
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k: ties break to smaller tag; k larger than group is fine") {
    val df = Seq(
      ("g1", 5.0, 10L), ("g1", 5.0, 3L), ("g1", 7.0, 99L), ("g1", 1.0, 1L),
      ("g2", 2.0, 2L)).toDF("g", "v", "t").repartition(4)
    val got = df.groupBy("g").agg(top_k(col("v"), col("t"), 3).as("top"))
      .select(col("g"), col("top")).as[(String, Seq[(Double, Long)])]
      .collect().toMap
    assert(got("g1") == Seq((7.0, 99L), (5.0, 3L), (5.0, 10L))) // tie: tag 3 before 10
    assert(got("g2") == Seq((2.0, 2L)))
  }

  test("heap top-k survives many-partition partial merges identically") {
    val rows = (1 to 10000).map(i => ((i % 7).toString, (i % 100).toDouble, i.toLong))
    val df1 = rows.toDF("g", "v", "t").repartition(1)
    val df64 = rows.toDF("g", "v", "t").repartition(64)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(top_k(col("v"), col("t"), 5).as("top"))
        .select("g", "top").as[(String, Seq[(Double, Long)])].collect().toMap
    assert(run(df1) == run(df64)) // merge order cannot change the result
  }

  test("nulls are skipped, not ranked") {
    val df = Seq((Some(3.0), Some(1L)), (None, Some(2L)), (Some(9.0), None))
      .toDF("v", "t").withColumn("g", lit("x"))
    val got = df.groupBy("g").agg(top_k(col("v"), col("t"), 3).as("top"))
      .select("top").as[Seq[(Double, Long)]].head()
    assert(got == Seq((3.0, 1L)))
  }
}
