package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("int() truncation quirk: values in (-1, 0) pass, -1 and below reject") {
    val df = Seq(
      (1L, Some(-0.5)),   // valid — int(-0.5) == 0 (ref: load_hhs.py:104)
      (2L, Some(-1.0)),   // reject
      (3L, Some(-1.5)),   // reject
      (4L, Some(0.0)),    // valid
      (5L, Some(3.2)),    // valid
      (6L, None)          // valid — nulls pass non-negativity
    ).toDF("id", "v")
    val (valid, rejects) = Validation.split(df,
      Seq(Validation.Rule("neg_v", Validation.nonNegativeTruncated(col("v")))))
    assert(valid.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 5L, 6L))
    assert(rejects.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(rejects.select("reject_reason").distinct().as[String].collect().toSeq == Seq("neg_v"))
  }

  test("split is a partition: valid ∪ rejects == input, disjoint") {
    val df = Seq((1L, -5.0), (2L, 5.0), (3L, -0.25)).toDF("id", "v")
    val (valid, rejects) = Validation.split(df,
      Seq(Validation.Rule("neg", Validation.nonNegativeTruncated(col("v")))))
    assert(valid.count() + rejects.count() == df.count())
    assert(valid.join(rejects, Seq("id"), "inner").count() == 0)
  }

  test("first failing rule wins (elif-chain order)") {
    val df = Seq((1L, Option.empty[String], Some(-5.0))).toDF("id", "name", "v")
    val (_, rejects) = Validation.split(df, Seq(
      Validation.Rule("name_null", Validation.notNull(col("name"))),
      Validation.Rule("neg_v", Validation.nonNegativeTruncated(col("v")))))
    assert(rejects.select("reject_reason").as[String].collect().toSeq == Seq("name_null"))
  }
}
