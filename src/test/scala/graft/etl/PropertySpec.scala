package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks from SURVEY §5.3: dedup idempotence, validation
  * partition, ratio bounds — over ScalaCheck-generated inputs (sampled
  * deterministically; the scalatest-plus bridge isn't in the offline
  * cache, so sampling is driven manually). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Double)]] =
    Gen.listOfN(60, Gen.zip(
      Gen.oneOf("a", "b", "c", "d", "e"),
      Gen.chooseNum(-10.0, 10.0)))

  private def samples(n: Int): Seq[List[(String, Double)]] =
    (1 to n).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    samples(5).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "ord")
      val once = Dedup.firstOccurrenceWins(df, Seq("k"), "ord")
      val twice = Dedup.firstOccurrenceWins(once, Seq("k"), "ord")
      assert(once.exceptAll(twice).count() == 0)
      assert(twice.exceptAll(once).count() == 0)
    }
  }

  test("validation partition: valid ∪ rejects == input, valid ∩ rejects == ∅") {
    samples(5).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }.toDF("id", "k", "v")
      val (valid, rejects) = Validation.split(df,
        Seq(Validation.Rule("neg", Validation.nonNegativeTruncated(col("v")))))
      assert(valid.count() + rejects.count() == df.count())
      assert(valid.select("id").intersect(rejects.select("id")).count() == 0)
      // reference semantics: exactly the rows truncating below zero reject
      val expectedRejects = rows.count { case (_, v) => v.toLong < 0 }
      assert(rejects.count() == expectedRejects)
    }
  }

  test("ratio-of-sums bounds: 0 < revenue/base <= 1 when discounts in [0,1)") {
    samples(5).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((k, v), i) =>
        (k, math.abs(v) + 1.0, (i % 10) / 100.0) }.toDF("k", "price", "disc")
      val agg = df.groupBy("k").agg(
        (sum(col("price") * (lit(1.0) - col("disc"))) / sum(col("price"))).as("r"))
      agg.select("r").as[Double].collect().foreach { r =>
        assert(r > 0.0 && r <= 1.0)
      }
    }
  }
}
