package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: empty right side null-extends every left row") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val right = Seq.empty[(String, Timestamp, Double)].toDF("k", "t", "v")
    val got = AsOfJoin.asof(left, right, Seq("k"), "t", "t")
    assert(got.count() == 1)
    assert(got.filter(col("right_v").isNull && col("right_t").isNull).count() == 1)
  }

  test("asof: equal timestamps match (<= semantics); later rights don't") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 09:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 99.0),
      ("u1", ts("2024-01-01 09:30:00"), 50.0)).toDF("k", "t", "v")
    val got = AsOfJoin.asof(left, right, Seq("k"), "t", "t")
      .select("id", "right_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(99.0)) // equal instant matches
    assert(got(2L).isEmpty)        // 09:00 has no prior right
  }

  test("asof: keys never mix") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(("b", ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "t", "v")
    val got = AsOfJoin.asof(left, right, Seq("k"), "t", "t")
    assert(got.filter(col("right_v").isNotNull).count() == 0)
  }

  test("band join: brute-force parity on generated data, incl. boundary") {
    val rows = (0 until 200).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 7321L)) // ~7.3s apart
    }
    val df = rows.toDF("id", "t")
    val eps = 15L // seconds; some pairs land exactly n*7.321 apart
    val got = BandJoin.bandPairs(
      df.select(col("id").as("id1"), col("t").as("t1")),
      df.select(col("id").as("id2"), col("t").as("t2")),
      "t1", "t2", eps)
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val brute = (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      if math.abs(ta.getTime - tb.getTime) <= eps * 1000
    } yield (a, b)).toSet
    assert(got == brute)
  }
}
