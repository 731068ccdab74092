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

  test("asof forward: earliest at-or-after right; earlier rights never match") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1.0),  // before both → never matches
      ("u1", ts("2024-01-01 10:00:00"), 2.0),  // equal instant → matches id 1
      ("u1", ts("2024-01-01 11:00:00"), 3.0))  // skipped by id 1, too early for id 2
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofForward(left, right, Seq("k"), "t", "t")
      .select("id", "right_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(2.0))   // equal timestamps match (>= semantics)
    assert(got(2L).isEmpty)         // nothing at or after 12:00
    assert(got(3L).isEmpty)         // key isolation
  }

  test("asof tolerance: stale matches degrade to null; fresh and boundary survive") {
    val left = Seq(
      (1L, "u1", ts("2024-01-02 10:00:00")),   // 1h after right → fresh
      (2L, "u1", ts("2024-01-05 10:00:00")),   // 3d1h after → stale
      (3L, "u2", ts("2024-01-02 09:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-02 09:00:00"), 1.0),
      ("u2", ts("2024-01-01 09:00:00"), 2.0))  // exactly 24h before id 3
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofWithin(left, right, Seq("k"), "t", "t",
      org.apache.spark.sql.functions.expr("INTERVAL '1' DAY"))
      .select("id", "right_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).isEmpty)          // matched by asof but outside tolerance
    assert(got(3L).contains(2.0))    // boundary: exactly the tolerance (<=)
  }

  test("interval overlap: brute-force parity, touching endpoints, emit-once") {
    val rnd = new scala.util.Random(7)
    val as = (1 to 80).map(i => (i.toLong, {
      val lo = rnd.nextInt(400).toLong; (lo, lo + rnd.nextInt(30)) }))
      .map { case (id, (lo, hi)) => (id, lo, hi) }
    val bs = (1 to 80).map(i => (i.toLong + 1000, {
      val lo = rnd.nextInt(400).toLong; (lo, lo + rnd.nextInt(30)) }))
      .map { case (id, (lo, hi)) => (id, lo, hi) }
    // plus a deterministic touching pair (hi == lo) and a disjoint pair
    val aDf = (as :+ (900L, 500L, 510L) :+ (901L, 600L, 601L))
      .toDF("aid", "lo", "hi")
    val bDf = (bs :+ (1900L, 510L, 512L) :+ (1901L, 700L, 701L))
      .toDF("bid", "b_lo", "b_hi")
    def run(w: Long) = IntervalJoin
      .overlapPairs(aDf, bDf, "lo", "hi", "b_lo", "b_hi", w)
      .select("aid", "bid").as[(Long, Long)].collect()
    val got = run(32)
    val brute = (for {
      (a, alo, ahi) <- as :+ (900L, 500L, 510L) :+ (901L, 600L, 601L)
      (b, blo, bhi) <- bs :+ (1900L, 510L, 512L) :+ (1901L, 700L, 701L)
      if alo <= bhi && blo <= ahi
    } yield (a, b)).toSet
    assert(got.toSet == brute)
    assert(got.length == got.toSet.size, "each pair must be emitted exactly once")
    assert(got.toSet.contains((900L, 1900L)), "touching endpoints overlap (closed intervals)")
    assert(!got.toSet.contains((901L, 1901L)))
    // bucket width is a sizing knob, never a semantics knob
    assert(run(1000).toSet == brute)
  }
}
