package graft.etl

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("first-occurrence-wins keeps the earliest row per key") {
    val df = Seq(
      ("a", 0L, "first"), ("a", 1L, "second"), ("b", 2L, "only"),
      ("a", 3L, "third")).toDF("k", "ord", "tag")
    val got = Dedup.firstOccurrenceWins(df, Seq("k"), "ord")
      .select("k", "tag").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "first", "b" -> "only"))
  }

  test("first-wins on a row with a non-orderable (map) column takes the semi-join fallback") {
    import org.apache.spark.sql.functions._
    // a MapType column can't ride the min(struct(...)) carry shape —
    // the kernel must fall back to min-order-per-key + left-semi join
    // and still return exactly the first row per key
    val df = Seq(
      ("a", 0L, 10L, Seq(("x", 1))), ("a", 1L, 11L, Seq(("y", 2))),
      ("b", 2L, 12L, Seq(("z", 3))), ("a", 3L, 13L, Seq(("w", 4))))
      .toDF("k", "ord", "tie", "kv")
      .withColumn("props", map_from_entries(col("kv"))).drop("kv")
    val got = Dedup.firstOccurrenceWins(df, Seq("k"), "ord")
    assert(got.count() == 2)
    val rows = got.select("k", "ord").as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 0L, "b" -> 2L))
    // the kept map is the first row's map, not an arbitrary survivor
    val aProps = got.filter(col("k") === "a")
      .select(map_keys(col("props"))).as[Seq[String]].head()
    assert(aProps == Seq("x"))
    // and latest-wins takes the same fallback with max semantics
    val latest = Dedup.latestWins(df, Seq("k"), "ord", "tie")
    assert(latest.filter(col("k") === "a").select("ord").as[Long].head() == 3L)
  }

  test("anti-join drops existing keys; semi-join keeps them; idempotent") {
    val incoming = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val existing = Seq(("b", 99)).toDF("k", "v")
    val fresh = Dedup.antiJoinExisting(incoming, existing, Seq("k"))
    val dups = Dedup.duplicatesOfExisting(incoming, existing, Seq("k"))
    assert(fresh.select("k").as[String].collect().sorted.toSeq == Seq("a", "c"))
    assert(dups.select("k").as[String].collect().toSeq == Seq("b"))
    // idempotence: dedup(dedup(x)) == dedup(x)
    val again = Dedup.antiJoinExisting(fresh, existing, Seq("k"))
    assert(again.count() == fresh.count())
  }

  test("semi-join fallback keeps null keys and null order values (null-safe join)") {
    import org.apache.spark.sql.functions._
    // ADVICE r14 (medium): the fallback's join was null-UNSAFE — a
    // null key group, or a key whose winning orderCol is null, matched
    // nothing and every row of the group vanished, so row counts
    // diverged from the struct branch on the same call. Pin: a corpus
    // with a null key group AND a null-orderCol winner, run through
    // BOTH branches (with/without a MapType column), returns the same
    // keys and the same picked order values.
    val base = Seq(
      (Option("a"), Option(5L), "a5"), (Option("a"), None, "aNull"),
      (None, Option(1L), "n1"), (None, Option(2L), "n2"),
      (Option("b"), Option(7L), "b7"))
      .toDF("k", "ord", "tag")
    val withMap = base.withColumn("props", map(lit("t"), col("tag")))
    val structBranch = Dedup.firstOccurrenceWins(base, Seq("k"), "ord")
      .select("k", "ord", "tag").as[(Option[String], Option[Long], String)]
      .collect().toSet
    val fallback = Dedup.firstOccurrenceWins(withMap, Seq("k"), "ord")
      .select("k", "ord", "tag").as[(Option[String], Option[Long], String)]
      .collect().toSet
    // min(struct) sorts nulls first ascending: key "a" keeps its
    // null-ord row; the null key group survives with its min
    val expect = Set(
      (Option("a"), Option.empty[Long], "aNull"),
      (Option.empty[String], Option(1L), "n1"),
      (Option("b"), Option(7L), "b7"))
    assert(structBranch == expect)
    assert(fallback == expect)
  }

  test("degenerate inputs fail fast on every branch") {
    val df = Seq(("a", 1L, 2L)).toDF("k", "ord", "__pick")
    // reserved alias collision — caught before any plan is built
    val e1 = intercept[IllegalArgumentException] {
      Dedup.firstOccurrenceWins(df, Seq("k"), "ord")
    }
    assert(e1.getMessage.contains("__pick"))
    // latestWins with orderCol == tieCol would build a struct with
    // duplicate field names; the distinctness require now guards the
    // struct branch too, not just the fallback (ADVICE r14)
    val df2 = Seq(("a", 1L, "x")).toDF("k", "ord", "v")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.latestWins(df2, Seq("k"), "ord", "ord")
    }
    assert(e2.getMessage.contains("distinct"))
  }
}
