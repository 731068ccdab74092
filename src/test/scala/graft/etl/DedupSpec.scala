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
}
