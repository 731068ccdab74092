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
}
