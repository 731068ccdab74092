package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class OrderedShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("global order: pos is the exact rank in the seeded-hash total order") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val ordered = OrderedShuffle.globalOrder(docs, "doc_id", seed = "t")
    val n = docs.count()
    // pos is a permutation of 1..n
    assert(ordered.count() == n)
    assert(ordered.agg(min("pos"), max("pos"), countDistinct("pos"))
      .as[(Long, Long, Long)].head() == ((1L, n, n)))
    // the two-level construction equals the single global window
    val direct = docs
      .withColumn("h", md5(concat(lit("t"), $"doc_id".cast("string"))))
      .withColumn("pos2", row_number().over(Window.orderBy("h")).cast("long"))
    val joined = ordered.join(direct, "doc_id")
    assert(joined.filter($"pos" =!= $"pos2").count() == 0)
    // deterministic across invocations; a different seed reorders
    val again = OrderedShuffle.globalOrder(docs, "doc_id", seed = "t")
    assert(ordered.select("doc_id", "pos")
      .exceptAll(again.select("doc_id", "pos")).count() == 0)
    val other = OrderedShuffle.globalOrder(docs, "doc_id", seed = "u")
    assert(ordered.select("doc_id", "pos")
      .exceptAll(other.select("doc_id", "pos")).count() > 0)
  }

  test("fanout is a sizing knob: any hex prefix length yields the identical order") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val narrow = OrderedShuffle.globalOrder(docs, "doc_id", seed = "t")
    // prefix 4 = 65,536 buckets — the 100 TB parameterization
    val wide = OrderedShuffle.globalOrder(docs, "doc_id", seed = "t",
      hexPrefixLen = 4)
    assert(narrow.select("doc_id", "pos")
      .exceptAll(wide.select("doc_id", "pos")).count() == 0)
    assert(wide.select("doc_id", "pos")
      .exceptAll(narrow.select("doc_id", "pos")).count() == 0)
    // the wide variant really buckets on the 4-char prefix: its bucket
    // space is 16^4 and this corpus hits more than 256 distinct buckets
    val wideBuckets = docs
      .select(substring(md5(concat(lit("t"), $"doc_id".cast("string"))), 1, 4)
        .as("b")).distinct().count()
    assert(wideBuckets > 256 && wideBuckets <= 65536,
      s"expected 4-hex bucketing, saw $wideBuckets distinct buckets")
    // bounds guard: prefix lengths outside [1,8] are rejected
    intercept[IllegalArgumentException] {
      OrderedShuffle.globalOrder(docs, "doc_id", "t", hexPrefixLen = 0)
    }
  }
}
