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
}
