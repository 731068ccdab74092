package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packs are contiguous, ordered, and cut at the token budget") {
    // weights: 100, 100, 100 → prev 0, 100, 200 → pack 0, 0, 0 (budget 256? no:
    // prev 200 < 256 → pack 0); fourth doc prev 300 → pack 1
    val df = Seq(("s", 1L, 100L), ("s", 2L, 100L), ("s", 3L, 100L), ("s", 4L, 100L))
      .toDF("source", "doc_id", "w")
    val packed = Packing.packByBudget(df, Seq("source"), "doc_id", col("w"), 256L)
      .orderBy("doc_id").select("doc_id", "pack_id").as[(Long, Long)].collect()
    assert(packed.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
  }

  test("partitions pack independently; pack ids restart per partition") {
    val df = Seq(("a", 1L, 300L), ("a", 2L, 10L), ("b", 3L, 10L))
      .toDF("source", "doc_id", "w")
    val packed = Packing.packByBudget(df, Seq("source"), "doc_id", col("w"), 256L)
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "pack_id").as[(String, Long, Long)].collect()
    // a: prev 0 → pack 0; prev 300 → pack 1. b: prev 0 → pack 0.
    assert(packed.toSeq == Seq(("a", 1L, 0L), ("a", 2L, 1L), ("b", 3L, 0L)))
  }

  test("pack ids are dense from 0 and every doc is assigned") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("w"))
    val packed = Packing.packByBudget(docs, Seq("source"), "doc_id", col("w"), 256L)
    assert(packed.count() == docs.count())
    val perSource = packed.groupBy("source")
      .agg(min("pack_id").as("mn"), countDistinct("pack_id").as("nd"),
        (max("pack_id") + 1).as("mx1"))
    assert(perSource.filter(col("mn") =!= 0 || col("nd") =!= col("mx1")).count() == 0)
  }
}
