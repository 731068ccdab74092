package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic, key-stable, and near the target rate") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Sampling.hashSample(docs, "doc_id", 3, 10).select("doc_id")
    val s2 = Sampling.hashSample(docs, "doc_id", 3, 10).select("doc_id")
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    val rate = s1.count().toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"rate $rate far from 0.3")
    // subset property: 3/10 sample ⊂ 7/10 sample
    val bigger = Sampling.hashSample(docs, "doc_id", 7, 10).select("doc_id")
    assert(s1.exceptAll(bigger).count() == 0)
  }

  test("train/test split partitions every row exactly once; different salt reshuffles") {
    val docs = Tables.documents(spark, sfDir)
    val split = Sampling.trainTestSplit(docs, "doc_id", testPermille = 200)
    assert(split.count() == docs.count())
    assert(split.groupBy("split").count().count() == 2)
    val testRate = split.filter($"split" === "test").count().toDouble / docs.count()
    assert(testRate > 0.1 && testRate < 0.3, s"test rate $testRate")
    val other = Sampling.trainTestSplit(docs, "doc_id", 200, salt = "other")
    val moved = split.filter($"split" === "test").select("doc_id")
      .exceptAll(other.filter($"split" === "test").select("doc_id")).count()
    assert(moved > 0) // salt actually changes membership
  }
}
