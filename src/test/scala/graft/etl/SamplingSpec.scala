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

  test("portable (md5) split partitions, is stable, and differs from xxhash flavor") {
    val docs = Tables.documents(spark, sfDir)
    val p1 = Sampling.trainTestSplit(docs, "doc_id", 200, portable = true)
    val p2 = Sampling.trainTestSplit(docs, "doc_id", 200, portable = true)
    assert(p1.count() == docs.count())
    assert(p1.exceptAll(p2).count() == 0 && p2.exceptAll(p1).count() == 0)
    val rate = p1.filter($"split" === "test").count().toDouble / docs.count()
    assert(rate > 0.1 && rate < 0.3, s"portable test rate $rate")
    // known-value pin: the same bucket any md5-capable engine computes
    // for key 123, salt "graft" (cross-checked against DuckDB)
    val b = spark.sql(
      "SELECT pmod(CAST(conv(substring(md5('graft123'), 1, 15), 16, 10) AS BIGINT), 1000)")
      .head().getLong(0)
    assert(b == 553L, s"portable bucket drifted: $b")
  }

  test("stratified sample applies per-stratum rates and stays key-stable") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500), defaultPermille = 100)
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500), defaultPermille = 100)
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).count() == 0)
    val rates = s1.groupBy("lang").count()
      .join(docs.groupBy("lang").count().withColumnRenamed("count", "total"), "lang")
      .select($"lang", ($"count" / $"total").as("rate"))
      .as[(String, Double)].collect().toMap
    assert(rates("en") > 0.3 && rates("en") < 0.7, s"en rate ${rates("en")}")
    rates.filterNot(_._1 == "en").foreach { case (l, r) =>
      assert(r < 0.3, s"$l rate $r should be ~0.1")
    }
  }
}
