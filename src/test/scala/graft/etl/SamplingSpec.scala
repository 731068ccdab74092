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

  test("mixture resample: binding stratum kept whole, composition near target") {
    val docs = Tables.documents(spark, sfDir)
    val target = Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.1, "de" -> 0.1, "fr" -> 0.1)
    val kept = Sampling.mixtureResample(docs, "doc_id", "lang", target)
    val keptBy = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totBy = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // the binding stratum (min n/w) survives in full
    val binding = totBy.map { case (l, n) => l -> n / target(l) }.minBy(_._2)._1
    assert(keptBy(binding) == totBy(binding),
      s"binding stratum $binding downsampled: ${keptBy(binding)} of ${totBy(binding)}")
    // achieved mixture tracks the target within hash-sampling noise
    val total = keptBy.values.sum.toDouble
    target.foreach { case (l, w) =>
      val achieved = keptBy.getOrElse(l, 0L) / total
      assert(math.abs(achieved - w) < 0.05, s"$l achieved $achieved vs target $w")
    }
    // deterministic + a strict subset of the corpus
    val again = Sampling.mixtureResample(docs, "doc_id", "lang", target)
    assert(kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
    assert(kept.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0)
    // strata outside the whitelist are dropped entirely
    val partial = Sampling.mixtureResample(docs, "doc_id", "lang", Map("en" -> 1.0))
    assert(partial.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("mixture resample: binding-stratum threshold clamps to 1e6 despite FP floor") {
    // With n=3, w=0.7 the binding rate (n/w)·w/n evaluates to
    // 0.9999999999999999 in doubles, flooring to 999_999 — which would
    // drop exactly the rows whose portable bucket is 999_999. Hunt such
    // a key off-Spark (same md5 construction as Sampling.bucket) and
    // prove it survives.
    def bucketOf(stratum: String, key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("graft" + stratum + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
    }
    // sanity: the FP hazard is real for these counts/weights
    val m = 3.0 / 0.7
    assert(math.floor(m * 0.7 / 3.0 * 1000000).toLong == 999999L)
    val hot = (1 to 3000000).view.map(i => s"k$i")
      .find(k => bucketOf("a", k) == 999999L).get
    val rows = Seq(("a", hot), ("a", "other1"), ("a", "other2")) ++
      (1 to 1000).map(i => ("b", s"b$i"))
    val df = rows.toDF("lang", "doc_id")
    val kept = Sampling.mixtureResample(df, "doc_id", "lang",
      Map("a" -> 0.7, "b" -> 0.3))
    // binding stratum is a (3/0.7≈4.3 < 1000/0.3); ALL its rows survive,
    // including the bucket-999999 key the un-clamped floor would drop
    val keptA = kept.filter($"lang" === "a").select("doc_id")
      .as[String].collect().toSet
    assert(keptA == Set(hot, "other1", "other2"),
      s"binding stratum lost rows: kept $keptA")
  }

  test("approx top-fraction: threshold semantics, superset of exact rank cut, no stragglers") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source",
        graft.text.TextFunctions.qualityScore($"text").as("quality"))
    val approx = Sampling.approxTopFractionByStratum(
      docs, Seq("lang", "source"), "quality", frac = 0.25)
    val exact = Sampling.topFractionByStratum(
      docs, Seq("lang", "source"), "quality", "doc_id", frac = 0.25)
    // every exact-rank keeper also clears the quantile threshold (ties
    // at the threshold only ADD rows, never drop a top-ranked one)
    assert(exact.select("doc_id").exceptAll(approx.select("doc_id")).count() == 0,
      "approx filter dropped a row the exact rank cut keeps")
    // threshold semantics: per stratum, min kept score >= max dropped score
    val keptMin = approx.groupBy("lang", "source")
      .agg(min(round($"quality", 6)).as("kmin"))
    val dropped = docs.join(approx.select("doc_id", "lang", "source")
      .withColumn("__k", lit(1)), Seq("doc_id", "lang", "source"), "left")
      .filter($"__k".isNull)
    val dropMax = dropped.groupBy("lang", "source")
      .agg(max(round($"quality", 6)).as("dmax"))
    assert(keptMin.join(dropMax, Seq("lang", "source"))
      .filter($"kmin" < $"dmax").count() == 0,
      "a dropped row outscored a kept row in the same stratum")
    // kept share tracks frac, inflated only by threshold ties. A stratum
    // whose 6dp-rounded scores are all tied keeps 100% of its rows — that
    // is the documented ties-survive semantics, not a bug — so the band
    // applies only to strata with >1 distinct rounded score and enough
    // rows for the quantile cut to bite.
    val strata = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("total"),
        countDistinct(round($"quality", 6)).as("ndistinct"))
    val shares = approx.groupBy("lang", "source").count()
      .join(strata, Seq("lang", "source"))
      .select(($"count" / $"total").as("share"), $"total", $"ndistinct")
      .as[(Double, Long, Long)].collect()
    shares.foreach { case (s, n, nd) =>
      assert(s <= 1.0 && s > 0.0, s"kept share $s outside (0,1]")
      if (nd > 1 && n >= 8)
        assert(s >= 0.2 && s <= 0.7,
          s"kept share $s out of band (n=$n, distinct scores=$nd)")
    }
    // the band must actually have been exercised on this data
    assert(shares.exists { case (_, n, nd) => nd > 1 && n >= 8 },
      "no stratum qualified for the share-band assertion")
  }

  test("approx top-fraction: discrete-quantile convention pinned on rank boundaries; requireExact guard fires") {
    // integer-rank boundary (n divisible by 4, frac=0.25): the (1-frac)-
    // quantile rank q*n = 6 is exact. Pin WHICH element the sketch picks
    // (the 6th ascending, 0.6) — DuckDB quantile_disc(0.75) picks the
    // same one (round-half-up of (n-1)*q = 5.25 -> 0-based index 5), so
    // qf02's cross-engine exactness rests on this convention.
    val n8 = Seq.tabulate(8)(i => ("a", i.toLong, (i + 1) * 0.1))
      .toDF("stratum", "id", "score")
    val kept8 = Sampling.approxTopFractionByStratum(
      n8, Seq("stratum"), "score", frac = 0.25, requireExact = true)
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept8 == Seq(5L, 6L, 7L), s"n=8 kept $kept8: threshold element drifted")
    // half-rank boundary (n=7, (n-1)*q = 4.5): both engines round UP to
    // the 6th ascending element (0.6) -> keep the top 2
    val n7 = Seq.tabulate(7)(i => ("a", i.toLong, (i + 1) * 0.1))
      .toDF("stratum", "id", "score")
    val kept7 = Sampling.approxTopFractionByStratum(
      n7, Seq("stratum"), "score", frac = 0.25, requireExact = true)
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept7 == Seq(5L, 6L), s"n=7 kept $kept7: threshold element drifted")
    // requireExact fails LOUDLY once a stratum outgrows the sketch
    // accuracy, instead of silently going approximate under the oracle
    val err = intercept[Exception] {
      Sampling.approxTopFractionByStratum(
        n8, Seq("stratum"), "score", frac = 0.25,
        accuracy = 4, requireExact = true).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("exceeds accuracy")),
      s"unexpected failure: $err")
  }

  test("top-fraction-by-stratum keeps exactly floor(frac*n) per stratum, highest scores") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.7), ("a", 4L, 0.6),
      ("a", 5L, 0.5), ("a", 6L, 0.4), ("a", 7L, 0.3), ("a", 8L, 0.2),
      ("b", 9L, 0.1), ("b", 10L, 0.2), ("b", 11L, 0.3), ("b", 12L, 0.4)
    ).toDF("stratum", "id", "score")
    val kept = Sampling.topFractionByStratum(df, Seq("stratum"), "score", "id", 0.25)
      .orderBy("id").as[(String, Long, Double)].collect().toSeq
    // cume_dist = k/n <= 0.25 with a total order keeps the floor(n/4) best
    assert(kept == Seq(("a", 1L, 0.9), ("a", 2L, 0.8), ("b", 12L, 0.4)))
    // ties fall to the tiebreak column, not to nondeterminism
    val tied = Seq(("a", 1L, 0.5), ("a", 2L, 0.5), ("a", 3L, 0.5), ("a", 4L, 0.5))
      .toDF("stratum", "id", "score")
    val keptTied = Sampling.topFractionByStratum(tied, Seq("stratum"), "score", "id", 0.5)
      .select("id").as[Long].collect().toSeq.sorted
    assert(keptTied == Seq(1L, 2L))
  }

  test("systematic PPS: exactly k picks per stratum, zero-weight rows never picked") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("a", 5L, 50L), ("a", 6L, 3L), ("a", 7L, 7L), ("a", 8L, 28L),
      ("b", 9L, 1L), ("b", 10L, 1L), ("b", 11L, 1L), ("b", 12L, 1L),
      ("c", 13L, 0L), ("c", 14L, 0L) // all-zero stratum: no picks, no div0
    ).toDF("stratum", "id", "w")
    val picked = Sampling.systematicPps(df, Seq("stratum"), "w", "id", k = 2)
      .select("stratum", "id").as[(String, Long)].collect().toSeq.sorted
    assert(picked.count(_._1 == "a") == 2, s"stratum a must yield k=2 picks, got $picked")
    assert(picked.count(_._1 == "b") == 2)
    assert(!picked.exists(_._1 == "c"), "all-zero-weight stratum must pick nothing")
    assert(!picked.contains(("a", 2L)), "zero-weight row must never be picked")
    // hand-check stratum a (W=100, k=2): darts at floor(W/4)=25 and
    // floor(3W/4)=75 -> intervals [10,11)..? cum: 10,10,11,12,62,65,72,100
    // t0=25 lands in id5's [12,62); t1=75 lands in id8's [72,100)
    assert(picked.filter(_._1 == "a").map(_._2) == Seq(5L, 8L))
    // b uniform weights: darts at 1 and 3 -> rows with lo<=t<hi: id10 ([1,2)), id12 ([3,4))
    assert(picked.filter(_._1 == "b").map(_._2) == Seq(10L, 12L))
  }

  test("systematic PPS: inclusion tracks weight share; heavy rows certain; deterministic") {
    // a row with weight > W/k MUST be selected (its interval spans a stride)
    val df = Seq(("s", 1L, 1L), ("s", 2L, 90L), ("s", 3L, 1L), ("s", 4L, 8L))
      .toDF("stratum", "id", "w")
    val picks = Sampling.systematicPps(df, Seq("stratum"), "w", "id", k = 4)
      .select("id").as[Long].collect().toSeq
    assert(picks.contains(2L), "a row heavier than W/k is always selected")
    // deterministic across partitionings
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
    val a = Sampling.systematicPps(docs, Seq("lang"), "n_chars", "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.systematicPps(docs.repartition(7), Seq("lang"), "n_chars", "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty, "picks must not depend on physical partitioning")
  }
}
