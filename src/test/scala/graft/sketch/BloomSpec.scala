package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val NumBits = 1 << 16
  private val K = 5

  test("no false negatives: every inserted key probes true") {
    val keys = (0 until 2000).map(i => graft.util.Hashing.splitmix64(i.toLong))
    val blob = keys.toDF("k")
      .agg(Bloom.bloom_agg(col("k"), NumBits, K)).as[Array[Byte]].head()
    assert(keys.forall(Bloom.mightContain(blob, K, _)),
      "bloom filter produced a false negative")
  }

  test("false-positive rate stays near the analytic bound") {
    val n = 2000
    val blob = (0 until n).map(i => graft.util.Hashing.splitmix64(i.toLong))
      .toDF("k").agg(Bloom.bloom_agg(col("k"), NumBits, K)).as[Array[Byte]].head()
    val probes = 20000
    val fp = (0 until probes).count(i =>
      Bloom.mightContain(blob, K, graft.util.Hashing.splitmix64((i + 1000000).toLong)))
    val analytic = math.pow(1 - math.exp(-K.toDouble * n / NumBits), K)
    assert(fp.toDouble / probes <= analytic * 3 + 0.01,
      s"fp rate ${fp.toDouble / probes} far above analytic bound $analytic")
  }

  test("distributed build (partial OR-merge) equals single-partition build") {
    val df = (0 until 5000).map(i => graft.util.Hashing.splitmix64(i.toLong)).toDF("k")
    val merged = df.repartition(8)
      .agg(Bloom.bloom_agg(col("k"), NumBits, K)).as[Array[Byte]].head()
    val single = df.coalesce(1)
      .agg(Bloom.bloom_agg(col("k"), NumBits, K)).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(merged, single),
      "OR-merged partial blooms differ from the single-partition build")
  }

  test("probe column (codegen path) agrees with direct static calls; null semantics") {
    val keys = (0 until 500).map(_.toLong * 7919 - 1000)
    val blobDf = keys.filter(_ % 3 == 0).toDF("k")
      .agg(Bloom.bloom_agg(col("k"), NumBits, K).as("bf"))
    val got = keys.toDF("k").crossJoin(broadcast(blobDf))
      .select(col("k"), Bloom.might_contain(col("k"), col("bf"), K).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    val blob = blobDf.as[Array[Byte]].head()
    keys.foreach { x =>
      assert(got(x) == Bloom.mightContain(blob, K, x),
        s"codegen/static divergence at key $x")
      if (x % 3 == 0) assert(got(x), s"false negative for inserted key $x")
    }
    // null key → null probe → filtered out, like a semi join would
    val inserted = keys.find(_ % 3 == 0).get
    val n = Seq[Option[Long]](Some(inserted), None).toDF("k")
      .crossJoin(broadcast(blobDf))
      .filter(Bloom.might_contain(col("k"), col("bf"), K)).count()
    assert(n == 1L)
  }

  test("orBlobs is the exact idempotent merge; empty sides are identities") {
    def blobOf(ks: Seq[Long]) = ks.toDF("k")
      .agg(Bloom.bloom_agg(col("k"), 1 << 12, 5).as("b"))
      .as[Array[Byte]].head()
    val a = blobOf(Seq(1L, 2L, 3L))
    val b = blobOf(Seq(3L, 9L, 40L))
    val merged = Bloom.orBlobs(a, b)
    assert(merged.sameElements(blobOf(Seq(1L, 2L, 3L, 9L, 40L))),
      "bloom(A)|bloom(B) != bloom(A ++ B)")
    assert(Bloom.orBlobs(merged, merged).sameElements(merged), "not idempotent")
    assert(Bloom.orBlobs(Array.emptyByteArray, a).sameElements(a))
    assert(Bloom.orBlobs(a, Array.emptyByteArray).sameElements(a))
    intercept[IllegalArgumentException] {
      Bloom.orBlobs(a, new Array[Byte](8))
    }
  }

  test("dc02 equivalence: bloom-pruned keep-list equals exact anti-join keep-list") {
    val docs = graft.Tables.documents(spark, sfDir)
    val grams = docs.select(col("doc_id"),
      explode(graft.text.ShingleHashesExpr.shingleHashes(
        graft.text.TextFunctions.tokens(col("text")), 3)).as("g"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val exactContam = grams.filter(col("doc_id") % 97 =!= 0)
      .join(bench, Seq("g"), "left_semi").select("doc_id").distinct()
    val exactKept = docs.filter(col("doc_id") % 97 =!= 0)
      .join(exactContam, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloomKept = graft.queries.TextQueries.dc02BloomDecontamination
      .fn(spark, sfDir).select("doc_id").as[Long].collect().toSeq
    assert(bloomKept == exactKept,
      "bloom-pruned decontamination diverged from the exact pipeline")
    assert(exactKept.nonEmpty, "degenerate fixture: empty keep-list proves nothing")
  }
}
