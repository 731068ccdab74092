package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 4096

  test("exact when width dwarfs the key space (no row collides)") {
    val df = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val sk = df.agg(CountMin.cm_agg(col("k"), D, W).as("cms"))
    val got = (1L to 50L).toDF("k").crossJoin(sk)
      .select(col("k"), CountMin.cm_estimate(col("k"), col("cms"), D).as("est"))
      .as[(Long, Long)].collect().toMap
    (1L to 50L).foreach(k => assert(got(k) == k, s"key $k"))
  }

  test("estimate never undercounts (one-sided guarantee), any width") {
    val narrow = 16 // heavy collisions on purpose
    val df = (1L to 500L).map(k => k % 37).toDF("k")
    val exact = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    val sk = df.agg(CountMin.cm_agg(col("k"), 3, narrow).as("cms"))
    val got = exact.keys.toSeq.toDF("k").crossJoin(sk)
      .select(col("k"), CountMin.cm_estimate(col("k"), col("cms"), 3).as("est"))
      .as[(Long, Long)].collect()
    got.foreach { case (k, est) => assert(est >= exact(k), s"key $k undercounted") }
  }

  test("merge is exact: partitioning never changes the blob") {
    val df = (1L to 3000L).map(k => k % 101).toDF("k")
    def blob(parts: Int) = df.repartition(parts)
      .agg(CountMin.cm_agg(col("k"), D, W).as("cms"))
      .as[Array[Byte]].head()
    val one = blob(1)
    val many = blob(13)
    assert(java.util.Arrays.equals(one, many),
      "CMS blob must be identical under any partitioning (elementwise-add merge)")
  }

  test("group-by path (partial/final with serialization) matches global") {
    val df = (1L to 2000L).map(k => (k % 2, k % 53)).toDF("g", "k")
    val per = df.groupBy("g").agg(CountMin.cm_agg(col("k"), D, W).as("cms"))
    // probing each group's sketch for a key present only via that group
    val est = per.select(col("g"),
      CountMin.cm_estimate(lit(0L), col("cms"), D).as("est0"))
      .as[(Long, Long)].collect().toMap
    val exact = df.filter(col("k") === 0).groupBy("g").count()
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (g, n) => assert(est(g) == n, s"group $g") }
  }

  test("null keys are skipped") {
    val df = Seq(Some(1L), None, Some(1L), None).toDF("k")
    val sk = df.agg(CountMin.cm_agg(col("k"), D, W).as("cms"))
    val est = sk.select(CountMin.cm_estimate(lit(1L), col("cms"), D))
      .as[Long].head()
    assert(est == 2L)
  }

  test("addBlobs is the exact linear merge; empty sides are identities") {
    def blobOf(ks: Seq[Long]) = ks.toDF("k")
      .agg(CountMin.cm_agg(col("k"), D, W).as("cms"))
      .as[Array[Byte]].head()
    val a = Seq(1L, 2L, 2L, 3L)
    val b = Seq(2L, 3L, 3L, 9L)
    val merged = CountMin.addBlobs(blobOf(a), blobOf(b))
    val whole = blobOf(a ++ b)
    assert(merged.sameElements(whole), "CMS(A)+CMS(B) != CMS(A ++ B)")
    assert(CountMin.addBlobs(Array.emptyByteArray, whole).sameElements(whole))
    assert(CountMin.addBlobs(whole, Array.emptyByteArray).sameElements(whole))
    intercept[IllegalArgumentException] {
      CountMin.addBlobs(whole, new Array[Byte](8))
    }
  }
}
