package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  test("m=1 degenerates to plain k-means on the full vector") {
    val emb = Tables.embeddings(spark, sfDir)
    val pq = ProductQuantizer.encode(emb, dims = 64, m = 1, k = 8, iters = 3)
      .select("vec_id", "code", "d2")
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    val km = QuantizedKMeans.run(emb, k = 8, iters = 3)
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(pq == km)
  }

  test("subspaces quantize independently; codes and errors are exact per slice") {
    // dims=2, m=2 → two 1-dim subspaces. Subspace 0 separates {0,10},
    // subspace 1 separates {0,5}; the four vectors cover all 4 code
    // combinations, with zero error (every value IS a centroid after
    // one update: each cell is a singleton or identical pair).
    // ids 1 and 2 (the k=2 lowest — the init picks) differ in BOTH
    // subspaces, so each codebook starts with two distinct centroids
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 5.0f)),
      (3L, Seq(0.0f, 5.0f)), (4L, Seq(10.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = ProductQuantizer.encode(df, dims = 2, m = 2, k = 2, iters = 2)
      .orderBy("vec_id", "sub_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // codebooks converge to {0, 10e6} (sub 0) and {0, 5e6} (sub 1);
    // every vector lands exactly on a centroid in both subspaces
    assert(got.forall(_._4 == 0L), s"nonzero reconstruction error: $got")
    val codes = got.groupBy(_._1).view.mapValues(
      rs => rs.sortBy(_._2).map(_._3)).toMap
    assert(Set(codes(1L), codes(2L), codes(3L), codes(4L)).size == 4,
      s"4 vectors must take 4 distinct code pairs: $codes")
    // vectors sharing a half share that subspace's code
    assert(codes(1L)(0) == codes(3L)(0) && codes(2L)(0) == codes(4L)(0))
    assert(codes(1L)(1) == codes(4L)(1) && codes(2L)(1) == codes(3L)(1))
  }

  test("declared dims must match the actual vector length (slice truncation guard)") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    // dims=2 divides m=2 cleanly, but the vectors are length 4: without
    // the guard slice() would silently drop half of every vector. The
    // guard rides IN the plan (LazinessSpec: zero jobs at build), so
    // construction succeeds and the raise_error fires at execution.
    val plan = ProductQuantizer.encode(df, dims = 2, m = 2, k = 1, iters = 1)
    val e = intercept[Exception] { plan.collect() }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10).flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(messages.contains("silently truncate"), s"unexpected failure: $messages")
  }

  test("ADC self-distance equals the encode error sum (definitional identity)") {
    // a query that IS a corpus vector scores its own codes at exactly
    // the sum of its per-subspace quantization errors — ADC is exact
    // on the reconstruction, approximate only on the residual
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding")
    val adc = ProductQuantizer.adcTopK(emb, queries,
      dims = 64, m = 4, k = 4, iters = 2, topK = 500)
      .filter($"q_id" === $"vec_id")
      .select($"q_id", $"adist").as[(Long, Long)].collect().toMap
    val err = ProductQuantizer.encode(emb, dims = 64, m = 4, k = 4, iters = 2)
      .filter($"vec_id" % 100 === 0)
      .groupBy("vec_id").agg(sum($"d2").as("err"))
      .as[(Long, Long)].collect().toMap
    assert(adc.nonEmpty && adc == err, s"adc $adc != encode err $err")
  }

  test("ADC top-k is deterministic, complete per query, and sorted by distance") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" % 250 === 0)
      .select($"vec_id".as("q_id"), $"embedding")
    val rows = ProductQuantizer.adcTopK(emb, queries,
      dims = 64, m = 4, k = 4, iters = 2, topK = 5)
      .orderBy("q_id", "adist", "vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 250L) && byQ.values.forall(_.size == 5))
    byQ.values.foreach { rs =>
      assert(rs.map(_._3) == rs.map(_._3).sorted, "not sorted by adist")
    }
  }

  test("rejects m that does not divide dims") {
    val emb = Tables.embeddings(spark, sfDir)
    intercept[IllegalArgumentException] {
      ProductQuantizer.encode(emb, dims = 64, m = 5, k = 4, iters = 1)
    }
  }
}
