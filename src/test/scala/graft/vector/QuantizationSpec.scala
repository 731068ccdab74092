package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("codes bounded to [-127,127]; error bounded by scale/2; zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0f, 0f, 0f)), // zero vector: scale 0, all-zero codes
      (3L, Seq(127f))
    ).toDF("vec_id", "embedding")
    val q = Quantization.quantize(df)
      .withColumn("err", Quantization.sq8MaxAbsError(
        col("embedding"), col("qscale"), col("qcodes")))
    val rows = q.select("vec_id", "qscale", "qcodes", "err")
      .as[(Long, Double, Seq[Int], Double)].collect().sortBy(_._1)
    rows.foreach { case (_, scale, codes, err) =>
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(err <= scale / 2 + 1e-12, s"err $err exceeds scale/2 ${scale / 2}")
    }
    assert(rows(1)._3 == Seq(0, 0, 0) && rows(1)._2 == 0.0 && rows(1)._4 == 0.0)
    assert(rows(2)._3 == Seq(127)) // max element always codes to ±127
  }

  test("corpus-wide: every vector's max element codes to ±127 and error ≤ scale/2") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = Quantization.quantize(emb)
      .withColumn("err", Quantization.sq8MaxAbsError(
        col("embedding"), col("qscale"), col("qcodes")))
      .withColumn("absmax", array_max(transform(col("qcodes"), c => abs(c))))
    assert(q.filter(col("qscale") > 0 && col("absmax") =!= 127).count() == 0)
    assert(q.filter(col("err") > col("qscale") / 2 + 1e-12).count() == 0)
  }
}
