package graft.text

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

class NormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private val decomposedE = "é"      // e + COMBINING ACUTE
  private val composedE   = "é"       // é
  private val ligatureFi  = "ﬁ"       // ﬁ (compat-decomposes to "fi")

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val df = Seq((1L, s"caf$decomposedE"), (2L, s"caf$composedE"),
      (3L, ligatureFi)).toDF("id", "s")
    val out = df.select(col("id"),
      NormalizeExpr.normalize(col("s"), "NFC").as("nfc"),
      NormalizeExpr.normalize(col("s"), "NFD").as("nfd"),
      NormalizeExpr.normalize(col("s"), "NFKC").as("nfkc"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(out(0)._2 == s"caf$composedE")      // composed under NFC
    assert(out(1)._3 == s"caf$decomposedE")    // decomposed under NFD
    assert(out(0)._4 == s"caf$composedE")
    assert(out(2)._2 == ligatureFi)            // NFC keeps the ligature
    assert(out(2)._4 == "fi")                  // NFKC folds it
  }

  test("null passes through; already-normalized input is unchanged") {
    val df = Seq((1L, Option("plain ascii")), (2L, Option.empty[String]))
      .toDF("id", "s")
    val out = df.select(col("id"),
      NormalizeExpr.normalize(col("s"), "NFC").as("n"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(out(0)._2.contains("plain ascii"))
    assert(out(1)._2.isEmpty)
  }

  test("SQL surface: unicode_normalize registered via GraftExtensions") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      s"SELECT unicode_normalize('$decomposedE', 'NFC') AS n")
      .as[String].head()
    assert(got == composedE)
  }

  test("invalid form fails analysis, not execution") {
    val df = Seq("x").toDF("s")
    val e = intercept[Exception] {
      df.select(NormalizeExpr.normalize(col("s"), "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC") || e.getMessage.contains("NFX"))
  }
}
