package graft.text

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // expected values probed from DuckDB's independent
  // jaro_winkler_similarity this round — the fz03 oracle's engine —
  // covering the window, half-transposition count, prefix boost, and
  // the 0.7 boost gate ('aaa'/'abcd' has jaro 0.528 and a 1-char
  // common prefix: a gateless implementation would emit 0.575)
  private val cases = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.84),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("abc", "xyz", 0.0),
    ("aaa", "abcd", 0.5277777777777778),
    ("a", "", 0.0),
    ("", "", 0.0),
    ("ab", "ab", 1.0),
    ("CRATES", "CARTES", 0.95),
    ("abcdefgh", "abdcefhg", 0.9333333333333333),
    ("PENNSYLVANIA", "PENNCISYLVANIA", 0.9214285714285715))

  test("matches DuckDB's jaro_winkler_similarity on the probe set") {
    cases.foreach { case (a, b, want) =>
      val got = JaroWinklerExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-9, s"jw('$a','$b') = $got, want $want")
      // symmetry
      val rev = JaroWinklerExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(math.abs(rev - got) < 1e-15, s"jw not symmetric on '$a'/'$b'")
    }
  }

  test("fz03's threshold separates transpositions from substitutions") {
    // adjacent-digit swap vs single substitution on the name domain
    val swap = JaroWinklerExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("Supplier#000000012"),
      org.apache.spark.unsafe.types.UTF8String.fromString("Supplier#000000021"))
    val sub = JaroWinklerExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("Supplier#000000011"),
      org.apache.spark.unsafe.types.UTF8String.fromString("Supplier#000000012"))
    assert(math.abs(swap - 0.9888888888888889) < 1e-9)
    assert(math.abs(sub - 0.9777777777777777) < 1e-9)
    assert(swap >= 0.985 && sub < 0.985)
  }

  test("column surface evaluates under codegen; null propagates") {
    val df = Seq((1L, Option("martha"), Option("marhta")),
      (2L, Option("abc"), Option.empty[String]))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
      JaroWinklerExpr.jaroWinkler(col("a"), col("b")).as("s"))
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(math.abs(out(0)._2.get - 0.9611111111111111) < 1e-9)
    assert(out(1)._2.isEmpty)
  }

  test("SQL surface: jaro_winkler registered via GraftExtensions") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
      .as[Double].head()
    assert(math.abs(got - 0.9611111111111111) < 1e-9)
  }
}
