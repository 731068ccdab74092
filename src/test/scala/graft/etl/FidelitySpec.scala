package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §7.4 fidelity traps as explicit tests (beyond what the
  * null-free testdata can exercise). */
class FidelitySpec extends SparkSpec {
  import spark.implicits._

  test("trap 3: sum(a+b) null-propagates per row — no accidental coalesce") {
    val df = Seq(
      (Some(1.0), Some(2.0)),   // contributes 3
      (Some(5.0), None),        // contributes NOTHING (a+b is null)
      (None, Some(7.0)),        // contributes NOTHING
      (Some(10.0), Some(20.0))  // contributes 30
    ).toDF("a", "b")
    val got = df.agg(sum($"a" + $"b")).head().getDouble(0)
    assert(got == 33.0) // NOT 45.0 (which a coalesce-to-0 "fix" would give)
  }

  test("trap 4: under ANSI mode plain / ERRORS on zero denominator (like " +
    "Postgres); the engine's ratio queries guard with a NULLIF-style when") {
    val df = Seq(("g1", 1.0, 0.0), ("g2", 4.0, 2.0)).toDF("g", "num", "den")
    intercept[Exception] { // SparkArithmeticException DIVIDE_BY_ZERO
      df.groupBy("g").agg((sum($"num") / sum($"den")).as("r")).collect()
    }
    // the guarded form used by a05/a08: null denominator → null ratio
    val got = df.groupBy("g")
      .agg((sum($"num") / when(sum($"den") =!= 0.0, sum($"den"))).as("r"))
      .select("g", "r").as[(String, Option[Double])].collect().toMap
    assert(got("g1").isEmpty)
    assert(got("g2").contains(2.0))
  }

  test("trap 8: timestamp columns compared as dates truncate consistently") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-05 23:59:59"))
      .toDF("ts")
    assert(df.filter($"ts".cast("date") === lit("2024-03-05").cast("date")).count() == 1)
    assert(df.filter($"ts" === lit("2024-03-05").cast("timestamp")).count() == 0)
  }
}
