package graft.queries

import graft.SparkSpec

/** The audit-mode flag must genuinely widen the probe-scoped queries:
  * full scope processes strictly more input (and in general produces
  * more output) than the probe slice, and turning the flag off restores
  * the scoped plan. Uses the system-property path so one JVM can test
  * both modes. */
class ProbeSpec extends SparkSpec {

  private def withFullScope[A](body: => A): A = {
    System.setProperty("graft.audit.fullScope", "1")
    try body finally System.clearProperty("graft.audit.fullScope")
  }

  test("GRAFT_AUDIT_FULL_SCOPE widens fz02 from the probe slice to the corpus") {
    val scoped = PipelineQueries.fz02PrefixJaccard.fn(spark, sfDir).count()
    val full = withFullScope {
      PipelineQueries.fz02PrefixJaccard.fn(spark, sfDir).count()
    }
    // the engineered near-dup corpus has pairs outside the %5 slice
    assert(full > scoped,
      s"full-scope fz02 ($full pairs) must exceed probe-scoped ($scoped)")
    // and the flag does not leak: scoped again after clearing
    assert(PipelineQueries.fz02PrefixJaccard.fn(spark, sfDir).count() == scoped)
  }

  test("full scope widens the tc01 wedge base") {
    val scoped = GraphQueries.tc01Triangles.fn(spark, sfDir)
    val full = withFullScope { GraphQueries.tc01Triangles.fn(spark, sfDir) }
    val s = scoped.agg(org.apache.spark.sql.functions.sum("n_tri"))
      .head().getLong(0)
    val f = full.agg(org.apache.spark.sql.functions.sum("n_tri"))
      .head().getLong(0)
    assert(f >= s, s"full-scope triangles $f < scoped $s")
  }
}
