package graft

/** Runs every physical-plan pin from [[Plans.checks]] under `sbt test`:
  * the 100 TB design properties (pushdown, broadcast shapes, bucketed
  * zero-exchange joins, codegen'd custom expressions, two-stage salted
  * aggregation) regress as TEST FAILURES, not as silent plan drift
  * discovered at the next benchmark read. */
class PlanSpec extends SparkSpec {
  test("every pinned physical-plan property holds") {
    val fails = Plans.failures(spark, sfDir)
    assert(fails.isEmpty, s"plan pins violated:\n  ${fails.mkString("\n  ")}")
  }
}
