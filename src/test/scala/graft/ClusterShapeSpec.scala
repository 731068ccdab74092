package graft

/** Cluster-shape smoke (the r9 verdict's stretch): local[4] tests
  * everywhere else run with shuffle.partitions = cores, which is the
  * one configuration a real cluster never has. This spec re-runs the
  * registered skew queries on a sibling session configured like a
  * 1000-executor job — `spark.sql.shuffle.partitions` ≫ cores with AQE
  * on — and pins that (a) results are bit-identical to the base
  * session's, and (b) AQE actually exercises its cluster-scale
  * machinery (AQEShuffleRead re-coalescing the over-provisioned reduce
  * side). The skew-SPLIT mechanism itself is pinned separately in
  * ScaleSpec with thresholds scaled to test bytes; here the partition
  * count is the variable under test.
  */
class ClusterShapeSpec extends SparkSpec {

  test("sk03/sk04 are invariant under a cluster-like partition count (256 >> cores), and AQE re-coalesces") {
    val d = "/root/testdata/sf0.01"
    val wide = spark.newSession()
    GraftExtensions.install(wide)
    wide.conf.set("spark.sql.session.timeZone", "UTC")
    wide.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    wide.conf.set("spark.sql.shuffle.partitions", "256")
    wide.conf.set("spark.sql.adaptive.enabled", "true")
    wide.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    for (q <- Seq("sk01_skew_plain", "sk02_skew_salted",
        "sk03_skew_join_plain", "sk04_skew_join_salted")) {
      val base = SparkEntry.queries(q)(spark, d).collect().toSeq
      val df = SparkEntry.queries(q)(wide, d)
      val got = df.collect().toSeq
      assert(got == base,
        s"$q diverged between shuffle.partitions=4 and 256")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"),
        s"$q at 256 partitions shows no AQEShuffleRead — AQE did not " +
          s"manage the over-provisioned shuffle:\n$plan")
    }
  }
}
