package graft

/** Input-SPLIT-count invariance (the r10 verdict's stretch companion to
  * ClusterShapeSpec): that spec varied the REDUCE side
  * (shuffle.partitions ≫ cores); this one varies the MAP side —
  * `spark.sql.files.maxPartitionBytes` shrunk ~16× below the largest
  * test file, the way a 1000-executor job carves a 100 TB scan into
  * tens of thousands of splits. Results must be bit-identical: a query
  * whose answer depends on how the scan was carved (order-sensitive
  * double accumulation, per-partition state leaking into values) is a
  * correctness bug a single-split local run can never see.
  */
class SplitShapeSpec extends SparkSpec {

  test("scan-heavy queries are invariant under 16x more input splits") {
    val d = "/root/testdata/sf0.01"
    val shredded = spark.newSession()
    GraftExtensions.install(shredded)
    shredded.conf.set("spark.sql.session.timeZone", "UTC")
    shredded.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // lineitem at sf0.01 is ~1 MiB in one file: 64 KiB byte-range
    // splits carve it into ~16 input partitions (row groups assign to
    // the split holding their midpoint; surplus splits read empty —
    // exactly what over-splitting does on a real cluster). openCost 0
    // stops small-file bin-packing from re-merging the shreds.
    shredded.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    shredded.conf.set("spark.sql.files.openCostInBytes", "0")
    val baseParts = spark.read.parquet(s"$d/lineitem.parquet").rdd.getNumPartitions
    val shredParts = shredded.read.parquet(s"$d/lineitem.parquet").rdd.getNumPartitions
    assert(shredParts > baseParts,
      s"maxPartitionBytes=64K did not increase lineitem input splits " +
        s"($baseParts -> $shredParts) — the variable under test never varied")
    // one per scan shape: grouped agg (orders), GLOBAL decimal-exact
    // sums over the largest table (order-independence of the exact-sum
    // discipline is precisely what split count stresses), scan-side
    // codegen fingerprints (documents), and a broadcast dim join.
    for (q <- Seq("a02_count_by_group", "a03_global_sums",
        "dd09_simhash_portable", "a07_join3_count")) {
      val base = SparkEntry.queries(q)(spark, d).collect().toSeq
      val got = SparkEntry.queries(q)(shredded, d).collect().toSeq
      assert(got == base, s"$q diverged under 16x input splits")
    }
  }
}
