package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Pins the lazy-plan contract: constructing (and analyzing/optimizing)
  * a registered query DataFrame must launch ZERO Spark jobs. Scalars
  * like corpus size N or avgdl must be 1-row broadcast frames inside
  * the plan, never plan-build-time `count()`/`head()` driver actions —
  * eager scalars can't participate in AQE or be cached with the plan.
  */
class LazinessSpec extends SparkSpec {

  private def jobsDuring(body: => Unit): Int = {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      GraftSqlBridge.drainListenerBus(spark)
      jobs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Eager BY DESIGN, not by accident: dd06 and sd01 run an iterative
    * fixpoint (each round materializes via localCheckpoint), nn06
    * trains its coarse quantizer on a sample at build (IvfIndex — as
    * did nn04 before its r10 demotion to SimilaritySpec), j03 prepares
    * its bucketed warehouse copies on first use (a memoized CREATE
    * TABLE, not a per-run action). Everything else must be a single
    * lazy plan. */
  private val eagerByDesign =
    Set("dd06_dup_clusters", "sd01_semantic_dedup",
      "sd02_semantic_dedup_banded", // runStars CC fixpoint, like sd01
      "dd13_best_of_cluster", // runStars CC fixpoint, like dd06/sd01
      "nn06_ivf_allprobe", "j03_bucketed_join", "j04_clustered_range",
      "zo01_zorder_range",
      "sm04_leakage_safe_split", // runStars CC fixpoint, like dd06/sd01
      "hi01_hierarchy_flatten",  // pointer-doubling fixpoint loop
      // BPE training (r16): each merge step's argmax is a 1-row
      // TakeOrdered(1) collect inlined as literals into the next
      // rewrite — a sequential driver-paced loop like the CC
      // fixpoints (the lazy broadcast form re-ran the vocab pair
      // aggregation once per consumer; see BpeTrain.scala)
      "bt01_bpe_train", "bt02_bpe_encode")

  test("every registered query builds and optimizes with zero jobs") {
    // warm the table cache first so file-listing jobs (a read-time cost,
    // not a query-shape cost) don't count against laziness
    SparkEntry.queries.keys.foreach(n => SparkEntry.queries(n)(spark, sfDir))
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(eagerByDesign)
      .flatMap { name =>
        val n = jobsDuring {
          SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.optimizedPlan // force analyze + optimize
        }
        if (n > 0) Some(s"$name ran $n jobs") else None
      }
    assert(offenders.isEmpty,
      s"plan construction must be fully lazy; offenders: ${offenders.mkString(", ")}")
  }

  test("tx01/tx02 carry their scalars as broadcast frames in one plan") {
    for (name <- Seq("tx01_tfidf_topterms", "tx02_bm25")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("BroadcastNestedLoopJoin"), s"$name: scalar frame not broadcast")
    }
  }
}
