package graft.queries

import graft.SparkSpec

class GraphQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("pr01: only suppliers accumulate rank; output ordered, positive, deterministic") {
    val run1 = GraphQueries.pr01PageRank.fn(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(run1.nonEmpty && run1.size <= 20)
    // edges only flow customer -> supplier: suppliers (odd namespaced
    // ids) accumulate mass, customers (even) never receive any beyond
    // the damping floor — so every supplier in the list outranks every
    // customer, and every customer sits EXACTLY at (15·base) div 100
    val (supp, cust) = run1.partition(_._1 % 2 == 1)
    assert(supp.nonEmpty, "no suppliers in the top ranks")
    if (cust.nonEmpty) {
      assert(supp.map(_._2).min > cust.map(_._2).max,
        s"a customer outranked a supplier: $run1")
      assert(cust.map(_._2).distinct.size == 1,
        s"customers must all sit at the identical damping floor: $cust")
    }
    assert(run1.forall(_._2 > 0), "quantized ranks must stay positive")
    assert(run1.map(-_._2) == run1.map(-_._2).sorted, "output must be rank-descending")
    // integer arithmetic end to end: a re-run is bit-identical
    val run2 = GraphQueries.pr01PageRank.fn(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(run1 == run2, "quantized PageRank must be deterministic")
  }
}
