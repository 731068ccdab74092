package graft.graph

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(ids: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 20) =
    ConnectedComponents.run(
      ids.toDF("id"), edges.toDF("id1", "id2"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain needs multi-round propagation; min id labels the component") {
    // path 1-2-3-4-5-6 (diameter 5) + isolated 9 + pair 7-8
    val labels = cc(1L to 9L,
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L), (7L, 8L)))
    assert((1L to 6L).forall(labels(_) == 1L))
    assert(labels(7L) == 7L && labels(8L) == 7L)
    assert(labels(9L) == 9L)
  }

  test("star and cycle collapse to one component") {
    val star = (2L to 6L).map(i => (1L, i))
    val cycle = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val labels = cc((1L to 6L) ++ (10L to 12L), star ++ cycle)
    assert((1L to 6L).forall(labels(_) == 1L))
    assert((10L to 12L).forall(labels(_) == 10L))
  }

  test("no edges: every node is its own cluster") {
    val labels = cc(Seq(3L, 5L, 8L), Seq.empty)
    assert(labels == Map(3L -> 3L, 5L -> 5L, 8L -> 8L))
  }

  test("insufficient rounds fail loudly instead of returning a wrong answer") {
    val chain = (1L until 8L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      cc(1L to 8L, chain, maxIter = 2)
    }
  }

  private def stars(ids: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 30) =
    ConnectedComponents.runStars(
      ids.toDF("id"), edges.toDF("id1", "id2"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("large-star/small-star matches propagate+jump on mixed graphs") {
    val ids = 1L to 12L
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L), // path
      (7L, 8L),                                                        // pair
      (10L, 11L), (11L, 12L), (12L, 10L))                              // cycle
    assert(stars(ids, edges) == cc(ids, edges))
  }

  test("no edges / self-loops only: every node is its own cluster") {
    assert(stars(Seq(3L, 5L, 8L), Seq((3L, 3L))) ==
      Map(3L -> 3L, 5L -> 5L, 8L -> 8L))
  }

  test("10^4-node chain converges in O(log diameter) alternations") {
    val n = 10000L
    val ids = spark.range(1, n + 1).toDF("id")
    // worst-case layout for label propagation: a single path, highest
    // id adjacent to lowest
    val edges = spark.range(1, n).toDF("id1")
      .withColumn("id2", $"id1" + 1L)
    val (labels, rounds) =
      ConnectedComponents.starContraction(ids, edges, maxIter = 30)
    // every node labeled with the component min (= 1)
    assert(labels.filter($"cluster_id" =!= 1L).count() == 0)
    val bound = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 3
    assert(rounds <= bound,
      s"chain of $n took $rounds alternations; O(log d) bound is $bound")
  }
}
