package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def perNode(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(
        Triangles.canonical(edges.toDF("id1", "id2"), "id1", "id2"))
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every node in three") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = perNode(k4)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars are triangle-free; duplicate/reversed/self edges ignored") {
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 10L))
    assert(perNode(noisy).isEmpty)
  }

  test("random graph matches brute-force enumeration") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (for {
      a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.15
    } yield (a.toLong, b.toLong)).toSeq
    val es = edges.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      u <- 1L to n.toLong; v <- (u + 1) to n.toLong; w <- (v + 1) to n.toLong
      if es((u, v)) && es((u, w)) && es((v, w))
      x <- Seq(u, v, w)
    } brute(x) += 1
    assert(perNode(edges) == brute.toMap)
  }

  test("degree orientation emits each triangle exactly once (apex = lowest (deg,id))") {
    // triangle 1-2-3 plus pendant edges inflating node 1's degree: the
    // apex must be the LOW-degree corner, not the low-id one
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val tri = Triangles.enumerate(
        Triangles.canonical(g.toDF("id1", "id2"), "id1", "id2"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(tri == Seq((2L, 1L, 3L)) || tri == Seq((3L, 1L, 2L)))
  }
}
