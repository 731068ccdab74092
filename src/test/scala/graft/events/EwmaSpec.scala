package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], num: Int = 1, den: Int = 4) =
    Ewma.quantized(rows.toDF("k", "seq", "xq"), "k", Seq("seq"), "xq", num, den)
      .select("k", "ewma_q").as[(String, Long)].collect().toMap

  private def ref(xs: Seq[Long], num: Int, den: Int): Long =
    xs.tail.foldLeft(xs.head)((acc, x) =>
      Math.floorDiv(x * num + acc * (den - num), den))

  test("fold matches reference floor-division recursion, keys independent") {
    val rnd = new scala.util.Random(5)
    val data = for {
      k <- Seq("a", "b", "c"); i <- 1 to 30
    } yield (k, i.toLong, rnd.nextLong(2000000000L))
    val got = run(data)
    for (k <- Seq("a", "b", "c"))
      assert(got(k) == ref(data.filter(_._1 == k).sortBy(_._2).map(_._3), 1, 4))
  }

  test("constant series is a fixed point; single element seeds itself") {
    val got = run(Seq(("c", 1L, 700L), ("c", 2L, 700L), ("c", 3L, 700L),
      ("s", 9L, 42L)))
    assert(got == Map("c" -> 700L, "s" -> 42L))
  }

  test("negative values use FLOOR division (matches // semantics), any alpha") {
    val xs = Seq(-7L, 3L, -11L, 5L, -1L)
    val data = xs.zipWithIndex.map { case (x, i) => ("n", i.toLong, x) }
    assert(run(data, num = 2, den = 5) == Map("n" -> ref(xs, 2, 5)))
    // spot-check the floor (not truncate) behavior: (3*2 + -7*3) div 5
    // = -15 div 5 = -3 exactly; (−11·2 + −3·3) div 5 = −31 div 5 = −7
    assert(ref(xs.take(3), 2, 5) == -7L)
  }

  test("order columns, not input order, drive the fold") {
    val inOrder = Seq(("k", 1L, 100L), ("k", 2L, 900L), ("k", 3L, 500L))
    val shuffled = Seq(("k", 3L, 500L), ("k", 1L, 100L), ("k", 2L, 900L))
    assert(run(inOrder) == run(shuffled))
  }
}
