package graft.topk

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(items: Seq[String], k: Int, parts: Int): (Map[String, Long], Long) = {
    val row = items.toDF("item").repartition(parts)
      .agg(FreqItemsAgg.freq_items(col("item"), k).as("fi"))
      .select("fi.items", "fi.max_undercount").head()
    val m = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    (m, row.getLong(1))
  }

  test("exact recovery when distinct items <= k (zero undercount)") {
    val stream = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c")
    val (m, u) = summarize(stream, k = 8, parts = 4)
    assert(m == Map("a" -> 30L, "b" -> 20L, "c" -> 5L) && u == 0L)
  }

  test("MG guarantee under skew: heavy hitter survives, counts are lower bounds") {
    // 1000 of "hot", 1 each of 200 distinct cold items; k=4 counters
    val stream = Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"cold$i")
    val n = stream.length
    val (m, u) = summarize(stream, k = 4, parts = 8)
    assert(m.contains("hot"), "item with count > N/(k+1) must survive")
    assert(m("hot") <= 1000L && m("hot") >= 1000L - u,
      s"reported ${m("hot")} must be within undercount $u of 1000")
    assert(u <= n / (4 + 1) + 1, s"undercount $u exceeds N/(k+1)")
    assert(m.size <= 4)
  }

  test("partitioning-invariant totals: undercount bound holds at any parallelism") {
    val stream = (1 to 500).map(i => s"x${i % 37}") // 37 distinct, k=10
    for (parts <- Seq(1, 3, 13)) {
      val (m, u) = summarize(stream, k = 10, parts)
      // every reported count is a valid lower bound and within u of truth
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      m.foreach { case (item, c) =>
        assert(c <= truth(item) && truth(item) - c <= u,
          s"parts=$parts item=$item reported=$c truth=${truth(item)} u=$u")
      }
    }
  }
}
