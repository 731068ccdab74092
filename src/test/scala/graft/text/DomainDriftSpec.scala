package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainDriftSpec extends SparkSpec {
  import spark.implicits._

  private def tv(docs: Seq[(String, String)]): Map[String, Double] =
    DomainDrift.totalVariation(docs.toDF("src", "text"), "src")
      .select("grp", "tv").as[(String, Double)].collect().toMap

  test("matches brute-force TV over the full vocabulary") {
    val docs = Seq(
      ("a", "x x y z"), ("a", "x y y w"),
      ("b", "z z z q"), ("b", "q q w w"),
      ("c", "x y z w q"))
    val counts = docs.flatMap { case (s, t) => t.split("\\s+").map(s -> _) }
    val perST = counts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val perS = counts.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val perT = counts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val g = counts.size.toLong
    val vocab = perT.keySet
    val brute = perS.map { case (s, n) =>
      s -> vocab.toSeq.map { t =>
        val c = perST.getOrElse((s, t), 0L)
        math.abs(c.toDouble / n - perT(t).toDouble / g)
      }.sum / 2.0
    }
    val got = tv(docs)
    assert(got.keySet == brute.keySet)
    for ((s, v) <- brute) assert(math.abs(got(s) - v) < 1e-12, s)
  }

  test("a source matching the corpus distribution has TV 0; disjoint vocab is maximal") {
    // two sources with IDENTICAL token multisets → each is half the
    // corpus with the same distribution → TV = 0 for both
    val same = tv(Seq(("a", "x y z"), ("b", "x y z")))
    assert(same.values.forall(_ == 0.0))
    // near-disjoint: a's tokens never in b and vice versa; with equal
    // sizes TV = 1/2 exactly (each side loses half its mass)
    val disj = tv(Seq(("a", "x x"), ("b", "y y")))
    assert(disj("a") == 0.5 && disj("b") == 0.5)
  }
}
