package graft.text

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats: closed-form fractions on engineered documents") {
    val docs = Seq(
      // "a b a b a b": tokens {a×3, b×3}; bigrams [ab, ba, ab, ba, ab]
      // → top "a b"×3 of 5, every bigram duplicated
      (1L, "a b a b a b"),
      // all-distinct prose: no bigram repeats
      (2L, "w x y z"),
      // single token → no bigrams → dropped (matches the SQL inner join)
      (3L, "solo")
    ).toDF("doc_id", "text")
    val stats = Repetition.repetitionStats(docs).orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(stats == Seq(
      (1L, 0.333333, 0.6, 1.0),
      (2L, 1.0, 0.333333, 0.0)))
  }

  test("repetition separates a stuffed document from natural text") {
    val docs = Seq(
      (1L, Seq.fill(50)("buy cheap pills").mkString(" ")),
      (2L, "the quick brown fox jumps over the lazy dog near the quiet river")
    ).toDF("doc_id", "text")
    val m = Repetition.repetitionStats(docs)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L)._3 > 0.3 && m(1L)._4 > 0.9,
      s"spam doc should score as highly repetitive: ${m(1L)}")
    assert(m(2L)._3 < 0.2 && m(2L)._4 < 0.4,
      s"natural text should not: ${m(2L)}")
  }
}
