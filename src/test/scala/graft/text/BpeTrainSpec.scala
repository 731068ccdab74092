package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def merges(df: org.apache.spark.sql.DataFrame, n: Int) =
    BpeTrain.learnMerges(df, "text", n)
      .select("step", "a", "b", "merged", "n")
      .as[(Long, String, String, String, Long)].collect().toSeq

  test("hand-computed merge sequence with frequency weighting") {
    // vocab: abab×2, abc×1 → pair counts (a,b)=2·2+1=5, (b,a)=2, (b,c)=1
    // step1 merges (a,b); then (ab,ab)=2 beats (ab,c)=1; then (ab,c)=1
    val docs = Seq((1L, "abab abc"), (2L, "abab")).toDF("doc_id", "text")
    assert(merges(docs, 3) == Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "ab", "ab", "abab", 2L),
      (3L, "ab", "c", "abc", 1L)))
  }

  test("consecutive runs fuse pairwise (greedy left-to-right)") {
    // 'aaaa': (a,a) counted 3 times; merging pairs greedily gives
    // (aa)(aa), so step2's top pair is (aa,aa) once — the case the
    // delimited encoding exists for (a space-joined replace would miss
    // the second overlapping occurrence and leave |aa||a||a|).
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    assert(merges(docs, 2) == Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "aa", "aa", "aaaa", 1L)))
  }

  test("count ties break lexicographically by (a, b)") {
    val docs = Seq((1L, "ba xc")).toDF("doc_id", "text")
    // pairs (b,a)=1 and (x,c)=1 tie → (b,a) wins lexicographically
    assert(merges(docs, 1).head == (1L, "b", "a", "ba", 1L))
  }

  test("non-[a-z] tokens are excluded from the vocabulary") {
    val v = BpeTrain.vocab(
      Seq((1L, "good G00D 123 ok! fine")).toDF("doc_id", "text"))
      .select("w").as[String].collect().toSet
    assert(v == Set("good", "fine"))   // mixed-case lowered→'g00d' has digits
  }

  test("encoded vocabulary: symbols re-spell each word; merges compress it") {
    val docs = Seq((1L, "abab abc"), (2L, "abab")).toDF("doc_id", "text")
    val v = BpeTrain.learnMergesAndVocab(docs, "text", 2)._2
      .select(col("w"), split(trim(col("enc"), "|"), "\\|\\|").as("syms"))
      .as[(String, Seq[String])].collect().toMap
    // segmentation is lossless: concatenating symbols re-spells the word
    v.foreach { case (w, syms) => assert(syms.mkString == w, s"$w -> $syms") }
    // after (a,b) then (ab,ab): abab -> [abab], abc -> [ab, c]
    assert(v("abab") == Seq("abab") && v("abc") == Seq("ab", "c"))
  }

  test("encode accounting: words <= bpe tokens <= chars, exact on a toy corpus") {
    // the bt02 shape driver-side: per-doc (n_words, n_bpe, n_chars)
    val docs = Seq((0L, "abab abc zz"), (5L, "abc abc")).toDF("doc_id", "text")
    val encV = BpeTrain.learnMergesAndVocab(docs, "text", 2)._2
      .select(col("w"),
        size(split(trim(col("enc"), "|"), "\\|\\|")).cast("long").as("n_sym"))
    val got = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .join(encV, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"),
        sum(length(col("w")).cast("long")).as("n_chars"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // merges learned on this corpus: (a,b)x5 then (ab,c)x3 →
    // abab=[ab,ab]=2, abc=[abc]=1, zz=[z,z]=2
    assert(got == Seq((0L, 3L, 5L, 9L), (5L, 2L, 2L, 6L)))
    got.foreach { case (_, w, b, c) => assert(w <= b && b <= c) }
  }

  test("result is invariant to input partitioning") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 3 == 0) "abab abc" else "cddc dd")).toDF("doc_id", "text")
    val one = merges(docs.coalesce(1), 3)
    val many = merges(docs.repartition(13), 3)
    assert(one == many)
  }
}
