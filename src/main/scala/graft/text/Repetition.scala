package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition signals for corpus quality filtering (the Gopher rules
  * family, Rae et al. 2021 — public): per-document unique-word ratio,
  * top-bigram fraction, and duplicate-bigram fraction. Boilerplate,
  * keyword-stuffed spam, and degenerate machine text repeat n-grams at
  * rates natural prose never reaches, which length/punctuation
  * heuristics (x11) cannot see.
  *
  * Shape, chosen for 100 TB: both gram families build ROW-LOCALLY and
  * go straight into partial aggregation — no window, no sort, no
  * shuffle before the (doc_id, gram) aggregate. Bigrams come from
  * zip_with(tokens, tokens[2:], …): the lambda body touches only its
  * bound element arguments, so the split is NOT re-evaluated per
  * element (the lambda-CSE trap measured on vq01/x16 bites when the
  * body embeds a non-argument expression; array OPERANDS evaluate
  * once). The wide exchanges carry only doc-keyed gram counts.
  */
object Repetition {

  /** One row per document with at least one bigram (i.e. ≥2 tokens):
    * (doc_id, unique_word_ratio, top_bigram_frac, dup_bigram_frac),
    * fractions rounded to 6 places. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val words = docs
      .select(col("doc_id"), explode(toks).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(
        count(lit(1)).as("wdist"),
        sum("count").as("wtot"))
    // zip tokens with their successors; the trailing (last, null) pair
    // (zip_with pads to the longer operand) is filtered out
    val pairs = zip_with(toks,
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bigrams = docs
      .select(col("doc_id"), explode(pairs).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("p.w1"), col("p.w2")).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(
        max("count").as("btop"),
        sum("count").as("btot"),
        coalesce(sum(when(col("count") > 1, col("count"))), lit(0L)).as("bdup"))
    words.join(bigrams, "doc_id")
      .select(col("doc_id"),
        round(col("wdist").cast("double") / col("wtot").cast("double"), 6)
          .as("unique_word_ratio"),
        round(col("btop").cast("double") / col("btot").cast("double"), 6)
          .as("top_bigram_frac"),
        round(col("bdup").cast("double") / col("btot").cast("double"), 6)
          .as("dup_bigram_frac"))
  }
}
