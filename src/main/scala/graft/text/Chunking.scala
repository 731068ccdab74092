package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Context-window chunking: split each document's token stream into
  * overlapping fixed-size windows — the operator that turns a curated
  * corpus into training-context rows.
  *
  * Shape: one narrow pass — tokens once per doc, chunk starts from a
  * `sequence`, one `posexplode` fan-out. No shuffle: chunk rows inherit
  * the document's partition, so a downstream `repartition` (or write
  * partitioned by pack/shard) is the only exchange a 100 TB chunking
  * run needs. The last chunk per document may be shorter than
  * `chunkSize`; every token appears in ≥1 chunk; consecutive chunks
  * share exactly `overlap` tokens (except possibly at the tail); every
  * chunk after the first contributes at least one NEW token (start
  * positions stop at n - overlap - 1, so no chunk is a pure suffix of
  * its predecessor's coverage).
  */
object Chunking {

  /** (doc_id, chunk_idx, n_chunk_tokens, chunk_fp) — fp is md5 of the
    * space-joined chunk tokens, so content (not just counts) is
    * verifiable downstream. */
  def chunkTokens(docs: DataFrame, chunkSize: Int, overlap: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got overlap=$overlap chunkSize=$chunkSize")
    val step = chunkSize - overlap
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("__toks")) - overlap - 1, lit(0)), lit(step)))
          .as(Seq("chunk_idx", "__start")))
      .select(
        col(idCol),
        col("chunk_idx").cast(LongType).as("chunk_idx"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .cast(LongType).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkSize))))
          .as("chunk_fp"))
  }
}
