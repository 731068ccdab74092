package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("chunk boundaries: sizes, overlap, and full coverage") {
    // 70 tokens, size 32, overlap 8 → starts 0, 24, 48 → sizes 32, 32, 22
    val docs = Seq(doc(1, 70), doc(2, 10), doc(3, 32)).toDF("doc_id", "text")
    val chunks = Chunking.chunkTokens(docs, 32, 8)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect()
    assert(chunks.toSeq == Seq(
      (1L, 0L, 32L), (1L, 1L, 32L), (1L, 2L, 22L),
      (2L, 0L, 10L),
      (3L, 0L, 32L)))
  }

  test("consecutive chunk fingerprints differ; identical docs fingerprint identically") {
    val docs = Seq(doc(1, 70), doc(2, 70)).toDF("doc_id", "text")
    val fps = Chunking.chunkTokens(docs, 32, 8)
      .select("doc_id", "chunk_idx", "chunk_fp")
      .as[(Long, Long, String)].collect().toSeq
    val byDoc = fps.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byDoc(1L) == byDoc(2L)) // same text → same chunk content
    assert(byDoc(1L).distinct.size == byDoc(1L).size) // distinct windows differ
  }

  test("every token is covered: chunk token total = n + overlap * (chunks - 1) per full-step doc") {
    val docs = Seq(doc(1, 48)).toDF("doc_id", "text") // starts 0, 24 → 32 + 24
    val total = Chunking.chunkTokens(docs, 32, 8)
      .agg(sum("n_chunk_tokens")).head().getLong(0)
    assert(total == 32 + 24)
  }
}
