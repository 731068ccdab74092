package graft.text

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks
import org.apache.spark.sql.functions._

/** Property-style coverage of the chunking invariants across a grid of
  * (nTokens, chunkSize, overlap) — the closed forms every chunk layout
  * must satisfy:
  *   nChunks = 1 + ceil(max(n - size, 0) / step)     (step = size - overlap)
  *   Σ n_chunk_tokens = n + overlap · (nChunks - 1)  (each boundary shares
  *                                                    exactly `overlap`)
  */
class ChunkingPropertySpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private val grid = Table(
    ("n", "size", "overlap"),
    (1, 32, 8), (5, 32, 8), (24, 32, 8), (25, 32, 8), (32, 32, 8),
    (33, 32, 8), (48, 32, 8), (56, 32, 8), (57, 32, 8), (200, 32, 8),
    (1, 8, 0), (8, 8, 0), (9, 8, 0), (64, 8, 0),
    (10, 16, 15), (16, 16, 15), (17, 16, 15), (40, 16, 15),
    (7, 4, 1), (100, 4, 1))

  test("chunk count and token-coverage closed forms hold across the grid") {
    forAll(grid) { (n: Int, size: Int, overlap: Int) =>
      val step = size - overlap
      val docs = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = Chunking.chunkTokens(docs, size, overlap)
        .agg(count(lit(1)).cast("long").as("nc"),
          sum("n_chunk_tokens").as("tot"),
          max("n_chunk_tokens").as("mx"))
        .as[(Long, Long, Long)].head()
      val expChunks = 1L + math.ceil(math.max(n - size, 0).toDouble / step).toLong
      assert(chunks._1 == expChunks, s"($n,$size,$overlap): nChunks")
      assert(chunks._2 == n + overlap * (expChunks - 1),
        s"($n,$size,$overlap): token coverage")
      assert(chunks._3 <= size, s"($n,$size,$overlap): oversize chunk")
    }
  }

  test("packing invariant: a pack's exclusive-start offsets all fall in its budget window") {
    import graft.etl.Packing
    val weights = Seq(300L, 10L, 50L, 200L, 1L, 1L, 255L, 256L, 257L, 100L)
    val df = weights.zipWithIndex
      .map { case (w, i) => ("s", i.toLong, w) }.toDF("source", "doc_id", "w")
    val packed = Packing.packByBudget(df, Seq("source"), "doc_id", col("w"), 256L)
      .orderBy("doc_id").select("doc_id", "pack_id").as[(Long, Long)].collect()
    var prefix = 0L
    packed.zip(weights).foreach { case ((id, pack), w) =>
      assert(pack == prefix / 256L, s"doc $id: pack $pack, prefix $prefix")
      prefix += w
    }
    assert(packed.map(_._2).toSeq == packed.map(_._2).sorted.toSeq) // monotone
  }
}
