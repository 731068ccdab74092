package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and the cat", "web"),
    (1L, "The quick brown fox jumps over the lazy dog and the cat.", "web"), // dup of 0 after normalize
    (2L, "el gato la casa los perros que vive el rio la luna el sol", "web"), // lang filtered
    (3L, "x y", "books"),                                                     // too short → low quality
    (4L, "completely different text with the and of markers in this sentence here", "books")
  ).toDF("doc_id", "text", "source")

  test("curation partitions the corpus; reasons follow precedence") {
    val r = CurationPipeline.curate(docs)
    assert(r.kept.count() + r.rejects.count() == docs.count())
    assert(r.kept.join(r.rejects, Seq("doc_id")).count() == 0)
    val reasons = r.rejects.select("doc_id", "reject_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons(1L) == "duplicate")
    assert(reasons(2L) == "lang_filtered")
    assert(reasons(3L) == "low_quality")
    assert(r.kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 4L))
  }

  test("a filtered-out copy never claims the keeper slot") {
    // doc 10 is a low-quality variant that normalizes same as doc 11;
    // doc 11 passes and must survive even though 10 has the smaller id
    val tricky = Seq(
      (10L, "x y", "web"),
      (11L, "the good copy with enough tokens and the right markers of quality", "web"),
      (12L, "The good copy with enough tokens and the right markers of quality.", "web"))
      .toDF("doc_id", "text", "source")
    val r = CurationPipeline.curate(tricky)
    val keptIds = r.kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds.contains(11L))
    assert(!keptIds.contains(12L)) // dup of 11
  }

  test("runs over the real documents table; kept ∪ rejects == corpus") {
    val corpus = Tables.documents(spark, sfDir)
    val r = CurationPipeline.curate(corpus)
    assert(r.kept.count() + r.rejects.count() == corpus.count())
    assert(r.kept.count() > 0)
    // this synthetic corpus is all-en, quality-passing, dup-free →
    // zero rejects is the CORRECT outcome here (fixtures above cover
    // the reject paths)
  }
}
