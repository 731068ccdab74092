package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleUp replica discipline — the properties that make a
  * scaled corpus a legitimate SCALING measurement rather than a
  * degenerate one. Factor 70 deliberately crosses dim=64: the original
  * rotation scheme repeated there (replica 64's i·7 mod 64 = 0 was a
  * verbatim coordinate copy of replica 0 — cross-replica EXACT
  * duplicate vectors), which the affine index map fixes. */
class ScaleUpSpec extends SparkSpec {

  private lazy val dest = {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_spec").toString
    ScaleUp.run(spark, sfDir, dir, factor = 70)
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$dest/$name.parquet")

  test("row counts scale by the factor; dimensions stay fixed") {
    val srcDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(t("documents").count() == 70 * srcDocs)
    val srcNation = spark.read.parquet(s"$sfDir/nation.parquet").count()
    assert(t("nation").count() == srcNation)
  }

  test("key bands are disjoint: ids unique across all replicas") {
    val docs = t("documents")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    val emb = t("embeddings")
    assert(emb.select("vec_id").distinct().count() == emb.count())
  }

  test("embeddings: every replica's permutation is distinct past dim=64 (no exact-dup vectors)") {
    val emb = t("embeddings")
    val n = emb.count()
    // vectors distinct across the WHOLE corpus: the affine map family
    // never repeats under the enforced factor bound, so replica 64+
    // cannot shadow replica 0 (the rotation scheme's failure mode)
    val distinctVecs = emb.select(col("embedding").cast("string")).distinct().count()
    assert(distinctVecs == n,
      s"$n vectors but only $distinctVecs distinct - replica permutations collided")
  }

  test("documents: cross-replica token-set Jaccard stays below the 4/5 near-dup gate") {
    // Check replica 0 against EVERY other replica's copy of the same
    // source doc. The bijective vocabulary rename makes cross-replica
    // type sets disjoint — Jaccard exactly 0 for every pair. Two
    // weaker schemes failed this gate: positional tagging measured
    // 0.9 (nearly every TYPE also appeared at an untagged position),
    // and hash-parity type tagging left a binomial tail (0.69 on a
    // doc with few types in the tagged class).
    val docs = t("documents")
    val srcDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val d = 1000000L
    val sets = docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(d)).as("src_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val pairs = sets.filter(col("doc_id") < srcDocs)
      .select(col("src_id"), col("toks").as("t0"))
      .join(sets.filter(col("doc_id") >= d)
        .select(col("src_id"), col("toks").as("ti")), "src_id")
      .select(
        (size(array_intersect(col("t0"), col("ti"))).cast("double") /
          size(array_union(col("t0"), col("ti")))).as("j"))
    val maxJ = pairs.agg(max(col("j"))).head.getDouble(0)
    assert(maxJ == 0.0,
      s"cross-replica Jaccard $maxJ != 0 - the bijective rename " +
        "no longer makes replica vocabularies disjoint")
  }
}
