package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload plumbing: binary round-trip preserves bytes; meta matches") {
    val payloads = Multimodal.payloadsFromDocuments(Tables.documents(spark, sfDir))
    val meta = Multimodal.payloadMeta(payloads)
    val check = meta.join(Tables.documents(spark, sfDir), Seq("doc_id"))
      .filter(col("n_bytes") =!= length(col("text")))
    assert(check.count() == 0) // ascii text: bytes == chars
  }

  test("resize stub caps payload bytes and flags resized rows") {
    val payloads = Multimodal.payloadsFromDocuments(Tables.documents(spark, sfDir))
    val resized = Multimodal.resizePayload(payloads, maxBytes = 100)
    assert(resized.filter(length(col("payload")) > 100).count() == 0)
    val flagged = resized.filter(col("resized")).count()
    val longDocs = Tables.documents(spark, sfDir).filter(length(col("text")) >= 100).count()
    assert(flagged == longDocs)
  }

  test("frame sampling: strided fixed-size chunks reassemble to a prefix of the payload") {
    val payloads = Multimodal.payloadsFromDocuments(Tables.documents(spark, sfDir))
    val frames = Multimodal.sampleFrames(payloads, frameBytes = 16, stride = 2).cache()
    // stride 2 keeps every other 16-byte chunk: frame_idx are even
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    // frame 0 equals the payload's first 16 bytes for a sample doc
    val doc = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].head()
    val frame0 = frames.filter(col("doc_id") === doc._1 && col("frame_idx") === 0)
      .select("frame").as[Array[Byte]].head()
    assert(new String(frame0, "UTF-8") == doc._2.take(16))
    // every doc yields ceil(bytes/16 / 2) frames
    val counts = frames.groupBy("doc_id").count()
      .join(Tables.documents(spark, sfDir), Seq("doc_id"))
      .withColumn("expected",
        ceil(ceil(length(col("text")) / 16.0) / 2.0).cast("long"))
    assert(counts.filter(col("count") =!= col("expected")).count() == 0)
  }

  test("PNG codec round-trip: ImageIO decode recovers exact source bytes") {
    val docs = Tables.documents(spark, sfDir)
    val feats = Multimodal.extractImageFeatures(
      Multimodal.payloadsPng(docs).repartition(4)).cache()
    // every payload decodes (no rejects) and yields the 8-dim histogram
    assert(feats.filter(col("decode_error").isNotNull).count() == 0)
    assert(feats.count() == docs.count())
    // decoded-pixel histogram equals raw-byte histogram for every doc:
    // PNG encode→decode is lossless
    val raw = Multimodal.extractFeatures(Multimodal.payloadsFromDocuments(docs))
    val joined = feats.select(col("doc_id"), col("features").as("png_f"))
      .join(raw.select(col("doc_id"), col("features").as("raw_f")), "doc_id")
    assert(joined.filter(col("png_f") =!= col("raw_f")).count() == 0)
    // the payload is a real PNG: magic bytes + smaller-or-different from raw
    val png = Multimodal.payloadsPng(docs).select("payload").as[Array[Byte]].head()
    assert(png.take(8).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
  }

  test("corrupt payloads land in the reject channel, never fail the task") {
    val good = Multimodal.encodePng("hello world".getBytes("UTF-8"))
    val rows = Seq(
      (1L, "image/png", 11, good),
      (2L, "image/png", 11, good.take(20)),           // truncated PNG
      (3L, "image/png", 11, "not an image".getBytes), // garbage bytes
      (4L, "image/png", 9999, good))                  // metadata lies about length
      .toDF("doc_id", "media_type", "n_bytes", "payload")
    val out = Multimodal.extractImageFeatures(rows).cache()
    assert(out.filter(col("decode_error").isNull).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))
    val rejects = out.filter(col("decode_error").isNotNull)
    assert(rejects.count() == 3)
    assert(rejects.filter(col("features").isNotNull).count() == 0)
  }

  test("feature extraction: deterministic stub, fixed 8-dim output, batched shape") {
    val payloads = Multimodal.payloadsFromDocuments(
      Tables.documents(spark, sfDir)).repartition(4)
    val feats = Multimodal.extractFeatures(payloads).cache()
    assert(feats.count() == Tables.documents(spark, sfDir).count())
    val sizes = feats.select(size(col("features"))).distinct().as[Int].collect()
    assert(sizes.toSeq == Seq(8))
    // histogram is normalized: sums to ~1 for non-empty payloads
    val sums = feats.select(aggregate(col("features"), lit(0.0d),
      (acc, x) => acc + x.cast("double")).as("s")).as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-3))
    // determinism: second run identical
    val again = Multimodal.extractFeatures(payloads)
    assert(feats.select("doc_id", "features").exceptAll(
      again.select("doc_id", "features")).count() == 0)
  }
}
