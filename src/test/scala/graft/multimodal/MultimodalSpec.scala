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

  test("real resize: aspect-derived dims, real PNG output, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val resized = Multimodal.resizeImages(
      Multimodal.payloadsPng(docs).repartition(4), outWidth = 8).cache()
    assert(resized.filter(col("resize_error").isNotNull).count() == 0)
    assert(resized.count() == docs.count())
    // out_h = ceil(h*outW/w) with source h = max(1, ceil(bytes/16))
    val dims = resized.join(docs, "doc_id")
      .withColumn("exp_h",
        ceil(greatest(ceil(length(col("text")) / 16.0), lit(1)) / 2.0).cast("int"))
    assert(dims.filter(col("out_h") =!= col("exp_h") || col("out_w") =!= 8)
      .count() == 0)
    // the resized payload is a real PNG, not a byte-slice
    val png = resized.select("payload").as[Array[Byte]].head()
    assert(png.take(8).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    // deterministic: second run byte-identical
    val again = Multimodal.resizeImages(
      Multimodal.payloadsPng(docs).repartition(4), outWidth = 8)
    assert(resized.select("doc_id", "payload")
      .exceptAll(again.select("doc_id", "payload")).count() == 0)
  }

  test("real resize: constant image stays constant; corrupt/truncated payloads reject") {
    val constBytes = Array.fill[Byte](64)(0x40) // 16x4 constant-gray image
    val goodPng = Multimodal.encodePng(constBytes)
    val rows = Seq(
      (1L, "image/png", 64, goodPng),
      (2L, "image/png", 64, goodPng.take(20)),            // truncated PNG
      (3L, "image/png", 64, "not an image".getBytes))     // garbage bytes
      .toDF("doc_id", "media_type", "n_bytes", "payload")
    val out = Multimodal.resizeImages(rows, outWidth = 8).cache()
    assert(out.filter(col("resize_error").isNotNull).select("doc_id")
      .as[Long].collect().toSet == Set(2L, 3L))
    assert(out.filter(col("resize_error").isNotNull)
      .filter(col("payload").isNotNull).count() == 0)
    // bilinear redraw of a constant image is that constant, at half dims
    val resizedPng = out.filter(col("doc_id") === 1L)
      .select("payload").as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resizedPng))
    assert(img.getWidth == 8 && img.getHeight == 2)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert(img.getRaster.getSample(x, y, 0) == 0x40,
        s"pixel ($x,$y) drifted from the constant source")
  }

  test("keyframes: first frame kept, identical frames skipped, scene changes kept") {
    val a = Array.fill[Byte](16)(0)
    val b = Array.fill[Byte](16)(-1) // 0xff: opposite histogram bin
    val frames = Seq(a, a, b, b).map(Multimodal.encodePng(_, 16))
    val video = Seq((1L, frames)).toDF("doc_id", "frames")
    val kf = Multimodal.selectKeyframes(video, threshold = 0.2).cache()
    assert(kf.filter(col("decode_error").isNotNull).count() == 0)
    // kept: frame 0 (always) and frame 2 (the A->B scene change)
    assert(kf.select("frame_idx").as[Int].collect().toSeq.sorted == Seq(0, 2))
    assert(kf.filter(col("frame_idx") === 0).select("delta").head().isNullAt(0))
    // the scene change's delta is the max possible L1 between histograms
    assert(kf.filter(col("frame_idx") === 2).select("delta").as[Double].head() == 2.0)
    // the kept frame payload decodes back to the scene's exact bytes
    val kfPng = kf.filter(col("frame_idx") === 2).select("frame")
      .as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(kfPng))
    val pixels = (0 until 16).map(x => img.getRaster.getSample(x, 0, 0).toByte)
    assert(pixels == b.toSeq)
    // threshold 0 keeps every frame
    assert(Multimodal.selectKeyframes(video, threshold = 0.0).count() == 4)
  }

  test("keyframes: corrupt frames reject without breaking the comparison chain") {
    val a = Array.fill[Byte](16)(0)
    val b = Array.fill[Byte](16)(-1)
    val junk = "garbage not a png".getBytes
    // A, <corrupt>, A, B: the corrupt frame must not reset the baseline —
    // frame 2 compares against frame 0 (identical, skipped), frame 3 kept
    val v1 = Seq((1L, Seq(Multimodal.encodePng(a, 16), junk,
      Multimodal.encodePng(a, 16), Multimodal.encodePng(b, 16))))
      .toDF("doc_id", "frames")
    val kf1 = Multimodal.selectKeyframes(v1, threshold = 0.2).cache()
    assert(kf1.filter(col("decode_error").isNotNull).select("frame_idx")
      .as[Int].collect().toSeq == Seq(1))
    assert(kf1.filter(col("decode_error").isNull).select("frame_idx")
      .as[Int].collect().toSeq.sorted == Seq(0, 3))
    // corrupt FIRST frame: the first decodable frame becomes the keyframe
    val v2 = Seq((2L, Seq(junk, Multimodal.encodePng(a, 16),
      Multimodal.encodePng(b, 16)))).toDF("doc_id", "frames")
    val kf2 = Multimodal.selectKeyframes(v2, threshold = 0.2).cache()
    assert(kf2.filter(col("decode_error").isNotNull).select("frame_idx")
      .as[Int].collect().toSeq == Seq(0))
    val kept2 = kf2.filter(col("decode_error").isNull)
    assert(kept2.select("frame_idx").as[Int].collect().toSeq.sorted == Seq(1, 2))
    assert(kept2.filter(col("frame_idx") === 1).select("delta").head().isNullAt(0))
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
