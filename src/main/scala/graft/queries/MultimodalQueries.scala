package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing queries: binary payload metadata (pure
  * expressions, oracle-checked) and the partition-batched decode/
  * feature-extract path (stubbed decoder → rows-only). */
object MultimodalQueries {

  /** Payload metadata over binary columns. */
  val mm01PayloadMeta = QueryDef("mm01_payload_meta",
    (s, d) => Multimodal.payloadMeta(
      Multimodal.payloadsFromDocuments(Tables.documents(s, d)))
      .withColumn("n_bytes", col("n_bytes").cast(LongType))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, 'image/fake' AS media_type,
           |  octet_length(encode(text)) AS n_bytes
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Partition-batched feature extraction through a REAL codec: text
    * bytes become the pixels of an 8-bit grayscale PNG (javax.imageio
    * encode), the extractor ImageIO-decodes that PNG back to pixels,
    * and the 8-bin intensity histogram is computed from the DECODED
    * bytes. The SQL oracle replays the histogram over the SOURCE
    * bytes — a hash match proves decode(encode(b)) == b through a
    * genuine compressed image format, not a byte-copy stub. Per-char
    * codepoint replay is valid because the corpus is pure ASCII (byte
    * == codepoint; asserted: octet_length == length at every SF). Bins
    * are projected as rounded scalar columns — the gate's pandas sort
    * can't handle raw array cells. */
  val mm02Features = QueryDef("mm02_feature_extract",
    (s, d) => {
      val feats = Multimodal.extractImageFeatures(
        Multimodal.payloadsPng(Tables.documents(s, d)))
        .filter(col("decode_error").isNull)
        .withColumn("n_bytes", col("n_bytes").cast(LongType))
      val bins = (0 until 8).map(i =>
        round(element_at(col("features"), i + 1), 6).as(s"f$i"))
      // repartition BETWEEN codec and sort: a global orderBy samples
      // range boundaries by re-executing its narrow parents, which
      // would run the whole encode+decode chain TWICE (measured: two
      // identical ~4 s stages). The hash exchange materializes the
      // codec output once; the sample pass reads shuffle files.
      feats.select(col("doc_id") +: col("n_bytes") +: bins: _*)
        .repartition(col("doc_id")).orderBy("doc_id")
    },
    Some {
      val binCols = (0 until 8).map(i =>
        s"""CASE WHEN length(text) = 0 THEN 0.0
           |       ELSE round(CAST(len(list_filter(bins, b -> b = $i)) AS DOUBLE)
           |                  / length(text), 6) END AS f$i""".stripMargin)
        .mkString(",\n")
      s"""WITH h AS (SELECT doc_id, text,
         |    list_transform(string_to_array(text, ''), c -> unicode(c) // 32) AS bins
         |  FROM documents)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
         |$binCols
         |FROM h ORDER BY doc_id""".stripMargin
    })

  /** Frame sampling fan-out: one payload row → strided frame rows.
    * The oracle checks the fan-out arithmetic in closed form
    * (ceil(ceil(bytes/16)/2) frames per doc). */
  val mm03FrameSample = QueryDef("mm03_frame_sample",
    (s, d) => Multimodal.sampleFrames(
      Multimodal.payloadsFromDocuments(Tables.documents(s, d)),
      frameBytes = 16, stride = 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  CAST(ceil(ceil(octet_length(encode(text)) / 16.0) / 2.0) AS BIGINT) AS n_frames
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Content-aware KEYFRAME SELECTION under the full oracle gate: each
    * document becomes a sequence of real PNG frames (16-byte chunks,
    * exact-width encode), the engine ImageIO-decodes every frame and
    * keeps those whose 8-bin histogram L1 delta vs the previous frame
    * clears 0.2 (first frame always kept, delta NULL). The oracle
    * replays the whole thing — chunking, per-chunk histograms over the
    * SOURCE bytes, lag deltas with left-to-right bin accumulation,
    * 6dp rounding, threshold — so a hash match proves the selection
    * ran over correctly DECODED pixels (any decode drift changes a
    * histogram, hence a delta, hence the kept set or its delta
    * column). */
  val mm04Keyframes = QueryDef("mm04_keyframes",
    (s, d) => Multimodal.selectKeyframes(
      Multimodal.videoFromDocuments(Tables.documents(s, d), frameBytes = 16),
      threshold = 0.2)
      .filter(col("decode_error").isNull)
      .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        col("delta"))
      // materialize the decode output before the sort samples it
      // (the mm02 rationale: otherwise the codec chain runs twice)
      .repartition(col("doc_id"))
      .orderBy("doc_id", "frame_idx"),
    Some {
      val bins = (0 until 8).map(i =>
        s"CAST(len(list_filter(bins, x -> x = $i)) AS DOUBLE)/n AS f$i")
        .mkString(",\n|        ")
      val l1 = (0 until 8).map(i => s"abs(f$i - lag(f$i) OVER w)")
        .mkString(" + ")
      s"""WITH f0 AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(ceil(length(text)/16.0) AS BIGINT) - 1)) AS i
         |  FROM documents),
         |f AS (SELECT doc_id, CAST(i AS INT) AS frame_idx,
         |        substr(text, CAST(i*16 + 1 AS INT), 16) AS chunk FROM f0),
         |b AS (SELECT doc_id, frame_idx, length(chunk) AS n,
         |        list_transform(string_to_array(chunk, ''), c -> unicode(c) // 32) AS bins
         |      FROM f),
         |h AS (SELECT doc_id, frame_idx,
         |        $bins
         |      FROM b),
         |dl AS (SELECT doc_id, frame_idx,
         |        round($l1, 6) AS delta
         |      FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, delta
         |FROM dl WHERE frame_idx = 0 OR delta >= 0.2
         |ORDER BY doc_id, frame_idx""".stripMargin
    })

  /** REAL image resize (decode → Graphics2D bilinear redraw → PNG
    * re-encode) with the output GEOMETRY oracle-checked: out_h =
    * ceil(h·outW/w) is closed-form from the text length, so every
    * row's resized dimensions — read back from the re-encoded PNG by a
    * second real decode — must match the SQL. Pixel-level resize
    * properties (constant-color invariance, determinism, reject
    * channel) are covered by MultimodalSpec. */
  val mm05Resize = QueryDef("mm05_resize_dims",
    (s, d) => {
      val resized = Multimodal.resizeImages(
        Multimodal.payloadsPng(Tables.documents(s, d)), outWidth = 8)
        .filter(col("resize_error").isNull)
      // read the dims back OUT of the resized PNG payload (a real
      // second decode via the partition-scoped reader), not from the
      // operator's own metadata columns; materialize before the sort
      // samples it (the mm02 rationale)
      Multimodal.decodedDims(resized).repartition(col("doc_id")).orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(8 AS BIGINT) AS out_w,
           |  CAST(ceil(greatest(ceil(length(text)/16.0), 1)/2.0) AS BIGINT) AS out_h
           |FROM documents ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(mm01PayloadMeta, mm02Features, mm03FrameSample,
    mm04Keyframes, mm05Resize)
}
