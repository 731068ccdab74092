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
      feats.select(col("doc_id") +: col("n_bytes") +: bins: _*).orderBy("doc_id")
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

  val all: Seq[QueryDef] = Seq(mm01PayloadMeta, mm02Features, mm03FrameSample)
}
