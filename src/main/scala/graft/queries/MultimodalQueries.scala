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

  /** Partition-batched feature extraction (decode stub): real schema,
    * real mapPartitions execution shape, fake decoder. The byte-count
    * column is independently checkable; features are deterministic.
    * The float vector is serialized (6dp CSV) in the final projection —
    * the driver's rows-only check still sorts the output in pandas,
    * where raw list cells are unhashable. */
  val mm02Features = QueryDef("mm02_feature_extract",
    (s, d) => Multimodal.extractFeatures(
      Multimodal.payloadsFromDocuments(Tables.documents(s, d)))
      .withColumn("n_bytes", col("n_bytes").cast(LongType))
      .select(col("doc_id"), col("n_bytes"),
        array_join(transform(col("features"),
          f => format_number(f.cast("double"), 6)), ",").as("features_csv"))
      .orderBy("doc_id"),
    None)

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
