package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payload columns with typed metadata structs, processed by per-row
  * expressions (columnar, codegen'd) or `mapPartitions` batches.
  *
  * The Spark-side plumbing here — schemas, batch shapes, partitioning,
  * null handling — is real and tested. The actual codec work is STUBBED
  * (this container ships no image/audio libraries): `decodeImageMeta`
  * derives a deterministic fake (width/height/channels) from the payload
  * hash, exactly where a JNI/codec call would bind. Swapping in a real
  * decoder changes ONE expression, not the pipeline.
  *
  * Scale shape: payloads stay columnar in parquet; metadata extraction is
  * a map-only scan (no shuffle); frame sampling explodes to a bounded
  * (media_id, frame_no) fact table partitioned by media_id.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
  ))

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType),
    StructField("sha", StringType),
  ))

  /** STUB decode (deterministic fake): width/height/channels derived from
    * the payload's md5 — stands in for an image codec header parse.
    * Real implementation: replace the three hash-derived fields with a
    * codec call (e.g. a Catalyst expression over the first KB of payload).
    */
  def decodeImageMeta(payload: Column): Column = {
    val h = md5(payload)
    struct(
      (conv(substring(h, 1, 6), 16, 10).cast("int") % 1920 + 1).as("width"),
      (conv(substring(h, 7, 6), 16, 10).cast("int") % 1080 + 1).as("height"),
      (conv(substring(h, 13, 2), 16, 10).cast("int") % 3 + 1).as("channels"),
      length(payload).cast("long").as("n_bytes"),
      sha2(payload, 256).as("sha"))
  }

  /** STUB resize: a real implementation transforms pixel data; the stub
    * passes the payload through and rewrites the metadata — the pipeline
    * shape (expression over binary -> binary + new meta) is the real part.
    */
  def resizeStub(payload: Column, w: Int, hgt: Int): Column =
    struct(payload.as("payload"), lit(w).as("width"), lit(hgt).as("height"))

  /** Frame sampling plumbing: emit `n` evenly-spaced byte slices of the
    * payload as (frame_no, frame_bytes) — the real slice logic a video
    * splitter needs, with a stub "decoder" boundary at the slice.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val sliceLen = (length(col("payload")) / n).cast("int")
    media.select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("payload"), (i * sliceLen + 1).cast("int"),
            greatest(sliceLen, lit(1))))))
      .select(col("media_id"), col("pos").as("frame_no"),
        col("col").as("frame_bytes"))
  }

  /** End-to-end metadata extraction over a media table. */
  def extractImageMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("mime_type"),
      decodeImageMeta(col("payload")).as("meta"))
}
