package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract operators.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeImageMeta` derives deterministic fake metadata from
  * the bytes' md5 digest. Everything around the stub — the binary column
  * schema, the typed Dataset, the per-partition batched decode shape, the
  * partitioning story — is real:
  *
  *  - Decode runs via `mapPartitions` over a typed Dataset, the Scala
  *    analog of `mapInPandas`: one iterator per partition, so a real
  *    decoder would amortize codec init (libjpeg/ffmpeg handles) across
  *    the whole partition instead of paying it per row.
  *  - Binary payloads stay in the executors end-to-end; nothing is ever
  *    collected. Row-group sized partitions (`maxPartitionBytes`) keep a
  *    100 TB media corpus within executor memory.
  *  - Downstream ops (resize plan, frame sampling) are metadata-only
  *    column expressions until a sink forces the (stubbed) pixel work.
  */
object MultimodalOps {

  /** One media row: id + opaque payload. */
  final case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Typed decode output: id + image metadata. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
      n_bytes: Long, format: String)

  /** Attach a binary payload column (here: the utf-8 bytes of `text`,
    * standing in for real image bytes arriving from parquet `binary`).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))

  /** STUB decoder: in production this calls the image codec on
    * `r.content`; here metadata is md5-derived so it is deterministic
    * and oracle-checkable. Decode batches per partition (codec init
    * would sit before the iterator map).
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = ImageCodec.open() — once per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val d = md.digest(r.content)
        ImageMeta(r.doc_id,
          width = 16 + (d(0) & 0x7f),
          height = 16 + (d(1) & 0x7f),
          n_bytes = r.content.length.toLong,
          format = if ((d(2) & 1) == 0) "jpeg" else "png")
      }
    }
  }

  /** Image metadata table for the documents corpus (stub decode). */
  def imageMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImageMeta(withPayload(docs).as[MediaRow]).toDF()
  }

  /** Resize planning: pure metadata math (target box fit, preserve
    * aspect), no pixel work until a sink materializes it.
    */
  def resizePlan(meta: DataFrame, box: Int): DataFrame =
    meta.withColumn("scale",
        least(lit(box) / col("width"), lit(box) / col("height"), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling plan for video-ish payloads: every `stride`-th frame
    * index of n_frames = n_bytes / bytesPerFrame (stub framing).
    */
  def frameSample(meta: DataFrame, bytesPerFrame: Int,
      stride: Int): DataFrame =
    meta.select(col("doc_id"),
      expr(s"sequence(0, greatest(cast(n_bytes / $bytesPerFrame as int) - 1, 0), $stride)")
        .as("frame_idx"))
}
