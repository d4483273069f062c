package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, feature output — while the actual codec step is a STUB
  * (this container has no image/audio libraries): `decodeStub` derives
  * deterministic pseudo-features from the bytes. A production deployment
  * swaps `decodeStub` for a real codec without touching the plumbing.
  *
  * At scale: media rows are large and skewed — the pipeline repartitions by
  * media_id before the decode pass so one executor doesn't absorb all the
  * big payloads, and features (small) separate from payloads (large)
  * immediately after decode so downstream joins never move the bytes.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, data: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Float])

  /** STUB decode: a real implementation binds an image/audio codec here.
    * Deterministic: checksum = polynomial byte hash; feature = 8 bucketed
    * byte-histogram fractions. */
  private[operators] def decodeStub(row: MediaRow): MediaFeatures = {
    var acc = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < row.data.length) {
      val b = row.data(i) & 0xff
      acc = (acc * 31 + b) % 1000000007L
      hist(b >> 5) += 1
      i += 1
    }
    val n = math.max(1, row.data.length).toFloat
    MediaFeatures(row.media_id, row.kind, row.data.length.toLong, acc,
      hist.map(_ / n))
  }

  /** Batched per-partition decode/feature-extract pass (the Scala analog of
    * a pandas-UDF mapInPandas stage): payload stays partition-local, output
    * is the small feature row. */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val repart = if (partitions > 0) media.repartition(partitions, col("media_id"))
      else media.repartition(col("media_id"))
    repart.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling for video-like payloads: every `stride`-th fixed-size
    * window of the payload becomes one frame row (media_id, frame_idx,
    * frame bytes). Pure column ops — the explode happens before any decode
    * so Catalyst prunes unneeded frames when a downstream filter selects
    * frame_idx ranges. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("data")) / (frameBytes * stride)).cast("int")
    media
      .withColumn("frame_idx", explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .withColumn("frame",
        expr(s"substring(data, frame_idx * $frameBytes * $stride + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame"))
  }

  /** Deterministic synthetic media corpus from the documents table — the
    * bytes of each text become the opaque payload (UTF-8), so the plumbing
    * is testable at every SF without real codecs. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("data"),
      (col("doc_id") % 640).cast("int").as("width"),
      (col("doc_id") % 480).cast("int").as("height"),
      lit(16000).as("sample_rate"),
    ).as[MediaRow]
  }
}
