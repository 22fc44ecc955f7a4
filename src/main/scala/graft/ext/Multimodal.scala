package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with batched per-partition feature extraction.
  *
  * The real decode step (image/audio codec, model inference) is STUBBED —
  * the codec libraries are not in this environment — behind
  * [[decodeStub]], a deterministic fake. Everything around it is the real
  * Spark shape for 100 TB multimodal work:
  *   - assets are a `binary` column + metadata struct (byte_len, md5,
  *     mime) so scans prune to metadata-only when features aren't needed;
  *   - extraction runs via mapPartitions, amortizing per-batch model/codec
  *     init across the partition (the Scala analog of a Pandas-UDF
  *     mapInPandas batch loop);
  *   - output is a fixed-width feature vector column, joinable back by id.
  */
object Multimodal {

  /** Wrap a text column as a binary asset (stand-in for image/audio bytes:
    * the testdata ships no media, so documents' UTF-8 bytes play the
    * payload role; the schema and code path are payload-agnostic). */
  def toAssets(docs: DataFrame, idCol: String, payloadCol: String,
      mime: String = "application/octet-stream"): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        octet_length(col(payloadCol)).cast("long").as("byte_len"),
        md5(col(payloadCol)).as("content_md5"),
        lit(mime).as("mime")).as("meta"))

  /** STUB decoder — deterministic fake features in place of a real codec/
    * model call: feature i = byte[i] / 255.0 (0.0 past the payload end).
    * Swap this body for the real decode; the partition batching around it
    * is unchanged. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Double] =
    Array.tabulate(dim)(i =>
      if (i < payload.length) (payload(i) & 0xff) / 255.0 else 0.0)

  /** Frame sampling — the video/audio frame-extraction shape without the
    * codec: up to `maxFrames` fixed-width byte windows at `stride` offsets
    * from each payload, one row per frame with its own md5. Pure codegen'd
    * binary ops (substring works on BinaryType), zero UDF, zero shuffle —
    * the seek-and-slice plan a real frame sampler needs; swap the window
    * for a codec keyframe read and the plumbing (explode shape, ids,
    * hashes) is unchanged. Frames are joinable back by (asset_id,
    * frame_idx). */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int,
      maxFrames: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0)
    assets
      .withColumn("n_frames",
        least(lit(maxFrames.toLong),
          greatest(floor((col("meta.byte_len") - frameBytes) / stride) + 1, lit(1L))))
      .select(col("asset_id"), col("payload"),
        explode(expr("sequence(0, CAST(n_frames AS INT) - 1)")).as("frame_idx"))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $stride + 1, $frameBytes)").as("frame"))
      .withColumn("frame_md5", md5(col("frame")))
      .withColumn("frame_len", octet_length(col("frame")).cast("long"))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("features", ArrayType(DoubleType))))

  /** Batched feature extraction: one decoder "session" per partition
    * (mirrors loading a model/codec once per executor task, the expensive
    * part at scale), then a tight per-row loop. */
  def extractFeatures(assets: DataFrame, dim: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    assets.select("asset_id", "payload", "meta.byte_len", "meta.content_md5")
      .mapPartitions { rows =>
        // per-partition init goes here (codec/model handle)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("asset_id"), r.getAs[Long]("byte_len"),
            r.getAs[String]("content_md5"), decodeStub(payload, dim).toSeq)
        }
      }(enc)
  }
}
