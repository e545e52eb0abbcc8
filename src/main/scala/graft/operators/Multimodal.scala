package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling — images/audio/video as opaque `binary`
  * columns with typed metadata (north-star extension; SURVEY §7.3
  * item 6).
  *
  * The Spark-side plumbing here is real and tested: schema shape,
  * per-row feature extraction kept inside codegen, deterministic
  * partition-preserving batch processing. The actual media DECODE step
  * is a clearly-marked STUB (`decodeFeaturesStub`) — the container has
  * no image/audio codecs; in production it would be a native library
  * call inside `mapPartitions` (one codec init per partition, batch
  * amortized), which `batchProcess` demonstrates the shape of.
  */
object Multimodal {

  /** Media table schema: (id, media binary, meta struct).
    * `meta` is typed metadata carried alongside the opaque payload —
    * format tag, byte length, and a deterministic checksum for
    * integrity/dedup. */
  def packMedia(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      // schema contract: media_id is LongType regardless of source id type
      df.col(idCol).cast("long").as("media_id"),
      df.col(payloadCol).cast("binary").as("media"),
      struct(
        lit(format).as("format"),
        octet_length(df.col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        sha2(df.col(payloadCol).cast("binary"), 256).as("checksum")).as("meta"))

  /** REAL media decode for codec-free image formats (BMP 24/32bpp,
    * binary PPM/PGM): actual header parse + mean-luminance over the
    * pixel bytes, pure JVM — see [[graft.plans.DecodeImageFeatures]].
    * Returns NULL for payloads that are not a supported image; route
    * those to a codec-backed `mapPartitions` decoder (the
    * [[batchProcess]] shape) or the stub below. */
  def decodeFeatures(media: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.DecodeImageFeatures(GraftShim.expression(media)))
  }

  /** STUB media decode → feature struct. Deterministic fake: real
    * decode for codec formats (JPEG/PNG/opus/...) needs codec libs not
    * present in this container (the codec-FREE formats decode for real
    * via [[decodeFeatures]]). The schema and call shape match what a
    * real decoder would return; only the VALUES are derived from the
    * bytes hash. Replace the body with the codec call to
    * productionize. */
  def decodeFeaturesStub(media: Column): Column = {
    // portable 60-bit hash of the payload (md5-based, reproducible in
    // any engine — see TextFns.portableHash)
    val h = conv(substring(md5(media), 1, 15), 16, 10).cast("long")
    struct(
      // fake "width"/"height": deterministic in [16, 4111]
      (h % 4096L + 16L).as("width"),
      (conv(substring(md5(sha2(media, 256)), 1, 15), 16, 10).cast("long") % 4096L + 16L).as("height"),
      // fake "brightness": [0, 255]
      (h % 256L).cast("double").as("brightness"))
  }

  /** STUB frame sampling for video-like payloads: n deterministic byte
    * slices, each fingerprinted. Real impl: keyframe extraction per
    * container format. The slicing/partition shape (one array per row,
    * no shuffle) is the real part. */
  def frameSampleStub(media: Column, n: Int): Column =
    transform(
      sequence(lit(0), lit(n - 1)),
      i => sha2(
        concat(substring_index(base64(media), "=", 1).cast("binary"),
          i.cast("string").cast("binary")), 256))

  /** Partition-preserving batch processing shape: the pattern a real
    * decoder plugs into — `mapPartitions` so per-partition init (codec
    * contexts, model weights) is amortized across the batch, with the
    * output schema declared up front. The stub computes payload sizes. */
  def batchProcess(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select("media_id", "media").mapPartitions { rows =>
      // per-partition init would go here (codec/context setup)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val n = if (bytes == null) 0L else bytes.length.toLong
        Row(r.getAs[Long]("media_id"), n)
      }
    }(enc)
  }
}
