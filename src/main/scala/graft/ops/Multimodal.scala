package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque binary
  * columns with typed metadata. The Spark-side shape (schema, batched
  * per-partition processing, typed output) is real; the media DECODE itself
  * is a deterministic stub — the container has no image/audio codecs, so the
  * stub derives fake dimensions from the payload length (clearly marked; a
  * real deployment swaps `decodeOne` for an actual codec call).
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      fp: String,
      fake_width: Int,
      fake_height: Int,
      fake_frames: Int)

  /** STUB decode: real implementations replace this with an image/audio
    * library call; everything around it (partition batching, schema, hex
    * digest) is production-shaped.
    */
  private def decodeOne(docId: Long, payload0: Array[Byte]): MediaMeta = {
    val payload = if (payload0 == null) Array.emptyByteArray else payload0
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map(b => f"$b%02x").mkString
    val len = payload.length.toLong
    MediaMeta(docId, len, hex,
      (len % 640 + 1).toInt, (len % 360 + 1).toInt, (len % 30 + 1).toInt)
  }

  /** df(doc_id, payload binary, …) → typed metadata columns. Runs as
    * mapPartitions so a real codec could amortize per-batch init (model
    * load, decoder context) across the partition.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (decoder context, model, …)
        it.map { case (id, payload) => decodeOne(id, payload) }
      }
      .toDF()
  }

  /** Frame-sampling stub: pick every `stride`-th "frame" (fixed-size byte
    * window) from a video-like payload — the partitioning/explode shape of a
    * real frame sampler.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 1024, stride: Int = 10): DataFrame = {
    val frames = udf { (payload: Array[Byte]) =>
      if (payload == null) Array.empty[Int]
      else Array.range(0, math.max(1, payload.length / frameBytes), stride)
    }
    df.select(col("doc_id"), explode(frames(col("payload"))).as("frame_idx"))
  }

  /** Feature extraction over an opaque binary payload — REAL computation (no
    * codec needed): a normalized byte-value histogram, the standard cheap
    * content-type/entropy signal for binary corpora. Output is an
    * Array[Float] embedding compatible with the Similarity ops (cosine,
    * LSH), so binary payloads can ride the same near-dup/ANN pipelines as
    * text embeddings.
    */
  def byteHistogramFeatures(df: DataFrame, bins: Int = 64): DataFrame = {
    require(bins > 0 && 256 % bins == 0, "bins must divide 256")
    val width = 256 / bins
    val hist = udf { (payload: Array[Byte]) =>
      val counts = new Array[Float](bins)
      if (payload != null && payload.length > 0) {
        var i = 0
        while (i < payload.length) {
          counts((payload(i) & 0xFF) / width) += 1f
          i += 1
        }
        val n = payload.length.toFloat
        var b = 0
        while (b < bins) { counts(b) /= n; b += 1 }
      }
      counts
    }
    df.withColumn("features", hist(col("payload")))
  }

  /** Resize stub: nearest-neighbor downsample of the (stub-decoded) pixel
    * buffer. The decode is fake by necessity (no codecs in this sandbox —
    * pixels are derived deterministically from payload bytes), but the
    * resize math, output schema (width, height, packed row-major binary),
    * and per-partition batching are exactly what a real thumbnailer ships.
    */
  final case class Thumb(doc_id: Long, width: Int, height: Int, pixels: Array[Byte])

  def resizeStub(df: DataFrame, outW: Int = 16, outH: Int = 16): Dataset[Thumb] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload0) =>
          val payload = if (payload0 == null) Array.emptyByteArray else payload0
          val meta = decodeOne(id, payload)
          val (w, h) = (meta.fake_width, meta.fake_height)
          // STUB pixel source: byte (x, y) of the fake w×h image is the
          // payload byte at the same row-major offset, cycled
          def px(x: Int, y: Int): Byte =
            if (payload.isEmpty) 0 else payload((y * w + x) % payload.length)
          val out = new Array[Byte](outW * outH)
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              out(y * outW + x) = px(x * w / outW, sy)
              x += 1
            }
            y += 1
          }
          Thumb(id, outW, outH, out)
        }
      }
  }
}
