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
}
