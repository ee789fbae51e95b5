package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by
  * per-partition batch kernels.
  *
  * The decode kernels are DETERMINISTIC STUBS (this container ships no
  * image/audio codecs); everything Spark-side — schema, batching,
  * partitioning, kernel signature — is real and tested. Swapping the stub
  * for a real decoder (e.g. an FFI JNI call or `mapInPandas` + PIL on a
  * PySpark cluster) changes one function.
  */
object Multimodal {

  /** Parse a synthetic media header: [magic(2) | kind(1) | w(4) | h(4) |
    * channels(1)] followed by payload bytes. Stands in for a real container
    * probe (PNG/JPEG/WAV header parse is byte-identical plumbing).
    */
  val probeUdf: UserDefinedFunction = udf((bytes: Array[Byte]) => {
    if (bytes == null || bytes.length < 12 || bytes(0) != 'G' || bytes(1) != 'M')
      null
    else {
      val kind = bytes(2) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
      }
      val bb = java.nio.ByteBuffer.wrap(bytes, 3, 9)
      (kind, bb.getInt, bb.getInt, bytes(11).toInt, bytes.length - 12)
    }
  })

  /** STUB "decode + feature extract": a deterministic 8-dim feature vector
    * from payload byte statistics (mean/std/quantile sketch per stripe) —
    * the real version runs the codec here; the dataflow is identical.
    */
  val featuresUdf: UserDefinedFunction = udf((bytes: Array[Byte]) => {
    if (bytes == null || bytes.length <= 12) Array.fill(8)(0.0f)
    else {
      val payload = java.util.Arrays.copyOfRange(bytes, 12, bytes.length)
      val stripes = 8
      val out = new Array[Float](stripes)
      val len = payload.length
      var s = 0
      while (s < stripes) {
        val from = s * len / stripes
        val to = math.max(from + 1, (s + 1) * len / stripes)
        var sum = 0L
        var i = from
        while (i < to) { sum += payload(i) & 0xff; i += 1 }
        out(s) = sum.toFloat / (to - from) / 255.0f
        s += 1
      }
      out
    }
  })

  /** STUB "resize / frame-sample": keeps every k-th payload byte after the
    * header (the real kernel subsamples pixels/frames the same way
    * structurally: bounded output per row, no shuffle).
    */
  def sampleUdf(k: Int): UserDefinedFunction = udf((bytes: Array[Byte]) => {
    if (bytes == null || bytes.length <= 12) Array.empty[Byte]
    else {
      val payload = java.util.Arrays.copyOfRange(bytes, 12, bytes.length)
      payload.zipWithIndex.collect { case (b, i) if i % k == 0 => b }
    }
  })

  /** Synthetic media corpus derived from the events table: deterministic
    * binary payloads with valid headers. Schema matches a real media lake:
    * (media_id, media binary, meta struct).
    */
  def syntheticMedia(events: DataFrame): DataFrame = {
    val gen = udf((id: Long) => {
      val kind = (id % 3).toByte
      val w = (64 + id % 512).toInt
      val h = (64 + (id * 7) % 512).toInt
      val payloadLen = (256 + id % 1024).toInt
      val bb = java.nio.ByteBuffer.allocate(12 + payloadLen)
      bb.put('G'.toByte).put('M'.toByte).put(kind).putInt(w).putInt(h)
        .put(((id % 3) + 1).toByte)
      var i = 0
      var x = id * 6364136223846793005L + 1442695040888963407L
      while (i < payloadLen) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        bb.put((x & 0xff).toByte)
        i += 1
      }
      bb.array()
    })
    events.select(col("event_id").as("media_id"), gen(col("event_id")).as("media"))
  }

  /** The full multimodal pipeline: probe -> filter decodable -> features. */
  def mediaFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("meta", probeUdf(col("media")))
      .where(col("meta").isNotNull)
      .select(col("media_id"),
        col("meta._1").as("kind"), col("meta._2").as("width"),
        col("meta._3").as("height"), col("meta._4").as("channels"),
        col("meta._5").as("payload_bytes"),
        featuresUdf(col("media")).as("features"))
}
