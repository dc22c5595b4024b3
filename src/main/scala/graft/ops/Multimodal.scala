package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata (builder brief).
  *
  * The Spark-side machinery — schema, partition-preserving batched
  * iteration, output shapes — is real and tested. The codec calls
  * themselves are STUBS (this container has no image/audio libraries):
  * `decodeStub` derives deterministic fake metadata/pixels from the
  * bytes, at exactly the seam where a real implementation would call
  * libjpeg/ffmpeg. In production each `mapPartitions` body would wrap
  * the native decoder; nothing about the distributed plan changes.
  *
  * Scale shape: decode is a narrow per-partition pass (no shuffle); the
  * batch grouping inside mapPartitions is where a vectorized/native
  * codec would amortize JNI crossings, mirroring Arrow-batch UDFs.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  final case class Decoded(media_id: Long, meta: MediaMeta, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, content: Array[Byte])

  /** Wrap a table into a media-blob table: (media_id, content binary,
    * media_type). The fixtures carry no real media, so document text
    * bytes stand in as the opaque payload. */
  def blobTable(df: DataFrame, idCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      (pmod(xxhash64(col(idCol)), lit(3))).cast("int").as("type_code"))
      .withColumn("media_type",
        element_at(array(lit("image/jpeg"), lit("audio/wav"), lit("video/mp4")),
          col("type_code") + 1))
      .drop("type_code")

  /** STUB decode: deterministic pseudo-decode of the payload. A real
    * build would replace only the body of the batch loop with a native
    * codec call. Output schema (struct meta + float features) is the
    * real contract downstream stages compile against. */
  def decode(blobs: DataFrame, batchSize: Int = 64, featureDim: Int = 8): Dataset[Decoded] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // === stub codec boundary: real impl decodes `batch` natively ===
          batch.iterator.map { case (id, bytes) =>
            val h = java.util.Arrays.hashCode(bytes)
            val w = 64 + math.floorMod(h, 960)
            val ht = 64 + math.floorMod(h >> 10, 960)
            val features = Array.tabulate(featureDim) { d =>
              val slice = if (bytes.isEmpty) 0
                else bytes(math.floorMod(h + d * 31, bytes.length)).toInt
              (slice / 128.0f)
            }
            Decoded(id, MediaMeta(w, ht, 3, "stub"), features)
          }
        }
      }
  }

  /** STUB frame sampling for video payloads: every `stride`-th fixed-
    * size byte window becomes a frame row (explode — the real shape of
    * a frame-extraction stage: one narrow pass, fan-out rows). */
  def sampleFrames(blobs: DataFrame, frameBytes: Int = 256, stride: Int = 4): Dataset[Frame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(col("media_type") === "video/mp4")
      .select("media_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / (frameBytes * stride))
        (0 until nFrames).map { i =>
          val start = i * frameBytes * stride
          Frame(id, i, bytes.slice(start, math.min(start + frameBytes, bytes.length)))
        }
      }
  }

  /** STUB resize: re-derive metadata at a new resolution; payload
    * passthrough (a real impl would transform pixels here). */
  def resize(decoded: Dataset[Decoded], width: Int, height: Int): Dataset[Decoded] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map(d => d.copy(meta = d.meta.copy(width = width, height = height)))
  }
}
