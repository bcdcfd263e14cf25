package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * processed in partition-local batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * deterministic FAKE decoder (parses a fake 8-byte header); the Spark-side
  * plumbing — schema, batch shape, partition-local processing, metadata
  * struct — is real and tested, and swapping in a real codec is a one-line
  * change inside the mapPartitions body.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** Wrap any (id, text) DataFrame as a media table: payload = utf-8 bytes,
    * metadata struct alongside — the shape a real ingest would produce. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(lit("application/x-fake").as("mime"),
        length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes")).as("meta"))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", LongType),
    StructField("fhash", StringType),
    StructField("flen", IntegerType)))

  /** Deterministic fake resize: cap the payload at `maxBytes` (where a real
    * resampler would sit) and rewrite the metadata struct to match — the
    * plumbing a thumbnailing pass needs: payload-in/payload-out kernel,
    * metadata kept consistent, one row per media row. */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "meta.mime").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          // --- fake resampler start (swap for a real scaler) ---
          val out = if (payload.length <= maxBytes) payload
                    else java.util.Arrays.copyOf(payload, maxBytes)
          // --- fake resampler end ---
          Row(r.getLong(0), out, Row(r.getString(2), out.length.toLong))
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Deterministic fake frame sampling: treat the payload's character form
    * as a "video", cut it into `frameChars`-character frames, keep every
    * `stride`-th frame up to `maxFrames`, and emit one row per sampled
    * frame (md5 + length stand in for the decoded frame). The real part is
    * the shape: a one-to-many partition-local kernel whose output rows are
    * orders of magnitude smaller than the payload — the video-sampling
    * pattern where shipping whole payloads through a shuffle would be the
    * scale bug. */
  def sampleFramesStub(df: DataFrame, idCol: String, textCol: String,
      frameChars: Int = 32, stride: Int = 4, maxFrames: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col(textCol)).rdd
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val text = Option(r.getString(1)).getOrElse("")
          val nFrames = (text.length + frameChars - 1) / frameChars
          (0 until nFrames by stride).take(maxFrames).map { idx =>
            val frame = text.substring(idx * frameChars,
              math.min((idx + 1) * frameChars, text.length))
            md.reset()
            val hex = md.digest(frame.getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
            Row(id, idx.toLong, hex, frame.length)
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Deterministic fake decode: "width"/"height" from the first payload
    * bytes, additive checksum. Real plumbing: partition-local batch loop over
    * rows, typed Row output — exactly where an image codec would sit. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "meta.mime", "meta.n_bytes").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          val nBytes = r.getLong(3)
          // --- fake codec start (swap for a real decoder) ---
          val width = if (payload.length >= 1) (payload(0) & 0xff) + 1 else 0
          val height = if (payload.length >= 2) (payload(1) & 0xff) + 1 else 0
          var checksum = 0L
          var i = 0
          while (i < payload.length) { checksum += (payload(i) & 0xff); i += 1 }
          // --- fake codec end ---
          Row(id, mime, nBytes, width, height, checksum)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
