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
