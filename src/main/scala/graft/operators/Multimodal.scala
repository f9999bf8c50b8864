package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column plumbing (SURVEY.md §2.G).
  *
  * Media payloads ride as opaque `binary` columns with typed metadata
  * alongside. The real decode libraries (image/audio codecs) are NOT
  * in this container, so `StubDecoder.decode` derives deterministic
  * fake metadata from the bytes — but the Spark-side plumbing is
  * real and is the part that matters at 100 TB: binary columns stay
  * columnar in parquet, the decoder runs partition-wise in batches
  * (the shape a vectorized/native decoder needs), and nothing ever
  * collects to the driver.
  */
object Multimodal {

  /** Decoded media metadata row. */
  case class MediaMeta(id: Long, n_bytes: Int, sha: String,
                       width: Int, height: Int, format: String)

  /** STUB: stands in for a real image decoder. Deterministic pure
    * function of the bytes so tests/oracles can pin it. A real
    * deployment swaps only this function body for e.g. a JNI codec. */
  object StubDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      MediaMeta(id, bytes.length, sha,
        width = 64 + (b0 % 16) * 32, height = 64 + (b1 % 16) * 32,
        format = if (b0 % 2 == 0) "png" else "jpeg")
    }
  }

  /** Batched partition-wise decode: groups each partition's rows into
    * `batchSize` chunks before invoking the decoder — the access
    * pattern a vectorized native decoder wants (amortized codec init,
    * contiguous buffers). mapPartitions (not a per-row UDF) is
    * deliberate: decoder state lives once per partition, not per row.
    * @param df (id: long, payload: binary)
    */
  def decodeBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaMeta]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one native call
          batch.iterator.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
        }
      }(enc)
      .toDF()
  }
}
