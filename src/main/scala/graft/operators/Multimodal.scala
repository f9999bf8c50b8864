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

  /** A sampled frame: stub "video" framing over the payload bytes. */
  case class MediaFrame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Stub-resized media: target dims + the resampled payload. */
  case class MediaResized(id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Extracted feature vector (embedding-shaped, array<float>). */
  case class MediaFeatures(id: Long, features: Array[Float])

  /** STUB resize: deterministically resamples the payload to a
    * target-proportional byte budget (w*h/256, min 1) by strided
    * picking — stands in for a real scaler; swap the body only. */
  def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val outLen = math.max(1, w * h / 256)
    if (bytes.isEmpty) new Array[Byte](outLen)
    else Array.tabulate(outLen)(i => bytes((i.toLong * bytes.length / outLen).toInt))
  }

  /** Batched partition-wise resize (same mapPartitions shape as
    * [[decodeBatch]] — decoder/scaler state amortizes per partition).
    * @param df (id: long, payload: binary) */
  def resizeBatch(df: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaResized]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            MediaResized(id, w, h, stubResize(bytes, w, h)) }
        }
      }(enc)
      .toDF()
  }

  /** Batched frame sampling: treats the payload as fixed-size frames
    * (`frameBytes` each) and emits every `stride`-th frame — the
    * row-explosion shape of video pipelines (one input row fans out
    * to many frame rows, partition-wise, nothing on the driver).
    * @param df (id: long, payload: binary) */
  def frameSampleBatch(df: DataFrame, stride: Int, frameBytes: Int = 64,
                       batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaFrame]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            val nFrames = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
            // for f < nFrames, from <= bytes.length always (incl. the
            // empty payload, whose single frame is empty)
            (0 until nFrames by stride).iterator.map { f =>
              val from = f * frameBytes
              val until = math.min(from + frameBytes, bytes.length)
              MediaFrame(id, f, java.util.Arrays.copyOfRange(bytes, from, until))
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** STUB feature extraction: `dim` floats, feature k = mean byte
    * value of the k-th equal chunk, scaled to [0,1] — deterministic,
    * embedding-shaped (array<float>), so the output composes directly
    * with graft.operators.Similarity (ANN/top-k). */
  def stubFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim) { k =>
      val from = (k.toLong * bytes.length / dim).toInt
      val until = ((k + 1).toLong * bytes.length / dim).toInt
      if (until <= from) 0.0f
      else {
        var s = 0L; var i = from
        while (i < until) { s += (bytes(i) & 0xff); i += 1 }
        (s.toDouble / (until - from) / 255.0).toFloat
      }
    }

  /** Batched partition-wise feature extraction.
    * @param df (id: long, payload: binary) */
  def featureBatch(df: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaFeatures]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) => MediaFeatures(id, stubFeatures(bytes, dim)) }
        }
      }(enc)
      .toDF()
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
