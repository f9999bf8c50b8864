package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column plumbing (SURVEY.md §2.G).
  *
  * Media payloads ride as opaque `binary` columns with typed metadata
  * alongside. Header-level decode ([[HeaderDecoder]]) AND full pixel
  * decode are REAL, pure-JVM, zero-dependency: PNG (zlib inflate +
  * all five filter types + CRC, [[Png]]), baseline JPEG (Huffman +
  * IDCT, [[graft.operators.Jpeg]]), GIF (variable-width LZW +
  * 4-pass deinterlace, [[Gif]]) — each gated against independently
  * ImageIO-encoded fixtures (q89/q101/q105), with resize/feature
  * kernels operating on the decoded pixels (q102). Only formats the
  * codecs don't cover fall back to the deterministic synthetic-pixel
  * path, clearly marked where used. The Spark-side plumbing is the
  * part that matters at 100 TB: binary columns stay columnar in
  * parquet, the decoder runs partition-wise in batches (the shape a
  * vectorized/native decoder needs), and nothing ever collects to
  * the driver.
  */
object Multimodal {

  /** Decoded media metadata row. */
  case class MediaMeta(id: Long, n_bytes: Int, sha: String,
                       width: Int, height: Int, format: String)

  /** REAL header-level image decode — pure JVM, zero dependencies,
    * zero egress. Reads width/height/format out of the actual byte
    * layout of the three classic container formats:
    *  - PNG: 8-byte signature, then the mandatory first IHDR chunk —
    *    big-endian u32 width at offset 16, height at 20;
    *  - GIF: "GIF87a"/"GIF89a", little-endian u16 logical-screen
    *    width at offset 6, height at 8;
    *  - JPEG: FF D8 SOI, then a marker scan — segments skipped by
    *    their declared big-endian length (fill FFs and standalone
    *    RST/TEM markers handled) until the first SOFn frame header
    *    (C0..CF minus the non-frame C4/C8/CC), whose payload carries
    *    big-endian u16 height at +5 and width at +7; the scan stops
    *    at SOS (DA) since entropy-coded data follows.
    * Anything else decodes honestly as ("unknown", 0 x 0) — no
    * fabricated metadata. Header metadata is what corpus curation
    * filters on first — full pixel decode ([[Png]]/[[Jpeg]]/[[Gif]])
    * costs ~100× more per byte, so the metadata pass prunes before
    * any pixel pass runs. */
  object HeaderDecoder {
    private def u16be(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u16le(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def u32be(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private val pngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (width, height) of the first JPEG SOF segment, if any. */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      var out: Option[(Int, Int)] = None
      var more = true
      while (more && i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) more = false // corrupt stream
        else {
          val m = b(i + 1) & 0xff
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else if (i + 3 >= b.length) more = false
          else {
            val segLen = u16be(b, i + 2)
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              if (i + 8 < b.length) out = Some((u16be(b, i + 7), u16be(b, i + 5)))
              more = false
            } else if (m == 0xda) more = false // SOS: entropy data follows
            else i += 2 + segLen
          }
        }
      }
      out
    }

    private def u32le(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

    /** (width, height, little-endian?) from the first TIFF IFD —
      * the one header format whose BYTE ORDER is data-dependent
      * ("II" = Intel/LE, "MM" = Motorola/BE), so every field read
      * dispatches on the leading magic; dims are tags 256/257 as
      * SHORT (inline, endian-sensitive first 2 value bytes) or LONG. */
    private def tiffDims(b: Array[Byte]): Option[(Int, Int, Boolean)] = {
      if (b.length < 8) return None
      val le = b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a && b(3) == 0
      val be = b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 0x2a
      if (!le && !be) return None
      def u16(i: Int) = if (le) u16le(b, i) else u16be(b, i)
      def u32(i: Int) = if (le) u32le(b, i) else u32be(b, i)
      val ifd = u32(4).toInt
      if (ifd < 8 || ifd + 2 > b.length) return None
      val n = u16(ifd)
      var w = -1L; var h = -1L
      var k = 0
      while (k < n) {
        val off = ifd + 2 + k * 12
        if (off + 12 > b.length) return None
        val tag = u16(off)
        val v: Long = u16(off + 2) match {
          case 3 => u16(off + 8) // SHORT: inline, endian-sensitive
          case 4 => u32(off + 8) // LONG
          case _ => -1L
        }
        if (tag == 256) w = v else if (tag == 257) h = v
        k += 1
      }
      if (w > 0 && h > 0) Some((w.toInt, h.toInt, le)) else None
    }

    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
      def meta(w: Int, h: Int, fmt: String) =
        MediaMeta(id, bytes.length, sha, w, h, fmt)
      if (bytes.length >= 24 && bytes.startsWith(pngSig) &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
        meta(u32be(bytes, 16).toInt, u32be(bytes, 20).toInt, "png")
      else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8' &&
          (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
        meta(u16le(bytes, 6), u16le(bytes, 8), "gif")
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        jpegDims(bytes) match {
          case Some((w, h)) => meta(w, h, "jpeg")
          case None => meta(0, 0, "unknown")
        }
      else tiffDims(bytes) match {
        case Some((w, h, le)) => meta(w, h, if (le) "tiff-le" else "tiff-be")
        case None => meta(0, 0, "unknown")
      }
    }
  }

  /** Minimal well-formed single-IFD TIFF, endianness by id parity
    * (even = "II" little-endian, odd = "MM" big-endian) — dims are
    * closed-form in id, so a gate checks the decoder's
    * endian-dispatched reads against pure arithmetic. */
  def syntheticTiff(id: Long): Array[Byte] = {
    val w = 3 + (id % 9).toInt
    val h = 2 + ((id * 3) % 9).toInt
    val le = id % 2 == 0
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      else { out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
        out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    if (le) { out.write('I'); out.write('I'); out.write(0x2a); out.write(0) }
    else { out.write('M'); out.write('M'); out.write(0); out.write(0x2a) }
    w32(8) // first IFD offset
    w16(2) // entries
    // tag 256 ImageWidth, SHORT, count 1, value inline (endian rules:
    // a SHORT sits in the FIRST two bytes of the 4-byte value field
    // in both endians — the trailing pad is written after)
    w16(256); w16(3); w32(1); w16(w); w16(0)
    w16(257); w16(3); w32(1); w16(h); w16(0)
    w32(0) // no next IFD
    out.toByteArray
  }

  def syntheticTiffUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((id: Long) => syntheticTiff(id))

  /** Deterministic minimal-but-REAL media payload for a given id —
    * the driver-verifiable test vector for [[HeaderDecoder]]: dims
    * are closed-form in the id, and the bytes carry them in each
    * format's genuine header encoding (PNG big-endian IHDR, GIF
    * little-endian screen descriptor, JPEG SOF0 behind an APP0
    * segment the marker scan must skip). CRC/pixel data are absent
    * or zeroed — header parsing does not consume them. */
  def syntheticMedia(id: Long): Array[Byte] = {
    val w = 16 + (id % 1000).toInt
    val h = 16 + ((id * 7) % 1000).toInt
    (id % 3) match {
      case 0 =>
        val b = java.nio.ByteBuffer.allocate(33) // 8 sig + 25 IHDR chunk
        b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
        b.putInt(13).put("IHDR".getBytes("US-ASCII"))
        b.putInt(w).putInt(h)
        b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        b.putInt(0) // crc, unchecked by header parse
        b.array()
      case 1 =>
        Array[Int](0xff, 0xd8, // SOI
          0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0 (len 4) to skip
          0xff, 0xc0, 0x00, 0x11, 0x08, // SOF0, len 17, precision 8
          h >> 8, h & 0xff, w >> 8, w & 0xff,
          0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00
        ).map(_.toByte)
      case _ =>
        Array[Int]('G', 'I', 'F', '8', '9', 'a',
          w & 0xff, w >> 8, h & 0xff, h >> 8).map(_.toByte)
    }
  }

  /** [[syntheticMedia]] as a column function (test/demo payloads). */
  def syntheticMediaUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticMedia(id))

  /** Closed-form pixel content for the PNG gate: sample (x, y, c) of
    * doc `id` is (x·3 + y·7 + c·11 + id) mod 256 — arithmetic an
    * independent oracle restates exactly. Dims/channels also
    * closed-form in the id; channels cycle gray/RGB/RGBA so every
    * color-type path is driver-gated. */
  def syntheticRaster(id: Long): Raster = {
    val w = 4 + (id % 5).toInt
    val h = 4 + ((id * 3) % 5).toInt
    val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) = ((x * 3 + y * 7 + c * 11 + id) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(w, h, ch, px)
  }

  /** [[syntheticRaster]] ENCODED as a genuine baseline PNG (real
    * zlib stream, real CRCs, filters cycling per row) — the gate
    * payload whose pixel decode is checkable in closed form. */
  def syntheticPngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => Png.encode(syntheticRaster(id)))

  /** Decoded-pixel row: raster dims + the packed samples; width 0 /
    * empty pixels for payloads outside the supported PNG subset
    * (honest None, never fabricated). */
  case class MediaPixels(id: Long, width: Int, height: Int,
                         channels: Int, pixels: Array[Byte])

  /** Batched partition-wise PIXEL decode (PNG subset — see [[Png]]):
    * the same mapPartitions shape as [[decodeBatch]], producing real
    * rasters instead of header metadata.
    * @param df (id: long, payload: binary) */
  def decodePixelsBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaPixels]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            Png.decode(bytes) match {
              case Some(r) => MediaPixels(id, r.width, r.height, r.channels, r.pixels)
              case None    => MediaPixels(id, 0, 0, 0, Array.emptyByteArray)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Perceptual difference-hash row ([[dhashBatch]]): 64-bit dHash
    * split into two 32-bit halves so every surface stays inside
    * overflow-free BIGINT arithmetic cross-engine (bit 63 of a
    * packed long would need 2^63). Undecodable payloads surface as
    * width 0 with zero hashes. */
  case class MediaDhash(id: Long, width: Int, height: Int,
                        dhash_hi: Long, dhash_lo: Long)

  /** Integer luma of a raster sample: gray = the sample; RGB/RGBA =
    * (299·R + 587·G + 114·B) div 1000 (the classic BT.601 weights on
    * a pinned integer divide — alpha ignored). */
  def lumaAt(r: Raster, x: Int, y: Int): Int = {
    val base = (y * r.width + x) * r.channels
    if (r.channels == 1) r.pixels(base) & 0xff
    else {
      val rr = r.pixels(base) & 0xff
      val gg = r.pixels(base + 1) & 0xff
      val bb = r.pixels(base + 2) & 0xff
      (299 * rr + 587 * gg + 114 * bb) / 1000
    }
  }

  /** dHash (public difference-hash technique, the image near-dup
    * fingerprint): nearest-neighbor sample the luma plane on a 9×8
    * grid (x = j·W div 9, y = i·H div 8 — floor mapping, exact on
    * any dims, up- or down-sampling alike), then bit k = i·8+j set
    * iff luma(i, j+1) > luma(i, j). The IMAGE analogue of SimHash:
    * near-identical images land at small hamming distance, so the
    * dedup family's banded hamming machinery applies unchanged. */
  def dhash(r: Raster): (Long, Long) = {
    val g = Array.ofDim[Int](8, 9)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 9) {
        g(i)(j) = lumaAt(r, j * r.width / 9, i * r.height / 8)
        j += 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (g(i)(j + 1) > g(i)(j)) {
          val k = i * 8 + j
          if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
        }
        j += 1
      }
      i += 1
    }
    (hi, lo)
  }

  /** Batched partition-wise decode → dHash (the [[decodePixelsBatch]]
    * shape); decodes ANY supported raster format by magic sniff
    * ([[decodeAnyRaster]]: PNG, baseline JPEG, GIF — not just PNG).
    * @param df (id: long, payload: binary)
    *
    * CONTRACT for banding callers: undecodable payloads surface as
    * `width = 0` with the zero sentinel hash — they are kept for
    * accounting, but composed with [[graft.operators.Dedup.hammingPairs]]
    * they would form one mutual hamming-0 clique of spurious
    * near-dup pairs, so callers MUST `filter(width > 0)` before
    * banding (the q152 composition does). */
  def dhashBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaDhash]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            decodeAnyRaster(bytes) match {
              case Some(r) =>
                val (hi, lo) = dhash(r)
                MediaDhash(id, r.width, r.height, hi, lo)
              case None => MediaDhash(id, 0, 0, 0L, 0L)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Closed-form synthetic grayscale JPEG: every 8×8 block is FLAT
    * (value = closed form of block coords + id) and the encoder runs
    * at quality 1.0 (all-ones quantization), so each block carries a
    * DC-only spectrum that round-trips BIT-EXACTLY — the one corner
    * of the lossy format where an independent oracle can restate the
    * decoded pixels in closed form. The encoder is the JDK's ImageIO
    * (an independent implementation); the gate therefore exercises
    * this library's real Huffman stream decode, cross-block DC
    * prediction, dequantization and IDCT against bytes it did not
    * produce. Full blocks only (partial-edge padding is
    * encoder-defined and would break closed-form exactness). */
  def syntheticJpegGray(id: Long): Array[Byte] = {
    val bw = 1 + (id % 3).toInt
    val bh = 1 + ((id / 3) % 3).toInt
    val w = 8 * bw
    val h = 8 * bh
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0,
          (((x / 8) * 31 + (y / 8) * 17 + id) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    out.toByteArray
  }

  /** [[syntheticJpegGray]] as a column function. */
  def syntheticJpegGrayUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticJpegGray(id))

  /** [[Jpeg.synthColorBytes]] (hand-built 4:2:0 color fixture) as a
    * column function — the q135 gate's payload. */
  def syntheticJpegColorUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => Jpeg.synthColorBytes(id))

  /** [[decodePixelsBatch]] for the baseline grayscale JPEG envelope
    * ([[Jpeg]]): same mapPartitions shape, honest zero-raster rows
    * outside it. */
  def decodeJpegPixelsBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaPixels]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            Jpeg.decode(bytes) match {
              case Some(r) => MediaPixels(id, r.width, r.height, r.channels, r.pixels)
              case None    => MediaPixels(id, 0, 0, 0, Array.emptyByteArray)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** The q105 fixture raster: indexed content idx(x,y) =
    * (x·3 + y·7 + id) mod 256 through the closed-form palette
    * (5i+1, 7i+2, 11i+3) mod 256 — every RGB sample a formula the
    * oracle restates. */
  def syntheticGifRaster(id: Long): Raster = {
    val w = 6 + (id % 7).toInt
    val h = 6 + ((id * 3) % 7).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = ((x * 3 + y * 7 + id) % 256).toInt
        val o = (y * w + x) * 3
        px(o) = ((idx * 5 + 1) % 256).toByte
        px(o + 1) = ((idx * 7 + 2) % 256).toByte
        px(o + 2) = ((idx * 11 + 3) % 256).toByte
        x += 1
      }
      y += 1
    }
    Raster(w, h, 3, px)
  }

  /** [[syntheticGifRaster]] written by the JDK's INDEPENDENT ImageIO
    * GIF encoder (TYPE_BYTE_INDEXED with the closed-form palette —
    * GIF is lossless on indexed content, so the RGB closed form
    * survives whatever palette layout the writer picks): the [[Gif]]
    * LZW decoder is gated against a bit stream it did not produce. */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = 6 + (id % 7).toInt
    val h = 6 + ((id * 3) % 7).toInt
    val reds = Array.tabulate(256)(i => ((i * 5 + 1) % 256).toByte)
    val greens = Array.tabulate(256)(i => ((i * 7 + 2) % 256).toByte)
    val blues = Array.tabulate(256)(i => ((i * 11 + 3) % 256).toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, reds, greens, blues)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, ((x * 3 + y * 7 + id) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    out.toByteArray
  }

  /** [[syntheticGif]] as a column function. */
  def syntheticGifUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticGif(id))

  /** [[decodePixelsBatch]] for the GIF envelope ([[Gif]]): same
    * mapPartitions shape, honest zero-raster rows outside it. */
  def decodeGifPixelsBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaPixels]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            Gif.decode(bytes) match {
              case Some(r) => MediaPixels(id, r.width, r.height, r.channels, r.pixels)
              case None    => MediaPixels(id, 0, 0, 0, Array.emptyByteArray)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Decoded audio metadata: PCM parameters + exact frame count —
    * all integers, so every derived quantity (duration = n_frames /
    * sample_rate) is closed-form checkable. */
  case class WavMeta(id: Long, sample_rate: Int, channels: Int,
                     bits: Int, data_bytes: Long, n_frames: Long)

  /** REAL WAV (RIFF) header decode — the audio counterpart of the
    * image [[HeaderDecoder]], pure JVM: verifies the RIFF/WAVE
    * container, walks chunks by their declared little-endian sizes
    * (odd-sized chunks pad to even per the RIFF spec), reads the PCM
    * "fmt " parameters and the "data" chunk size, and derives the
    * exact frame count. Anything outside plain PCM (compressed
    * formats, missing/truncated chunks, byte-rate/block-align
    * inconsistent with the stated parameters) decodes honestly as
    * None — no fabricated metadata. Sample decode itself is trivial
    * for PCM but deliberately out of scope here: metadata is what
    * corpus curation filters on.
    */
  object WavDecoder {
    private def u16le(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def u32le(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** Full chunk walk: PCM parameters plus the data chunk's BYTE
      * OFFSET (what the sample decoder needs on top of [[decode]]). */
    def decodeWithOffset(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
        return None
      var off = 12
      var rate = 0; var ch = 0; var bits = 0; var blockAlign = 0; var byteRate = 0L
      var sawFmt = false
      var dataOff = -1
      var dataBytes = -1L
      while (off + 8 <= bytes.length && (dataBytes < 0 || !sawFmt)) {
        val id = tag(bytes, off)
        val len = u32le(bytes, off + 4)
        if (len < 0 || off + 8L + len > bytes.length) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val fmt = u16le(bytes, off + 8)
            if (fmt != 1) return None // PCM only; honest None otherwise
            ch = u16le(bytes, off + 10)
            rate = u32le(bytes, off + 12).toInt
            byteRate = u32le(bytes, off + 16)
            blockAlign = u16le(bytes, off + 20)
            bits = u16le(bytes, off + 22)
            sawFmt = true
          case "data" => dataOff = off + 8; dataBytes = len
          case _ => () // ancillary chunks (LIST, fact, ...) skipped
        }
        off += 8 + len.toInt + (len.toInt & 1) // RIFF pads odd chunks
      }
      if (!sawFmt || dataBytes < 0 || rate <= 0 || ch <= 0 || bits <= 0) return None
      // internal consistency: the stated rates must follow from the
      // PCM parameters, else the header is corrupt
      if (blockAlign != ch * bits / 8 || byteRate != rate.toLong * blockAlign)
        return None
      Some((rate, ch, bits, dataOff, dataBytes))
    }

    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
      decodeWithOffset(bytes).map { case (r, c, b, _, d) => (r, c, b, d) }

    /** One-pass PCM16 sample statistics straight off the data chunk
      * bytes — REAL little-endian int16 decode, constant memory per
      * file (no sample array materializes; the per-partition state is
      * six longs, so the operator is safe on hour-long recordings).
      * Zero-crossing rule: consecutive samples on opposite sides of
      * zero under `s < 0` (sign of exactly-zero is non-negative).
      * PCM16 only — other depths/fmts decode honestly as None; an odd
      * data length contradicts 16-bit frames and also rejects.
      * @return (n_samples, sum, sum of squares, min, max, crossings) */
    def pcm16Stats(bytes: Array[Byte]): Option[(Long, Long, Long, Int, Int, Long)] =
      decodeWithOffset(bytes).flatMap { case (_, _, bits, dataOff, dataBytes) =>
        if (bits != 16 || dataBytes % 2 != 0) None
        else {
          val n = (dataBytes / 2).toInt
          var i = 0
          var sum = 0L; var sumSq = 0L; var zc = 0L
          var mn = Int.MaxValue; var mx = Int.MinValue
          var prevNeg = false
          while (i < n) {
            val s = (((bytes(dataOff + 2 * i + 1) & 0xff) << 8) |
              (bytes(dataOff + 2 * i) & 0xff)).toShort.toInt
            sum += s; sumSq += s.toLong * s
            if (s < mn) mn = s
            if (s > mx) mx = s
            val neg = s < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            i += 1
          }
          if (n == 0) Some((0L, 0L, 0L, 0, 0, 0L))
          else Some((n.toLong, sum, sumSq, mn, mx, zc))
        }
      }

    /** UNNORMALIZED Haar filterbank energies over the first `frame`
      * PCM16 samples (zero-padded when the file is shorter): level k
      * halves the working array with pairwise sums/differences
      * (a(2i)+a(2i+1), a(2i)−a(2i+1) — integer adds only, so the
      * surface is exact cross-engine arithmetic), and E_k = Σ d_k²
      * is the band energy (k = 1 the highest band). The final
      * approximation coefficient is the frame sum; its square comes
      * back beside the band energies. The multiresolution identity
      * approx² + Σ_k 2^(levels−k)·E_k = frame · Σ s² ties the whole
      * surface to [[pcm16Stats]]' sum_sq (spec-pinned) — this is the
      * audio analogue of q102's image-feature leg: a band-energy
      * profile a silence/noise/bandwidth filter thresholds on.
      * `frame` must equal 2^levels. PCM16 only (None otherwise).
      * @return (band energies E_1..E_levels, approx²) */
    def haarEnergies(bytes: Array[Byte], frame: Int,
                     levels: Int): Option[(Array[Long], Long)] = {
      require(frame == (1 << levels),
        s"frame must be 2^levels, got frame=$frame levels=$levels")
      decodeWithOffset(bytes).flatMap { case (_, _, bits, dataOff, dataBytes) =>
        if (bits != 16 || dataBytes % 2 != 0) None
        else {
          val n = (dataBytes / 2).toInt
          val m = math.min(frame, n)
          val a = new Array[Long](frame)
          var i = 0
          while (i < m) {
            a(i) = (((bytes(dataOff + 2 * i + 1) & 0xff) << 8) |
              (bytes(dataOff + 2 * i) & 0xff)).toShort.toLong
            i += 1
          }
          val es = new Array[Long](levels)
          var len = frame
          var k = 0
          while (k < levels) {
            len /= 2
            var e = 0L
            var j = 0
            while (j < len) {
              val s = a(2 * j) + a(2 * j + 1)
              val d = a(2 * j) - a(2 * j + 1)
              e += d * d
              a(j) = s
              j += 1
            }
            es(k) = e
            k += 1
          }
          Some((es, a(0) * a(0)))
        }
      }
    }
  }

  /** Per-file Haar band-energy surface ([[WavDecoder.haarEnergies]]):
    * undecodable/non-PCM16 payloads surface as all-zero energies
    * with ok = false. */
  case class WavHaar(id: Long, ok: Boolean, energies: Seq[Long], approx_sq: Long)

  /** Batched partition-wise Haar energy decode (the
    * [[decodePcm16Batch]] shape — map-side only, a few longs of
    * state per file). @param df (id: long, payload: binary) */
  def decodeHaarBatch(df: DataFrame, frame: Int = 64, levels: Int = 6,
                      batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[WavHaar]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            WavDecoder.haarEnergies(bytes, frame, levels) match {
              case Some((es, ap)) => WavHaar(id, ok = true, es.toSeq, ap)
              case None => WavHaar(id, ok = false, Seq.fill(levels)(0L), 0L)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Closed-form synthetic WAV payload: real RIFF/WAVE byte layout
    * (fmt + a zeroed data chunk) whose PCM parameters and data size
    * are arithmetic in the id — the oracle restates them, so the
    * little-endian chunk walk is what the gate checks. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = 8000 + (id % 5).toInt * 4000
    val ch = 1 + (id % 2).toInt
    val bits = if (id % 3 == 0) 8 else 16
    val nFrames = 100 + (id % 400).toInt
    val blockAlign = ch * bits / 8
    val dataLen = nFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(ch.toShort).putInt(rate)
    b.putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array()
  }

  /** [[syntheticWav]] as a column function. */
  def syntheticWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticWav(id))

  /** Closed-form synthetic PCM16 MONO WAV with real sample content:
    * s(i) = ((id·31 + i·7919) mod 65536) − 32768 — a full-range
    * sawtooth (step 7919 wraps every ~8 samples, so sign crossings
    * are dense) the oracle restates sample-by-sample, making the
    * little-endian int16 decode itself what the gate checks. */
  def syntheticWavPcm16(id: Long): Array[Byte] = {
    val rate = 8000 + (id % 5).toInt * 4000
    val nFrames = 200 + (id % 300).toInt
    val dataLen = nFrames * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(1.toShort).putInt(rate)
    b.putInt(rate * 2).putShort(2.toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      b.putShort((((id * 31 + i.toLong * 7919) % 65536) - 32768).toShort)
      i += 1
    }
    b.array()
  }

  /** [[syntheticWavPcm16]] as a column function. */
  def syntheticWavPcm16Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticWavPcm16(id))

  /** Per-file PCM16 sample statistics: exact integer surfaces (sum,
    * energy, extrema, zero crossings) a quality/silence filter runs —
    * every value closed-form checkable on the synthetic corpus.
    * Undecodable or non-PCM16 payloads surface as n_samples 0. */
  case class WavPcmStats(id: Long, n_samples: Long, sum_s: Long,
                         sum_sq: Long, min_s: Int, max_s: Int, n_zc: Long)

  /** Batched partition-wise PCM16 sample-stat decode ([[decodeWavBatch]]'s
    * shape, one pass over the data chunk, six longs of state per file).
    * @param df (id: long, payload: binary) */
  def decodePcm16Batch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[WavPcmStats]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            WavDecoder.pcm16Stats(bytes) match {
              case Some((n, sum, sumSq, mn, mx, zc)) =>
                WavPcmStats(id, n, sum, sumSq, mn, mx, zc)
              case None => WavPcmStats(id, 0L, 0L, 0L, 0, 0, 0L)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Batched partition-wise WAV metadata decode ([[decodeBatch]]'s
    * shape for the audio column). Undecodable payloads surface as
    * sample_rate 0 — honest, never fabricated.
    * @param df (id: long, payload: binary) */
  def decodeWavBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[WavMeta]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            WavDecoder.decode(bytes) match {
              case Some((rate, ch, bits, dataBytes)) =>
                WavMeta(id, rate, ch, bits, dataBytes,
                  dataBytes / (ch * bits / 8))
              case None => WavMeta(id, 0, 0, 0, 0L, 0L)
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Decoded raster: tightly packed row-major samples, `channels`
    * bytes per pixel (8-bit depth). */
  case class Raster(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** REAL baseline-PNG pixel codec — pure JVM (java.util.zip), zero
    * dependencies, zero egress. Covers the baseline subset a curation
    * pipeline's synthetic/thumbnail rasters live in: 8-bit depth,
    * color types 0 (gray) / 2 (RGB) / 6 (RGBA), no interlace. The
    * decoder parses chunks (CRC-verified), inflates the concatenated
    * IDAT stream, and undoes all five scanline filters (None / Sub /
    * Up / Average / Paeth, RFC 2083 §6); anything outside the subset
    * (palette, 16-bit, interlaced, truncated, bad CRC) decodes
    * honestly as None — no fabricated pixels. JPEG/GIF pixel decode
    * remains the documented native-codec seam.
    */
  object Png {
    private val Sig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def u32be(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def crcOf(typ: Array[Byte], data: Array[Byte], from: Int, len: Int): Long = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ)
      crc.update(data, from, len)
      crc.getValue
    }

    /** Decode a baseline PNG; None on anything outside the supported
      * subset or any structural/CRC/inflate inconsistency. */
    def decode(bytes: Array[Byte]): Option[Raster] = {
      if (bytes.length < Sig.length + 12 || !bytes.startsWith(Sig)) return None
      var off = Sig.length
      var w = 0; var h = 0; var channels = 0
      var sawIhdr = false; var sawEnd = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!sawEnd && off + 12 <= bytes.length) {
        val len = u32be(bytes, off).toInt
        if (len < 0 || off + 12L + len > bytes.length) return None
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        val crc = u32be(bytes, off + 8 + len)
        if (crc != crcOf(java.util.Arrays.copyOfRange(bytes, off + 4, off + 8),
            bytes, off + 8, len)) return None
        typ match {
          case "IHDR" =>
            if (sawIhdr || len != 13) return None
            sawIhdr = true
            w = u32be(bytes, off + 8).toInt
            h = u32be(bytes, off + 12).toInt
            val bitDepth = bytes(off + 16) & 0xff
            val colorType = bytes(off + 17) & 0xff
            val (cmp, flt, ilc) =
              (bytes(off + 18) & 0xff, bytes(off + 19) & 0xff, bytes(off + 20) & 0xff)
            if (w <= 0 || h <= 0 || bitDepth != 8 || cmp != 0 || flt != 0 || ilc != 0)
              return None
            channels = colorType match {
              case 0 => 1
              case 2 => 3
              case 6 => 4
              case _ => return None
            }
          case "IDAT" =>
            if (!sawIhdr) return None
            idat.write(bytes, off + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunks skipped (CRC already checked)
        }
        off += 12 + len
      }
      if (!sawIhdr || !sawEnd) return None
      val bpr = w * channels
      val expect = (bpr + 1) * h
      val raw = new Array[Byte](expect)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val got =
        try {
          var n = 0
          while (n < expect && !inf.finished()) {
            val k = inf.inflate(raw, n, expect - n)
            if (k == 0 && inf.needsInput()) return None // truncated stream
            n += k
          }
          n
        } catch { case _: java.util.zip.DataFormatException => return None }
        finally inf.end()
      if (got != expect) return None
      // unfilter in place into the packed raster
      val out = new Array[Byte](bpr * h)
      var y = 0
      while (y < h) {
        val ft = raw(y * (bpr + 1)) & 0xff
        if (ft > 4) return None
        var i = 0
        while (i < bpr) {
          val x = raw(y * (bpr + 1) + 1 + i) & 0xff
          val left = if (i >= channels) out(y * bpr + i - channels) & 0xff else 0
          val up = if (y > 0) out((y - 1) * bpr + i) & 0xff else 0
          val ul = if (y > 0 && i >= channels) out((y - 1) * bpr + i - channels) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => paeth(left, up, ul)
          }
          out(y * bpr + i) = ((x + pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      Some(Raster(w, h, channels, out))
    }

    /** Encode a raster as a valid baseline PNG. Scanline filters cycle
      * y % 5 so every decoder filter path is exercised by round-trip
      * tests; chunk CRCs are real. */
    def encode(r: Raster): Array[Byte] = {
      val colorType = r.channels match {
        case 1 => 0
        case 3 => 2
        case 4 => 6
        case c => throw new IllegalArgumentException(s"png encode: $c channels")
      }
      require(r.pixels.length == r.width * r.height * r.channels,
        s"png encode: ${r.pixels.length} bytes for ${r.width}x${r.height}x${r.channels}")
      val bpr = r.width * r.channels
      val raw = new Array[Byte]((bpr + 1) * r.height)
      var y = 0
      while (y < r.height) {
        val ft = y % 5
        raw(y * (bpr + 1)) = ft.toByte
        var i = 0
        while (i < bpr) {
          val cur = r.pixels(y * bpr + i) & 0xff
          val left = if (i >= r.channels) r.pixels(y * bpr + i - r.channels) & 0xff else 0
          val up = if (y > 0) r.pixels((y - 1) * bpr + i) & 0xff else 0
          val ul = if (y > 0 && i >= r.channels) r.pixels((y - 1) * bpr + i - r.channels) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => paeth(left, up, ul)
          }
          raw(y * (bpr + 1) + 1 + i) = ((cur - pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      val dfl = new java.util.zip.Deflater()
      dfl.setInput(raw); dfl.finish()
      val buf = new Array[Byte](raw.length + 64)
      val idatOut = new java.io.ByteArrayOutputStream()
      while (!dfl.finished()) idatOut.write(buf, 0, dfl.deflate(buf))
      dfl.end()
      val idat = idatOut.toByteArray
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val t = typ.getBytes("US-ASCII")
        val b = java.nio.ByteBuffer.allocate(12 + data.length)
        b.putInt(data.length).put(t).put(data)
        b.putInt(crcOf(t, data, 0, data.length).toInt)
        b.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(r.width).putInt(r.height)
        .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .array()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Sig)
      out.write(chunk("IHDR", ihdr))
      out.write(chunk("IDAT", idat))
      out.write(chunk("IEND", Array.emptyByteArray))
      out.toByteArray
    }

    /** Nearest-neighbor resize on REAL pixels: target sample (x, y)
      * reads source (x·sw/tw, y·sh/th) — integer floor, the closed
      * form an oracle restates. */
    def resizeNearest(r: Raster, tw: Int, th: Int): Raster = {
      require(tw > 0 && th > 0, s"resize: $tw x $th")
      val out = new Array[Byte](tw * th * r.channels)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * r.height / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * r.width / tw).toInt
          var c = 0
          while (c < r.channels) {
            out((y * tw + x) * r.channels + c) =
              r.pixels((sy * r.width + sx) * r.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Raster(tw, th, r.channels, out)
    }
  }

  /** Pure-JVM GIF pixel decode — the third leg of the pixel-truth
    * trio (PNG [[Png]], JPEG [[Jpeg]]): GIF87a/89a screen descriptor,
    * global/local color tables, extension-block skipping, and a real
    * variable-code-width LZW decompressor (LSB-first bit stream,
    * dictionary growth 9→12 bits, deferred-clear handling), mapping
    * palette indices through the file's color table to an RGB
    * raster, with the standard 4-pass deinterlace when the image
    * descriptor sets the interlace flag (ImageIO's writer interlaces
    * by default, so the gate exercises this path on every payload).
    * Honest None outside the subset: missing color tables, truncated
    * streams, index overruns and dictionary underflows all reject
    * rather than fabricate pixels.
    * First frame only — animation is a container concern
    * ([[frameSampleBatch]] is the framing shape); a frame smaller
    * than the logical screen decodes as that frame's own raster.
    * The q105 gate encodes fixtures with the JDK's INDEPENDENT
    * ImageIO GIF writer, so this LZW decoder is exercised against a
    * bit stream it did not produce (the q101 discipline); gating is
    * on RGB content, which palette re-orderings cannot disturb. */
  object Gif {
    private def u16le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    /** LZW with GIF semantics: returns `expected` palette indices or
      * None on any malformed stream. */
    private def lzw(data: Array[Byte], minCode: Int, expected: Int): Option[Array[Byte]] = {
      if (minCode < 2 || minCode > 11) return None
      val clear = 1 << minCode
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      var i = 0
      while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
      val out = new Array[Byte](expected)
      var outPos = 0
      val stack = new Array[Byte](4096)
      var codeSize = minCode + 1
      var next = eoi + 1
      var prev = -1
      var acc = 0L; var bits = 0; var pos = 0
      def firstOf(code: Int): Byte = {
        var c = code
        while (prefix(c) >= 0) c = prefix(c)
        suffix(c)
      }
      while (outPos < expected) {
        while (bits < codeSize && pos < data.length) {
          acc |= (data(pos) & 0xffL) << bits; bits += 8; pos += 1
        }
        if (bits < codeSize) return None // truncated stream
        val code = (acc & ((1L << codeSize) - 1)).toInt
        acc >>>= codeSize; bits -= codeSize
        if (code == clear) { codeSize = minCode + 1; next = eoi + 1; prev = -1 }
        else if (code == eoi) return None // early EOI: pixels missing
        else {
          if (code > next || (code == next && prev < 0)) return None
          var sp = 0
          if (code == next) { stack(sp) = firstOf(prev); sp += 1 }
          var c = if (code == next) prev else code
          while (c >= 0) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          if (outPos + sp > expected) return None
          while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
          if (prev >= 0 && next < 4096) {
            prefix(next) = prev
            suffix(next) = firstOf(code)
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
      Some(out)
    }

    def decode(bytes: Array[Byte]): Option[Raster] = {
      try {
        if (bytes.length < 14) return None
        val sig = new String(bytes, 0, 6, "US-ASCII")
        if (sig != "GIF87a" && sig != "GIF89a") return None
        val packed = bytes(10) & 0xff
        var pos = 13
        var gct: Array[Byte] = null
        if ((packed & 0x80) != 0) {
          val n = 3 * (1 << ((packed & 7) + 1))
          if (pos + n > bytes.length) return None
          gct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
          pos += n
        }
        while (pos < bytes.length) {
          (bytes(pos) & 0xff) match {
            case 0x21 => // extension: label byte then sub-blocks
              pos += 2
              while (pos < bytes.length && bytes(pos) != 0)
                pos += 1 + (bytes(pos) & 0xff)
              pos += 1
            case 0x2c =>
              if (pos + 10 > bytes.length) return None
              val iw = u16le(bytes, pos + 5)
              val ih = u16le(bytes, pos + 7)
              val ip = bytes(pos + 9) & 0xff
              pos += 10
              val interlaced = (ip & 0x40) != 0
              var table = gct
              if ((ip & 0x80) != 0) {
                val n = 3 * (1 << ((ip & 7) + 1))
                if (pos + n > bytes.length) return None
                table = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
                pos += n
              }
              if (table == null || iw <= 0 || ih <= 0) return None
              val minCode = bytes(pos) & 0xff; pos += 1
              val data = new java.io.ByteArrayOutputStream()
              while (pos < bytes.length && bytes(pos) != 0) {
                val n = bytes(pos) & 0xff
                if (pos + 1 + n > bytes.length) return None
                data.write(bytes, pos + 1, n)
                pos += 1 + n
              }
              return lzw(data.toByteArray, minCode, iw * ih).flatMap { raw =>
                // GIF89a appendix E: rows arrive in passes starting at
                // 0,4,2,1 with strides 8,8,4,2 — map stream row r to
                // its display row
                val idx = if (!interlaced) raw else {
                  val out = new Array[Byte](raw.length)
                  var r = 0
                  for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                    var y = start
                    while (y < ih) {
                      System.arraycopy(raw, r * iw, out, y * iw, iw)
                      r += 1; y += step
                    }
                  }
                  out
                }
                val colors = table.length / 3
                val px = new Array[Byte](iw * ih * 3)
                var j = 0
                var ok = true
                while (ok && j < idx.length) {
                  val v = idx(j) & 0xff
                  if (v >= colors) ok = false // index past the palette
                  else {
                    px(j * 3) = table(v * 3)
                    px(j * 3 + 1) = table(v * 3 + 1)
                    px(j * 3 + 2) = table(v * 3 + 2)
                    j += 1
                  }
                }
                if (ok) Some(Raster(iw, ih, 3, px)) else None
              }
            case 0x3b => return None // trailer before any image
            case _ => return None
          }
        }
        None
      } catch { case _: ArrayIndexOutOfBoundsException => None }
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
    * A payload that decodes under the [[Png]] subset takes the REAL
    * path: pixel decode → nearest-neighbor resample → re-encode as a
    * valid PNG of the target dims. Everything else (JPEG/GIF/junk,
    * where pixel decode is the documented native-codec seam) falls
    * back to the byte-budget stub.
    * @param df (id: long, payload: binary) */
  def resizeBatch(df: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[MediaResized]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            Png.decode(bytes) match {
              case Some(r) =>
                MediaResized(id, w, h, Png.encode(Png.resizeNearest(r, w, h)))
              case None =>
                MediaResized(id, w, h, stubResize(bytes, w, h))
            }
          }
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

  /** Decode ANY supported pixel format by magic-byte sniff: PNG
    * (lossless subset — [[Png]]) or baseline grayscale JPEG
    * ([[Jpeg]]). None outside both envelopes. */
  def decodeAnyRaster(bytes: Array[Byte]): Option[Raster] =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      Png.decode(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      Jpeg.decode(bytes)
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      Gif.decode(bytes)
    else None

  /** REAL pixel features from a decoded raster — the hand-crafted
    * pre-embedding a curation pipeline computes before any learned
    * encoder: per-sample totals, horizontal/vertical gradient
    * energies (the blur/flat-image detector), and a 16-bin intensity
    * histogram. Every surface is an exact integer over the decoded
    * samples, so the whole row gates against a closed-form oracle on
    * synthetic rasters; [[RasterFeatures.feat]] additionally packs
    * the normalized float vector that composes with the ANN
    * operators (Similarity.*TopK).
    * Gradients are per-channel plane differences (|p(x+1,y,c) −
    * p(x,y,c)| and |p(x,y+1,c) − p(x,y,c)|), never across the
    * channel interleave. */
  def rasterFeatures(r: Raster): (Long, Long, Long, Long, Array[Long], Array[Float]) = {
    val w = r.width; val h = r.height; val ch = r.channels
    val n = w.toLong * h * ch
    var sum = 0L; var sq = 0L; var gx = 0L; var gy = 0L
    val bins = new Array[Long](16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          val v = r.pixels((y * w + x) * ch + c) & 0xff
          sum += v; sq += v.toLong * v; bins(v >> 4) += 1
          if (x + 1 < w) gx += math.abs((r.pixels((y * w + x + 1) * ch + c) & 0xff) - v)
          if (y + 1 < h) gy += math.abs((r.pixels(((y + 1) * w + x) * ch + c) & 0xff) - v)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val feat = new Array[Float](20)
    if (n > 0) {
      val mean = sum.toDouble / n
      feat(0) = mean.toFloat
      feat(1) = math.sqrt(math.max(0.0, sq.toDouble / n - mean * mean)).toFloat
      feat(2) = (gx.toDouble / math.max(1L, (w - 1).toLong * h * ch)).toFloat
      feat(3) = (gy.toDouble / math.max(1L, w.toLong * (h - 1) * ch)).toFloat
      var b = 0
      while (b < 16) { feat(4 + b) = (bins(b).toDouble / n).toFloat; b += 1 }
    }
    (sum, sq, gx, gy, bins, feat)
  }

  /** Feature-surface row: exact integer surfaces + the float vector. */
  case class RasterFeatRow(id: Long, n_px: Long, px_sum: Long, px_sq: Long,
                           grad_x: Long, grad_y: Long, bins: Array[Long],
                           feat: Array[Float])

  /** Batched partition-wise REAL feature extraction over any
    * supported pixel payload (PNG / baseline-gray JPEG by sniff);
    * undecodable payloads surface as n_px 0. */
  def rasterFeatureBatch(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.product[RasterFeatRow]
    df.select(col("id"), col("payload"))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            decodeAnyRaster(bytes) match {
              case Some(r) =>
                val (sum, sq, gx, gy, bins, feat) = rasterFeatures(r)
                RasterFeatRow(id, r.width.toLong * r.height * r.channels,
                  sum, sq, gx, gy, bins, feat)
              case None =>
                RasterFeatRow(id, 0L, 0L, 0L, 0L, 0L, new Array[Long](16),
                  new Array[Float](20))
            }
          }
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
          // a full pixel decoder would process `batch` as one native
          // call; the header decode is real (see HeaderDecoder)
          batch.iterator.map { case (id, bytes) => HeaderDecoder.decode(id, bytes) }
        }
      }(enc)
      .toDF()
  }
}
