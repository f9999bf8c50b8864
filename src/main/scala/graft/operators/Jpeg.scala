package graft.operators

/** REAL baseline-JPEG pixel decoder — pure JVM, zero dependencies,
  * the DCT leg beside [[Multimodal.Png]]'s lossless leg.
  *
  * Scope (and the honesty line): baseline sequential DCT (SOF0),
  * Huffman entropy coding, SINGLE-component (grayscale) frames —
  * the shape `ImageIO.write(TYPE_BYTE_GRAY, "jpg")` produces and the
  * simplest form a thumbnail/feature pipeline meets. Everything in
  * that envelope is decoded for real: marker walk, DQT/DHT table
  * construction (canonical Huffman from BITS/HUFFVAL), the
  * byte-stuffed entropy bit stream, DC prediction + AC run-length,
  * dequantization, zig-zag, a double-precision separable inverse
  * DCT, level shift and clamp. Restart markers reset the DC
  * predictor and byte-align, per spec.
  *
  * Color frames (3-component YCbCr), progressive (SOF2), arithmetic
  * coding and 12-bit precision decode honestly as None — header
  * metadata for those still comes from [[Multimodal.HeaderDecoder]].
  * The JPEG spec permits small IDCT variance between conforming
  * decoders; the spec pins this decoder within ±1 gray level of the
  * JDK's independent ImageIO implementation on round-trip fixtures.
  */
object Jpeg {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: maxcode/mincode/valptr decode per the
    * spec's F.16 flow (slow-but-simple bitwise walk — fine for the
    * fixture scale; a production path would add a lookup table). */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.bit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new IllegalStateException("bad huffman code")
      vals(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** Entropy-coded segment reader: FF00 unstuffs to FF; any other
    * FFxx is a marker — RSTn are consumed by [[restart]], anything
    * else ends the scan data. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) throw new IllegalStateException("eof in scan")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) throw new IllegalStateException("eof after ff")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed
          else throw new MarkerHit(m)
          b = 0xff
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def byteAlign(): Unit = nbits = 0
    /** consume an expected RSTn marker at the current byte position */
    def restart(): Unit = {
      byteAlign()
      if (pos + 1 >= bytes.length || (bytes(pos) & 0xff) != 0xff)
        throw new IllegalStateException("expected restart marker")
      val m = bytes(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw new IllegalStateException("expected RSTn")
      pos += 2
    }
  }
  private final class MarkerHit(val marker: Int) extends RuntimeException

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** In-place separable double-precision IDCT over one 8×8 block
    * (the spec's reference cosine basis; conforming decoders may
    * differ by ±1 after rounding). */
  private def idct(b: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    val c = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
    val cosT = Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
    var y = 0
    while (y < 8) { // rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += c(u) * b(y * 8 + u) * cosT(x)(u); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += c(v) * tmp(v * 8 + x) * cosT(yy)(v); v += 1 }
        b(yy * 8 + x) = s / 2.0
        yy += 1
      }
      x += 1
    }
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Decode a baseline grayscale JPEG to a [[Multimodal.Raster]]
    * (channels = 1). None outside the supported envelope or on any
    * structural corruption — never a fabricated raster. */
  def decode(bytes: Array[Byte]): Option[Multimodal.Raster] = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Multimodal.Raster] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None // no SOI
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var width = 0
    var height = 0
    var qSel = -1
    var restartInterval = 0
    var dcSel = -1
    var acSel = -1
    var sawSof = false

    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      val len = u16(bytes, pos + 2)
      val seg = pos + 4
      if (seg + len - 2 > bytes.length) return None
      marker match {
        case 0xdb => // DQT (possibly several tables per segment)
          var p = seg
          while (p < seg + len - 2) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0) return None // 16-bit tables: out of envelope
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = bytes(p + 1 + i) & 0xff; i += 1 }
            qt(tq) = t
            p += 65
          }
        case 0xc4 => // DHT
          var p = seg
          while (p < seg + len - 2) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
            if (tc == 0) dcT(th) = new Huff(bits, vals)
            else acT(th) = new Huff(bits, vals)
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          val precision = bytes(seg) & 0xff
          if (precision != 8) return None
          height = u16(bytes, seg + 1)
          width = u16(bytes, seg + 3)
          val nComp = bytes(seg + 5) & 0xff
          if (nComp != 1) return None // grayscale envelope only
          val hv = bytes(seg + 7) & 0xff
          if (hv != 0x11) return None // 1x1 sampling (trivially true for 1 comp)
          qSel = bytes(seg + 8) & 0x0f
          sawSof = true
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 ||
            (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcf && m != 0xcc) =>
          return None // extended/progressive/lossless/arithmetic: out of envelope
        case 0xdd => // DRI
          restartInterval = u16(bytes, seg)
        case 0xda => // SOS
          if (!sawSof) return None
          val ns = bytes(seg) & 0xff
          if (ns != 1) return None
          dcSel = (bytes(seg + 2) & 0xf0) >> 4
          acSel = bytes(seg + 2) & 0x0f
          val q = qt(qSel)
          val dc = dcT(dcSel)
          val ac = acT(acSel)
          if (q == null || dc == null || ac == null) return None
          return Some(decodeScan(bytes, seg + len - 2, width, height, q, dc, ac,
            restartInterval))
        case _ => () // APPn / COM / others skipped
      }
      pos = seg + len - 2
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, width: Int,
                         height: Int, q: Array[Int], dc: Huff, ac: Huff,
                         restartInterval: Int): Multimodal.Raster = {
    require(width > 0 && height > 0, "bad dimensions")
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val out = new Array[Byte](width * height)
    val br = new BitReader(bytes, scanStart)
    var pred = 0
    var mcu = 0
    val block = new Array[Double](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          pred = 0
        }
        java.util.Arrays.fill(block, 0.0)
        // DC
        val t = dc.decode(br)
        val diff = extend(br.receive(t), t)
        pred += diff
        block(0) = pred.toDouble * q(0)
        // AC
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = ac.decode(br)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else eob = true // EOB
          } else {
            k += r
            if (k > 63) throw new IllegalStateException("AC index overrun")
            block(ZigZag(k)) = extend(br.receive(s), s).toDouble * q(k)
            k += 1
          }
        }
        idct(block)
        // level shift + clamp + clip partial edge blocks
        var yy = 0
        while (yy < 8) {
          val py = by * 8 + yy
          if (py < height) {
            var xx = 0
            while (xx < 8) {
              val px = bx * 8 + xx
              if (px < width) {
                val v = math.round(block(yy * 8 + xx) + 128.0).toInt
                out(py * width + px) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              }
              xx += 1
            }
          }
          yy += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    Multimodal.Raster(width, height, 1, out)
  }
}
