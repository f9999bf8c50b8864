package graft.operators

/** REAL baseline-JPEG pixel decoder — pure JVM, zero dependencies,
  * the DCT leg beside [[Multimodal.Png]]'s lossless leg.
  *
  * Scope (and the honesty line): baseline sequential DCT (SOF0),
  * Huffman entropy coding, GRAYSCALE and 3-COMPONENT YCbCr frames
  * with sampling factors 1 or 2 per axis — which covers 4:4:4,
  * 4:2:2 and the crawl-dominant 4:2:0. Everything in that envelope
  * is decoded for real: marker walk, DQT/DHT table construction
  * (canonical Huffman from BITS/HUFFVAL), the byte-stuffed entropy
  * bit stream, the interleaved MCU walk (h×v blocks per component,
  * per-component DC predictors), dequantization, zig-zag, a
  * double-precision separable inverse DCT, level shift, per-plane
  * edge clipping, nearest-neighbor chroma upsampling and the JFIF
  * YCbCr→RGB conversion. Restart markers reset ALL DC predictors
  * and byte-align, per spec.
  *
  * Pinned conversion arithmetic (decoders are permitted to vary;
  * ours is DEFINED so an oracle can restate it): upsampling is
  * sample replication (pixel (x,y) reads chroma plane
  * (x·h/Hmax, y·v/Vmax), floor division — libjpeg's "fancy"
  * triangle filter is a different conforming choice, which is why
  * ImageIO parity on non-flat content is spec territory), and
  * YCbCr→RGB is the JFIF real-number formula rounded half-up:
  * R = Y + 1.402·(Cr−128), G = Y − 0.344136·(Cb−128) −
  * 0.714136·(Cr−128), B = Y + 1.772·(Cb−128), each
  * floor(v + 0.5) then clamped to [0, 255].
  *
  * Progressive (SOF2), arithmetic coding, 12-bit precision and
  * sampling factors > 2 decode honestly as None — header metadata
  * for those still comes from [[Multimodal.HeaderDecoder]]. The
  * JPEG spec permits small IDCT variance between conforming
  * decoders; the spec pins this decoder within ±1 level of the
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

  /** One frame component: id + sampling factors + table selectors
    * (scan selectors filled at SOS). */
  private final class Comp(val cid: Int, val h: Int, val v: Int, val tq: Int) {
    var dcSel: Int = -1
    var acSel: Int = -1
  }

  /** Decode a baseline JPEG (grayscale or 3-component YCbCr,
    * sampling factors ≤ 2) to a [[Multimodal.Raster]] (channels = 1
    * or 3, RGB interleaved). None outside the supported envelope or
    * on any structural corruption — never a fabricated raster. */
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
    var restartInterval = 0
    var comps: Array[Comp] = null

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
          if (nComp != 1 && nComp != 3) return None
          comps = Array.tabulate(nComp) { c =>
            val cid = bytes(seg + 6 + 3 * c) & 0xff
            val hv = bytes(seg + 7 + 3 * c) & 0xff
            val h = (hv >> 4) & 0x0f
            val v = hv & 0x0f
            if (h < 1 || h > 2 || v < 1 || v > 2) return None
            new Comp(cid, h, v, bytes(seg + 8 + 3 * c) & 0x0f)
          }
          if (nComp == 1 && (comps(0).h != 1 || comps(0).v != 1)) return None
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 ||
            (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcf && m != 0xcc) =>
          return None // extended/progressive/lossless/arithmetic: out of envelope
        case 0xdd => // DRI
          restartInterval = u16(bytes, seg)
        case 0xda => // SOS
          if (comps == null) return None
          val ns = bytes(seg) & 0xff
          if (ns != comps.length) return None
          var s = 0
          while (s < ns) {
            val cid = bytes(seg + 1 + 2 * s) & 0xff
            val c = comps.find(_.cid == cid).getOrElse(return None)
            c.dcSel = (bytes(seg + 2 + 2 * s) & 0xf0) >> 4
            c.acSel = bytes(seg + 2 + 2 * s) & 0x0f
            s += 1
          }
          if (comps.exists(c => qt(c.tq) == null || dcT(c.dcSel) == null ||
            acT(c.acSel) == null)) return None
          return Some(decodeScan(bytes, seg + len - 2, width, height, comps,
            qt, dcT, acT, restartInterval))
        case _ => () // APPn / COM / others skipped
      }
      pos = seg + len - 2
    }
    None
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** Interleaved-MCU scan decode: per MCU, each component contributes
    * h×v blocks (raster order) into its own plane at the plane's
    * natural (subsampled) resolution; per-component DC predictors;
    * restart resets them all. Planes are edge-clipped, then chroma
    * is replicated up and converted per the pinned JFIF arithmetic
    * in the header doc. */
  private def decodeScan(bytes: Array[Byte], scanStart: Int, width: Int,
                         height: Int, comps: Array[Comp],
                         qt: Array[Array[Int]], dcT: Array[Huff],
                         acT: Array[Huff],
                         restartInterval: Int): Multimodal.Raster = {
    require(width > 0 && height > 0, "bad dimensions")
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane at its natural resolution
    val planeW = comps.map(c => (width * c.h + hMax - 1) / hMax)
    val planeH = comps.map(c => (height * c.v + vMax - 1) / vMax)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    val pred = new Array[Int](comps.length)
    val br = new BitReader(bytes, scanStart)
    var mcu = 0
    val block = new Array[Double](64)
    var mcuY = 0
    while (mcuY < mcusY) {
      var mcuX = 0
      while (mcuX < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          val dc = dcT(c.dcSel)
          val ac = acT(c.acSel)
          var bv = 0
          while (bv < c.v) {
            var bhh = 0
            while (bhh < c.h) {
              java.util.Arrays.fill(block, 0.0)
              // DC
              val t = dc.decode(br)
              val diff = extend(br.receive(t), t)
              pred(ci) += diff
              block(0) = pred(ci).toDouble * q(0)
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
              // level shift + clamp + clip past the plane edge
              val x0 = (mcuX * c.h + bhh) * 8
              val y0 = (mcuY * c.v + bv) * 8
              var yy = 0
              while (yy < 8) {
                val py = y0 + yy
                if (py < planeH(ci)) {
                  var xx = 0
                  while (xx < 8) {
                    val px = x0 + xx
                    if (px < planeW(ci)) {
                      val v = math.round(block(yy * 8 + xx) + 128.0).toInt
                      planes(ci)(py * planeW(ci) + px) =
                        (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                    }
                    xx += 1
                  }
                }
                yy += 1
              }
              bhh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mcuX += 1
      }
      mcuY += 1
    }

    if (comps.length == 1)
      return Multimodal.Raster(width, height, 1, planes(0))

    // upsample (replication, floor coords) + JFIF YCbCr -> RGB
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        def sample(ci: Int): Int = {
          val c = comps(ci)
          val sx = x * c.h / hMax
          val sy = y * c.v / vMax
          planes(ci)(sy * planeW(ci) + sx) & 0xff
        }
        val yv = sample(0).toDouble
        val cbd = (sample(1) - 128).toDouble
        val crd = (sample(2) - 128).toDouble
        val o = (y * width + x) * 3
        out(o) = clamp255(math.round(yv + 1.402 * crd)).toByte
        out(o + 1) = clamp255(math.round(yv - 0.344136 * cbd - 0.714136 * crd)).toByte
        out(o + 2) = clamp255(math.round(yv + 1.772 * cbd)).toByte
        x += 1
      }
      y += 1
    }
    Multimodal.Raster(width, height, 3, out)
  }

  // ---------------------------------------------------------------
  // Synthetic 4:2:0 COLOR fixture encoder (the q135 gate's bytes).
  //
  // The grayscale gate (q101) could lean on ImageIO because a gray
  // frame has no color transform; a color gate cannot — the
  // encoder's RGB→YCbCr fixed-point and the decoder's YCbCr→RGB are
  // independent roundings, so closed-form pixel exactness dies in
  // transit. The fix: hand-construct the JPEG BYTES directly in
  // YCbCr space (all-ones quant tables, DC-only flat blocks — the
  // exact-round-trip corner q101 established), choose Y per 8×8
  // block and Cb/Cr per 16×16 tile in closed form, and let the gate
  // restate this decoder's PINNED conversion arithmetic. ImageIO
  // then serves as the independent cross-check in the SPEC (its
  // decoder reads these bytes; parity within ±1 per channel).
  //
  // Layout exercised: 32×24 frame, components Y(2,2) Cb(1,1) Cr(1,1)
  // (4:2:0), TWO quant tables, Annex K DC tables (ITU T.81, public)
  // + minimal EOB-only AC tables, DRI=2 with an RST marker mid-scan
  // (multi-component predictor reset), a padding luma block row
  // (encoder emits full MCUs; plane clipping discards), and a
  // half-clipped chroma block row.
  // ---------------------------------------------------------------

  /** Fixture frame: 32×24, luma block grid 4×3, chroma tile grid 2×2. */
  val SynthColorW = 32
  val SynthColorH = 24

  /** Flat Y of luma block (bx, by): 16 + (13·id + 17·(4·by + bx)) % 200. */
  def synthColorY(id: Long, bx: Int, by: Int): Int =
    (16 + ((13 * id + 17 * (4 * by + bx)) % 200)).toInt

  /** Flat Cb of 16×16 tile (tx, ty): 78 + (7·id + 29·(2·ty + tx)) % 100. */
  def synthColorCb(id: Long, tx: Int, ty: Int): Int =
    (78 + ((7 * id + 29 * (2 * ty + tx)) % 100)).toInt

  /** Flat Cr of 16×16 tile (tx, ty): 53 + (11·id + 31·(2·ty + tx)) % 150. */
  def synthColorCr(id: Long, tx: Int, ty: Int): Int =
    (53 + ((11 * id + 31 * (2 * ty + tx)) % 150)).toInt

  /** Canonical Huffman ENCODING table from the same BITS/HUFFVAL
    * layout the decoder consumes: symbol -> (code, length). */
  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out(vals(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.toMap
  }

  // ITU T.81 Annex K typical DC tables (public spec tables)
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  // minimal AC table: the single EOB symbol as a 1-bit code
  private val AcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0x00)

  /** Entropy bit writer with FF byte stuffing and RST emission. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** pad to byte boundary with 1s, per spec */
    def align(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    def rst(n: Int): Unit = { align(); out.write(0xff); out.write(0xd0 + n) }
  }

  private def dcCategory(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def putDcDiff(bw: BitWriter, codes: Map[Int, (Int, Int)], diff: Int): Unit = {
    val t = dcCategory(diff)
    val (c, l) = codes(t)
    bw.put(c, l)
    if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
  }

  /** Build the complete fixture JPEG bytes for `id`. */
  def synthColorBytes(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16o(v: Int): Unit = { u8(v >> 8); u8(v) }
    u8(0xff); u8(0xd8) // SOI
    // DQT: two all-ones tables (0 luma, 1 chroma)
    u8(0xff); u8(0xdb); u16o(2 + 65 * 2)
    u8(0x00); (0 until 64).foreach(_ => u8(1))
    u8(0x01); (0 until 64).foreach(_ => u8(1))
    // SOF0: 3 comps, Y 2x2 q0, Cb 1x1 q1, Cr 1x1 q1
    u8(0xff); u8(0xc0); u16o(8 + 3 * 3)
    u8(8); u16o(SynthColorH); u16o(SynthColorW); u8(3)
    u8(1); u8(0x22); u8(0)
    u8(2); u8(0x11); u8(1)
    u8(3); u8(0x11); u8(1)
    // DHT: DC0 (Annex K luma), AC0 (EOB-only), DC1 (Annex K chroma), AC1
    val tables = Seq(
      (0x00, DcLumaBits, DcVals), (0x10, AcBits, AcVals),
      (0x01, DcChromaBits, DcVals), (0x11, AcBits, AcVals))
    u8(0xff); u8(0xc4)
    u16o(2 + tables.map(t => 17 + t._3.length).sum)
    tables.foreach { case (tcth, bits, vals) =>
      u8(tcth); bits.foreach(u8); vals.foreach(u8)
    }
    // DRI: restart every 2 MCUs
    u8(0xff); u8(0xdd); u16o(4); u16o(2)
    // SOS
    u8(0xff); u8(0xda); u16o(6 + 2 * 3)
    u8(3); u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    // entropy data: 2x2 MCUs; per MCU 4 Y blocks + Cb + Cr, DC-only
    val dcLuma = huffCodes(DcLumaBits, DcVals)
    val dcChroma = huffCodes(DcChromaBits, DcVals)
    val acCode = huffCodes(AcBits, AcVals)(0x00)
    val bw = new BitWriter(out)
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0
    var mcuY = 0
    while (mcuY < 2) {
      var mcuX = 0
      while (mcuX < 2) {
        if (mcu > 0 && mcu % 2 == 0) {
          bw.rst((mcu / 2 - 1) % 8)
          predY = 0; predCb = 0; predCr = 0
        }
        var bv = 0
        while (bv < 2) {
          var bh = 0
          while (bh < 2) {
            val bx = mcuX * 2 + bh
            val by = mcuY * 2 + bv
            // padding block row (by == 3) repeats the predictor
            val dc = if (by < 3) (synthColorY(id, bx, by) - 128) * 8 else predY
            putDcDiff(bw, dcLuma, dc - predY)
            predY = dc
            bw.put(acCode._1, acCode._2) // EOB
            bh += 1
          }
          bv += 1
        }
        val dcCb = (synthColorCb(id, mcuX, mcuY) - 128) * 8
        putDcDiff(bw, dcChroma, dcCb - predCb); predCb = dcCb
        bw.put(acCode._1, acCode._2)
        val dcCr = (synthColorCr(id, mcuX, mcuY) - 128) * 8
        putDcDiff(bw, dcChroma, dcCr - predCr); predCr = dcCr
        bw.put(acCode._1, acCode._2)
        mcu += 1
        mcuX += 1
      }
      mcuY += 1
    }
    bw.align()
    u8(0xff); u8(0xd9) // EOI
    out.toByteArray
  }
}
