package graft

import graft.operators.{Jpeg, Multimodal}

/** Color-baseline JPEG: the hand-built 4:2:0 fixture decodes to its
  * closed forms EXACTLY (the q135 gate's contract), and the JDK's
  * independent ImageIO implementation agrees within the conversion
  * rounding the spec permits. */
class JpegColorSpec extends SparkSuite {

  /** The pinned JFIF conversion (same arithmetic as the decoder). */
  private def rgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cbd = (cb - 128).toDouble
    val crd = (cr - 128).toDouble
    def cl(v: Long) = math.max(0L, math.min(255L, v)).toInt
    (cl(math.round(yv + 1.402 * crd)),
      cl(math.round(yv - 0.344136 * cbd - 0.714136 * crd)),
      cl(math.round(yv + 1.772 * cbd)))
  }

  test("synthetic 4:2:0 fixture decodes BIT-EXACTLY to its closed forms " +
    "(DC-only blocks, padding row clipped, chroma row half-clipped, RST reset)") {
    for (id <- Seq(0L, 1L, 7L, 42L, 199L, 1234L)) {
      val r = Jpeg.decode(Jpeg.synthColorBytes(id))
        .getOrElse(fail(s"id=$id: decode returned None"))
      assert(r.width === Jpeg.SynthColorW && r.height === Jpeg.SynthColorH)
      assert(r.channels === 3)
      var bad = 0
      for (y <- 0 until r.height; x <- 0 until r.width) {
        val yv = Jpeg.synthColorY(id, x / 8, y / 8)
        val (er, eg, eb) = rgb(yv,
          Jpeg.synthColorCb(id, x / 16, y / 16),
          Jpeg.synthColorCr(id, x / 16, y / 16))
        val o = (y * r.width + x) * 3
        if ((r.pixels(o) & 0xff) != er || (r.pixels(o + 1) & 0xff) != eg ||
          (r.pixels(o + 2) & 0xff) != eb) bad += 1
      }
      assert(bad === 0, s"id=$id: $bad mismatched pixels")
    }
  }

  /** Chroma-interior pixels: where replication and libjpeg-style
    * triangle ("fancy") upsampling provably agree for per-tile-flat
    * chroma — away from 16×16 tile boundaries, every neighboring
    * chroma sample is identical, so any conforming upsampler returns
    * the same value. AT the boundaries the two conforming choices
    * genuinely differ (triangle blends adjacent tiles), which is why
    * the parity pin is interior-only. */
  private def chromaInterior(x: Int, y: Int): Boolean =
    (x % 16) >= 2 && (x % 16) <= 13 && (y % 16) >= 2 && (y % 16) <= 13

  test("ImageIO (independent decoder) reads the fixture bytes within ±1 " +
    "per channel of this decoder on chroma-interior pixels") {
    for (id <- Seq(3L, 11L, 77L)) {
      val bytes = Jpeg.synthColorBytes(id)
      val ours = Jpeg.decode(bytes).get
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id=$id: ImageIO rejected the fixture")
      assert(img.getWidth === ours.width && img.getHeight === ours.height)
      var maxd = 0
      var n = 0
      for (y <- 0 until ours.height; x <- 0 until ours.width
           if chromaInterior(x, y)) {
        val p = img.getRGB(x, y)
        val o = (y * ours.width + x) * 3
        maxd = math.max(maxd, math.abs(((p >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
        maxd = math.max(maxd, math.abs(((p >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
        maxd = math.max(maxd, math.abs((p & 0xff) - (ours.pixels(o + 2) & 0xff)))
        n += 1
      }
      assert(n > 0)
      assert(maxd <= 1, s"id=$id: interior max channel delta $maxd > 1")
    }
  }

  test("bytes ImageIO ENCODED (flat 16x16 color tiles, q=1.0) decode " +
    "within ±2 per channel of ImageIO's own reading") {
    for (id <- Seq(5L, 23L)) {
      val w = 32; val h = 32
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val t = (y / 16) * 2 + (x / 16)
        val r = ((37 * id + 51 * t) % 256).toInt
        val g = ((91 * id + 17 * t) % 256).toInt
        val b = ((13 * id + 77 * t) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(1.0f)
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose()
      val bytes = bos.toByteArray
      val ours = Jpeg.decode(bytes)
        .getOrElse(fail(s"id=$id: ImageIO-encoded color JPEG out of envelope"))
      assert(ours.channels === 3 && ours.width === w && ours.height === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxd = 0
      var n = 0
      for (y <- 0 until h; x <- 0 until w if chromaInterior(x, y)) {
        val p = ref.getRGB(x, y)
        val o = (y * w + x) * 3
        maxd = math.max(maxd, math.abs(((p >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
        maxd = math.max(maxd, math.abs(((p >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
        maxd = math.max(maxd, math.abs((p & 0xff) - (ours.pixels(o + 2) & 0xff)))
        n += 1
      }
      assert(n > 0)
      assert(maxd <= 2, s"id=$id: interior max channel delta $maxd > 2")
    }
  }

  test("grayscale envelope unchanged: 1-component fixtures still decode " +
    "and 3-component progressive still refuses") {
    val gray = Multimodal.syntheticJpegGray(9L)
    val r = Jpeg.decode(gray).get
    assert(r.channels === 1)
    // progressive color (SOF2) must stay an honest None
    val prog = gray.clone()
    var i = 2
    var patched = false
    while (i + 1 < prog.length && !patched) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; patched = true
      }
      i += 1
    }
    assert(patched && Jpeg.decode(prog).isEmpty)
  }
}
