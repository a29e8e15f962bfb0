package graft.ext

/** Minimal pure-JVM QOI codec ("Quite OK Image") — the FOURTH compressed
  * codec and the fourth distinct compression family in the multimodal
  * path: m10 = DEFLATE (LZ77 + Huffman), m11 = Rice residuals, m12 =
  * dictionary LZW, m13 = QOI's pixel-predictive op stream (run-length +
  * recent-color index + small wrapped deltas). The format is public: the
  * one-page specification at qoiformat.org.
  *
  * Layout implemented (the strict 3-channel subset):
  *   header  "qoif", width u32 BE, height u32 BE, channels=3,
  *           colorspace ∈ {0, 1}
  *   ops     QOI_OP_RGB   11111110 r g b
  *           QOI_OP_INDEX 00iiiiii       (64-entry hash table,
  *                                        hash = (3r+5g+7b+11a) mod 64)
  *           QOI_OP_DIFF  01drdgdb       (2-bit channel deltas, −2..1,
  *                                        byte-wrapping)
  *           QOI_OP_LUMA  10dddddd drdg:4 dbdg:4  (dg −32..31, dr−dg and
  *                                        db−dg −8..7, byte-wrapping)
  *           QOI_OP_RUN   11rrrrrr       (run 1..62; 63/64 are the
  *                                        RGB/RGBA tags)
  *   end     seven 0x00 bytes then 0x01
  *
  * Decoder state starts as prev = (0,0,0,255), index all-zero — and the
  * encoder never hits an unset index slot because every stored entry
  * carries alpha 255 (packed value ≠ 0), mirroring the reference
  * encoder's behavior exactly.
  *
  * `parse` is strict in the family's style: magic, bounded dims, the
  * 3-channel/colorspace subset only, every op length-checked against the
  * end marker, runs may not overrun the pixel count, the byte stream
  * must end exactly at the 8-byte end marker. All bounds are checked
  * before reads — CodecFuzzSpec drives adversarial bytes through it.
  */
object Qoi {

  /** Decoded image; `samples` row-major, 3 bytes per pixel (R, G, B). */
  final case class Rgb(width: Int, height: Int, samples: Array[Byte])

  private val MaxDim = 1 << 14 // 16384² sanity bound, like Pgm/Bmp/Ppm

  private def hash(r: Int, g: Int, b: Int): Int =
    (r * 3 + g * 5 + b * 7 + 255 * 11) % 64

  /** Encode an [[Rgb]] as a canonical QOI byte stream. */
  def encode(img: Rgb): Array[Byte] = {
    require(img.samples.length == 3 * img.width * img.height,
      s"sample count ${img.samples.length} != 3x${img.width}x${img.height}")
    val out = new java.io.ByteArrayOutputStream(img.samples.length / 2 + 32)
    def u32be(v: Int): Unit = {
      out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    u32be(img.width); u32be(img.height)
    out.write(3); out.write(0)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    var run = 0
    // two's-complement byte wrap, per the spec's "wraparound" rule
    def w8(v: Int): Int = ((v + 128) & 0xff) - 128
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val r = img.samples(3 * i) & 0xff
      val g = img.samples(3 * i + 1) & 0xff
      val b = img.samples(3 * i + 2) & 0xff
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val h = hash(r, g, b)
        val packed = (r << 24) | (g << 16) | (b << 8) | 255
        if (index(h) == packed) out.write(h)
        else {
          index(h) = packed
          val dr = w8(r - pr); val dg = w8(g - pg); val db = w8(b - pb)
          val drg = w8(dr - dg); val dbg = w8(db - dg)
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7
              && dbg >= -8 && dbg <= 7) {
            out.write(0x80 | (dg + 32))
            out.write(((drg + 8) << 4) | (dbg + 8))
          } else {
            out.write(0xfe); out.write(r); out.write(g); out.write(b)
          }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    var k = 0
    while (k < 7) { out.write(0); k += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Ops-seen bit positions reported by [[parse]]: RUN=1, INDEX=2,
    * DIFF=4, LUMA=8, RGB=16. */
  val OpRun = 1; val OpIndex = 2; val OpDiff = 4; val OpLuma = 8; val OpRgb = 16

  /** Strict parse of the 3-channel subset; returns the image and the
    * bitmask of op families encountered, or None on ANY malformation. */
  def parse(bytes: Array[Byte]): Option[(Rgb, Int)] = {
    if (bytes.length < 14 + 8) return None
    if (bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' || bytes(3) != 'f')
      return None
    def u32be(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val w = u32be(4); val h = u32be(8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    if ((bytes(12) & 0xff) != 3 || (bytes(13) & 0xff) > 1) return None
    val n = (w * h).toInt
    val out = new Array[Byte](3 * n)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    var pos = 14
    val opEnd = bytes.length - 8 // ops must stop at the end marker
    var ops = 0
    var i = 0
    while (i < n) {
      if (pos >= opEnd) return None
      val b0 = bytes(pos) & 0xff; pos += 1
      var emit = 1
      if (b0 == 0xfe) { // QOI_OP_RGB
        if (pos + 3 > opEnd) return None
        pr = bytes(pos) & 0xff; pg = bytes(pos + 1) & 0xff
        pb = bytes(pos + 2) & 0xff; pos += 3
        ops |= OpRgb
      } else if (b0 == 0xff) { // QOI_OP_RGBA — outside the strict subset
        return None
      } else (b0 >>> 6) match {
        case 0 => // QOI_OP_INDEX
          val v = index(b0 & 0x3f)
          if ((v & 0xff) != 255) return None // unset slot: encoder never emits
          pr = v >>> 24; pg = (v >>> 16) & 0xff; pb = (v >>> 8) & 0xff
          ops |= OpIndex
        case 1 => // QOI_OP_DIFF
          pr = (pr + ((b0 >>> 4) & 3) - 2) & 0xff
          pg = (pg + ((b0 >>> 2) & 3) - 2) & 0xff
          pb = (pb + (b0 & 3) - 2) & 0xff
          ops |= OpDiff
        case 2 => // QOI_OP_LUMA
          if (pos >= opEnd) return None
          val b1 = bytes(pos) & 0xff; pos += 1
          val dg = (b0 & 0x3f) - 32
          pr = (pr + dg + ((b1 >>> 4) & 0xf) - 8) & 0xff
          pg = (pg + dg) & 0xff
          pb = (pb + dg + (b1 & 0xf) - 8) & 0xff
          ops |= OpLuma
        case _ => // QOI_OP_RUN
          emit = (b0 & 0x3f) + 1 // 1..62 (63/64 are the RGB/RGBA tags)
          ops |= OpRun
      }
      if (i + emit > n) return None // run overruns the raster
      index(hash(pr, pg, pb)) = (pr << 24) | (pg << 16) | (pb << 8) | 255
      var k = 0
      while (k < emit) {
        out(3 * i) = pr.toByte; out(3 * i + 1) = pg.toByte
        out(3 * i + 2) = pb.toByte
        i += 1; k += 1
      }
    }
    // the stream must end exactly at the 8-byte end marker
    if (pos + 8 != bytes.length) return None
    var z = 0
    while (z < 7) { if (bytes(pos + z) != 0) return None; z += 1 }
    if (bytes(pos + 7) != 1) return None
    Some((Rgb(w.toInt, h.toInt, out), ops))
  }
}
