package graft.ext

/** Minimal pure-JVM TGA (Truevision TARGA) codec, image type 10 —
  * RLE-compressed 24-bit true color. The FIFTH compressed codec and the
  * fifth distinct compression family in the multimodal path: m10 =
  * DEFLATE (LZ77 + Huffman), m11 = Rice residuals, m12 = dictionary
  * LZW, m13 = QOI's pixel-predictive op stream, m14 = TGA's plain
  * run-length packets — the simplest scheme in the family, and the one
  * whose decode hazards are all LAYOUT, not entropy: BGR byte order,
  * bottom-up row storage, and the packets-may-not-cross-scanlines rule.
  * The format is public (Truevision TGA File Format Specification 2.0).
  *
  * Layout implemented (the strict type-10 subset):
  *   header  18 bytes LE: idLength=0, colorMapType=0, imageType=10,
  *           colorMapSpec=5×0, xOrigin=0, yOrigin=0, width u16,
  *           height u16, pixelDepth=24, descriptor=0 (bottom-up,
  *           no attribute bits)
  *   packets header byte h; bit7 set → RLE: (h&0x7F)+1 copies of ONE
  *           following B,G,R pixel; bit7 clear → raw: (h&0x7F)+1
  *           literal B,G,R pixels. Packets never cross a scanline
  *           (spec rule — enforced strictly here).
  *   rows    stored bottom-up (descriptor bit 5 clear): stored row k
  *           is image row height-1-k.
  *
  * `parse` is strict in the family's style: exact header match for the
  * subset, bounded dims, per-packet length checks against both the
  * scanline edge and the byte stream, and the stream must end exactly
  * at the last packet (no TGA 2.0 footer, no trailing bytes). All
  * bounds are checked before reads — CodecFuzzSpec drives adversarial
  * bytes through it.
  */
object Tga {

  /** Decoded image; `samples` row-major TOP-DOWN, 3 bytes/pixel (R, G, B). */
  final case class Rgb(width: Int, height: Int, samples: Array[Byte])

  private val MaxDim = 1 << 14 // 16384² sanity bound, like Pgm/Bmp/Ppm

  private def samePix(s: Array[Byte], a: Int, b: Int): Boolean =
    s(a) == s(b) && s(a + 1) == s(b + 1) && s(a + 2) == s(b + 2)

  /** Encode an [[Rgb]] as a canonical type-10 TGA byte stream: maximal
    * RLE packets for runs ≥ 2, raw packets otherwise, both capped at
    * 128 and cut at every scanline edge, rows written bottom-up. */
  def encode(img: Rgb): Array[Byte] = {
    require(img.samples.length == 3 * img.width * img.height,
      s"sample count ${img.samples.length} != 3x${img.width}x${img.height}")
    val out = new java.io.ByteArrayOutputStream(18 + img.samples.length + 64)
    out.write(0); out.write(0); out.write(10)
    var i = 0
    while (i < 5) { out.write(0); i += 1 } // color-map spec, all zero
    out.write(0); out.write(0); out.write(0); out.write(0) // x/y origin
    out.write(img.width & 0xff); out.write((img.width >> 8) & 0xff)
    out.write(img.height & 0xff); out.write((img.height >> 8) & 0xff)
    out.write(24); out.write(0)
    var row = img.height - 1
    while (row >= 0) {
      var x = 0
      while (x < img.width) {
        val base = 3 * (row * img.width + x)
        var run = 1
        while (x + run < img.width && run < 128 &&
          samePix(img.samples, base, base + 3 * run)) run += 1
        if (run >= 2) {
          out.write(0x80 | (run - 1))
          out.write(img.samples(base + 2) & 0xff) // B
          out.write(img.samples(base + 1) & 0xff) // G
          out.write(img.samples(base) & 0xff)     // R
          x += run
        } else {
          // raw packet: extend until the next pixel would begin a run
          var len = 1
          while (x + len < img.width && len < 128 && {
            val b2 = 3 * (row * img.width + x + len)
            !(x + len + 1 < img.width && samePix(img.samples, b2, b2 + 3))
          }) len += 1
          out.write(len - 1)
          var k = 0
          while (k < len) {
            val b = 3 * (row * img.width + x + k)
            out.write(img.samples(b + 2) & 0xff)
            out.write(img.samples(b + 1) & 0xff)
            out.write(img.samples(b) & 0xff)
            k += 1
          }
          x += len
        }
      }
      row -= 1
    }
    out.toByteArray
  }

  /** Strict parse of the type-10 subset; None on any malformation. */
  def parse(bytes: Array[Byte]): Option[Rgb] = {
    if (bytes.length < 18) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    if (u8(0) != 0 || u8(1) != 0 || u8(2) != 10) return None
    var i = 3
    while (i < 12) { if (u8(i) != 0) return None; i += 1 } // cmap + origins
    val w = u8(12) | (u8(13) << 8)
    val h = u8(14) | (u8(15) << 8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    if (u8(16) != 24 || u8(17) != 0) return None
    val samples = new Array[Byte](3 * w * h)
    var pos = 18
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        if (pos >= bytes.length) return None
        val hd = u8(pos); pos += 1
        val cnt = (hd & 0x7f) + 1
        if (x + cnt > w) return None // packets may not cross scanlines
        if ((hd & 0x80) != 0) {
          if (pos + 3 > bytes.length) return None
          val b = bytes(pos); val g = bytes(pos + 1); val r = bytes(pos + 2)
          pos += 3
          var k = 0
          while (k < cnt) {
            val o = 3 * (row * w + x + k)
            samples(o) = r; samples(o + 1) = g; samples(o + 2) = b
            k += 1
          }
        } else {
          if (pos + 3 * cnt > bytes.length) return None
          var k = 0
          while (k < cnt) {
            val o = 3 * (row * w + x + k)
            samples(o) = bytes(pos + 2)     // R (file order is B,G,R)
            samples(o + 1) = bytes(pos + 1) // G
            samples(o + 2) = bytes(pos)     // B
            pos += 3; k += 1
          }
        }
        x += cnt
      }
      row -= 1
    }
    if (pos != bytes.length) return None // strict: no footer, no trailing bytes
    Some(Rgb(w, h, samples))
  }
}
