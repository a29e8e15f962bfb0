package graft.ext

/** Minimal pure-JVM 8-bit paletted uncompressed BMP decoder — the second
  * real codec in the multimodal path (after [[Pgm]]), proving the
  * decode-once `mapPartitions` plumbing generalizes past trivially-ASCII
  * containers: BMP exercises little-endian multi-byte header fields, a
  * color palette indirection, 4-byte row-stride padding, and bottom-up
  * raster order — all the structural work a real image codec does, with
  * zero dependencies.
  *
  * The format is fully public (Windows BITMAPFILEHEADER +
  * BITMAPINFOHEADER, e.g. https://en.wikipedia.org/wiki/BMP_file_format):
  * 14-byte file header (`BM`, file size, pixel-data offset), 40-byte info
  * header (dims, planes=1, bitCount, compression=BI_RGB), a BGRA palette,
  * then index rows padded to 4-byte boundaries, stored bottom-up when the
  * header height is positive (top-down when negative).
  *
  * `parse` is strict by design, like [[Pgm.parse]]: magic, `fileSize ==
  * bytes.length`, 40-byte info header, planes 1, 8 bpp, BI_RGB only,
  * sane dims, palette fitting before the pixel offset, and an EXACT
  * payload length (`bytes.length - offset == stride * height`).
  * Strictness is what lets [[Multimodal.decode]] dispatch on a
  * successful parse without misclassifying harness text blobs — a text
  * document cannot satisfy the magic + redundant-length checks.
  *
  * A decoded pixel is the palette entry's gray value `(r + g + b) / 3`
  * (integer division — deterministic, and exact identity for the
  * grayscale palettes the engine encodes).
  */
object Bmp {

  import Pgm.Image

  private val MaxDim = 1 << 14 // same 16384² sanity bound as Pgm

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def s32(b: Array[Byte], i: Int): Int = u32(b, i).toInt

  /** Strict parse of an uncompressed 8-bit paletted BMP; None on anything
    * else. Bottom-up (height > 0) and top-down (height < 0) rasters both
    * decode to row-major TOP-DOWN pixels, palette-resolved to gray. */
  def parse(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    if (u32(bytes, 2) != bytes.length) return None
    val offset = u32(bytes, 10)
    if (u32(bytes, 14) != 40) return None // BITMAPINFOHEADER only
    val w = s32(bytes, 18)
    val hRaw = s32(bytes, 22)
    if (w <= 0 || w > MaxDim || hRaw == 0 || math.abs(hRaw) > MaxDim) return None
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    if (u16(bytes, 26) != 1 || u16(bytes, 28) != 8) return None
    if (u32(bytes, 30) != 0) return None // BI_RGB (uncompressed)
    val clrUsed = u32(bytes, 46)
    val nColors = if (clrUsed == 0) 256 else clrUsed
    if (nColors > 256) return None
    // palette sits right after the info header and must fit before the
    // pixel data; the offset itself must be in-bounds
    if (54L + 4L * nColors > offset || offset > bytes.length) return None
    val stride = ((w + 3) / 4) * 4
    if (bytes.length - offset != stride.toLong * h) return None
    val pal = new Array[Byte](nColors.toInt)
    var c = 0
    while (c < nColors) {
      val p = 54 + 4 * c
      val gray = ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
        (bytes(p + 2) & 0xff)) / 3
      pal(c) = gray.toByte
      c += 1
    }
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val base = offset.toInt + srcRow * stride
      var x = 0
      while (x < w) {
        val idx = bytes(base + x) & 0xff
        if (idx >= nColors) return None
        out(y * w + x) = pal(idx)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, out))
  }

  /** Encode a raster as a canonical bottom-up 8-bit gray-palette BMP
    * (tests plant these; the m07 query builds the identical bytes with
    * Spark binary expressions). */
  def encode(img: Image): Array[Byte] = {
    require(img.pixels.length == img.width * img.height,
      s"pixel count ${img.pixels.length} != ${img.width}x${img.height}")
    val stride = ((img.width + 3) / 4) * 4
    val offset = 14 + 40 + 4 * 256
    val fileSize = offset + stride * img.height
    val out = new Array[Byte](fileSize)
    def putU16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    def putU32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putU32(2, fileSize); putU32(10, offset)
    putU32(14, 40); putU32(18, img.width); putU32(22, img.height)
    putU16(26, 1); putU16(28, 8); putU32(30, 0)
    putU32(34, stride * img.height)
    putU32(38, 2835); putU32(42, 2835) // 72 dpi in px/metre
    putU32(46, 256); putU32(50, 0)
    var c = 0
    while (c < 256) {
      val p = 54 + 4 * c
      out(p) = c.toByte; out(p + 1) = c.toByte; out(p + 2) = c.toByte
      c += 1
    }
    var y = 0
    while (y < img.height) {
      val srcRow = img.height - 1 - y // bottom-up
      System.arraycopy(img.pixels, srcRow * img.width,
        out, offset + y * stride, img.width)
      y += 1
    }
    out
  }
}
