package graft.ext

/** Minimal pure-JVM binary PGM (P5) codec — the ONE real decoder in the
  * multimodal path (the container ships no image/audio libraries, so
  * richer formats stay behind the documented deterministic stubs).
  *
  * Netpbm P5 is fully specified in a page
  * (https://netpbm.sourceforge.net/doc/pgm.html): ASCII header
  * `P5 <width> <height> <maxval>` with `#`-to-newline comments allowed
  * between tokens, ONE whitespace byte after maxval, then width×height
  * raw gray samples (1 byte each for maxval < 256). That makes it
  * implementable bit-exactly with zero dependencies — which is the point:
  * the decode-once `mapPartitions` plumbing in [[Multimodal]] gets to run
  * a REAL parse → pixel array → resample path, not only byte-sum fakes.
  *
  * `parse` is strict by design: magic, positive dims, maxval ∈ [1, 255],
  * and an EXACT payload length (`n_bytes == header + w*h`). Strictness is
  * what lets [[Multimodal.decode]] dispatch on a successful parse without
  * misclassifying harness text blobs — a text document that happens to
  * start with "P5" still fails the dims/length checks and falls through
  * to the stub path, keeping the m01/m03/m04 oracles exact.
  */
object Pgm {

  /** Decoded grayscale image; `pixels` is row-major, one byte per sample. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  private val MaxDim = 1 << 14 // 16384² caps a blob at 256 MB — sanity bound

  /** Strict P5 parse; None on anything that is not a well-formed binary
    * PGM whose payload length matches its header exactly. */
  def parse(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 10 || bytes(0) != 'P' || bytes(1) != '5') return None
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
    // read one ASCII uint, skipping whitespace and '#' comments before it
    def readInt(): Int = {
      var skipping = true
      while (skipping) {
        if (pos >= bytes.length) return -1
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else skipping = false
      }
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return -1
        any = true
        pos += 1
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    if (maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (pos >= bytes.length || !isWs(bytes(pos))) return None
    pos += 1
    val n = w.toLong * h
    if (bytes.length.toLong - pos != n) return None
    Some(Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, bytes.length)))
  }

  /** Encode an [[Image]] back to canonical P5 bytes (tests plant these). */
  def encode(img: Image): Array[Byte] = {
    require(img.pixels.length == img.width * img.height,
      s"pixel count ${img.pixels.length} != ${img.width}x${img.height}")
    val header = s"P5\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Nearest-neighbor resample to `w`×`h` — the real (if simplest)
    * resize a decoded raster gets; deterministic integer source mapping
    * `src = floor(dst * srcDim / dstDim)`, no floating point. */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        out(y * w + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }
}
