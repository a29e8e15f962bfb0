package graft.ext

/** Minimal pure-JVM binary PPM (P6) codec — the COLOR sibling of [[Pgm]]
  * and the third real image container in the multimodal path. What it
  * adds structurally over P5 is exactly the thing a color pipeline must
  * get right: CHANNEL INTERLEAVING — the raster is width×height pixels of
  * THREE bytes each (R, G, B in that order), so payload slicing, feature
  * accumulation, and resampling all have to move in 3-byte strides or
  * the channels smear into each other (which m09's per-channel oracle
  * sums catch loudly).
  *
  * Netpbm P6 is fully public (https://netpbm.sourceforge.net/doc/ppm.html):
  * ASCII header `P6 <width> <height> <maxval>` with `#`-to-newline
  * comments allowed between tokens, ONE whitespace byte after maxval,
  * then width×height raw RGB triplets (1 byte per sample for
  * maxval < 256).
  *
  * `parse` is strict like its siblings: magic, positive bounded dims,
  * maxval ∈ [1, 255], and an EXACT payload length
  * (`n_bytes == header + 3·w·h`) — a text blob cannot satisfy the magic
  * plus the redundant length check, so [[Multimodal.decode]]'s dispatch
  * stays safe for the stub-featured oracles.
  */
object Ppm {

  /** Decoded color image; `samples` is row-major, top-down, 3 bytes per
    * pixel interleaved R,G,B. */
  final case class Rgb(width: Int, height: Int, samples: Array[Byte])

  private val MaxDim = 1 << 14 // same 16384² sanity bound as Pgm/Bmp

  /** Strict P6 parse; None on anything that is not a well-formed binary
    * PPM whose payload length matches its header exactly. */
  def parse(bytes: Array[Byte]): Option[Rgb] = {
    if (bytes.length < 12 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
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
    val n = 3L * w * h
    if (bytes.length.toLong - pos != n) return None
    Some(Rgb(w, h, java.util.Arrays.copyOfRange(bytes, pos, bytes.length)))
  }

  /** Encode an [[Rgb]] back to canonical P6 bytes (tests plant these). */
  def encode(img: Rgb): Array[Byte] = {
    require(img.samples.length == 3 * img.width * img.height,
      s"sample count ${img.samples.length} != 3x${img.width}x${img.height}")
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.samples.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.samples, 0, out, header.length, img.samples.length)
    out
  }

  /** Nearest-neighbor resample to `w`×`h`, channel-preserving: the same
    * deterministic integer source mapping as [[Pgm.resizeNearest]]
    * (`src = floor(dst · srcDim / dstDim)`), copying the WHOLE 3-byte
    * pixel — the 3-channel extension of m02's resize path. */
  def resizeNearest(img: Rgb, w: Int, h: Int): Rgb = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y * w + x) * 3
        out(dst) = img.samples(src)
        out(dst + 1) = img.samples(src + 1)
        out(dst + 2) = img.samples(src + 2)
        x += 1
      }
      y += 1
    }
    Rgb(w, h, out)
  }
}
