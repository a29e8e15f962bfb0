package graft.ext

/** Minimal pure-JVM YUV4MPEG2 (Y4M) codec — the VIDEO container of the
  * multimodal path, completing image (PGM/PPM/BMP/PNG/GIF/QOI/TGA) /
  * audio (WAV/FLAC/AU) / video with the same planted-blob oracle
  * discipline: Y4M is a public, UNCOMPRESSED header-plus-raw-planes
  * format (the mjpegtools/ffmpeg interchange format, documented in the
  * yuv4mpeg(5) man page), so a DuckDB oracle can replay every decoded
  * byte straight from the planted text — the PPM argument, applied to
  * video. Before m16 the media table's video rows were the one modality
  * fed by synthetic frame bytes (m02/m06 operate on constructed
  * frames); this parser makes the "video" kind real.
  *
  * Layout: one ASCII stream header `YUV4MPEG2` followed by
  * space-separated tagged parameters (`W<width>` `H<height>` `F<fps>`
  * `I<interlace>` `A<aspect>` `C<colourspace>` `X<app>`), newline; then
  * per frame a `FRAME` line (optional parameters, newline) and the raw
  * plane bytes Y, then U, then V. This parser supports `C444` ONLY
  * (all three planes full-resolution, width×height bytes each): 4:2:0
  * subsampling would make the oracle's byte arithmetic depend on chroma
  * siting conventions, exactly the ambiguity the strict profile
  * excludes. A header that omits C (the spec default is 4:2:0) or names
  * any other colourspace is rejected, not guessed at.
  *
  * `parse` is strict like its siblings: magic, positive bounded dims,
  * mandatory W/H/C444, every frame's `FRAME` line present, and exact
  * EOF after the last plane — trailing garbage or a truncated plane is
  * None, never a short read. Total function on arbitrary bytes
  * (CodecFuzzSpec). */
object Y4m {

  /** Decoded video; each frame is the concatenated Y,U,V planes
    * (3·width·height bytes, C444), in stream order. */
  final case class Video(width: Int, height: Int,
                         frames: Array[Array[Byte]])

  private val MaxDim = 1 << 14 // same 16384² sanity bound as Pgm/Bmp
  private val MaxFrames = 1 << 16

  private val Magic = "YUV4MPEG2"

  /** Strict C444 parse; None on anything that is not a well-formed
    * YUV4MPEG2 stream whose payload length matches its header exactly. */
  def parse(bytes: Array[Byte]): Option[Video] = {
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i
    }
    if (bytes.length < Magic.length) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic.charAt(i)) return None
      i += 1
    }
    val hEnd = lineEnd(Magic.length)
    if (hEnd >= bytes.length) return None // header line must terminate
    // space-separated tagged params; W, H and C444 are mandatory here
    val header = new String(bytes, Magic.length, hEnd - Magic.length,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1L
    var h = -1L
    var c: String = null
    for (tok <- header.split(" ") if tok.nonEmpty) {
      val tag = tok.charAt(0)
      val v = tok.substring(1)
      tag match {
        case 'W' => w = numOrNeg(v)
        case 'H' => h = numOrNeg(v)
        case 'C' => c = v
        case 'F' | 'I' | 'A' | 'X' => () // accepted, not interpreted
        case _ => return None // unknown tag letter: not a Y4M we trust
      }
    }
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    if (c != "444") return None // C444 only; absent C defaults to 4:2:0
    val frameBytes = 3L * w * h
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    pos = hEnd + 1
    while (pos < bytes.length) {
      if (frames.length >= MaxFrames) return None
      // FRAME line: literal "FRAME", optional parameters to newline
      if (pos + 5 > bytes.length) return None
      if (bytes(pos) != 'F' || bytes(pos + 1) != 'R' || bytes(pos + 2) != 'A'
        || bytes(pos + 3) != 'M' || bytes(pos + 4) != 'E') return None
      val fEnd = lineEnd(pos + 5)
      if (fEnd >= bytes.length) return None
      // frame params must be space-introduced ("FRAME\n" or "FRAME ...")
      if (fEnd > pos + 5 && bytes(pos + 5) != ' ') return None
      val body = fEnd + 1
      if (bytes.length - body < frameBytes) return None // truncated plane
      frames += java.util.Arrays.copyOfRange(bytes, body,
        body + frameBytes.toInt)
      pos = body + frameBytes.toInt
    }
    Some(Video(w.toInt, h.toInt, frames.toArray))
  }

  private def numOrNeg(s: String): Long = {
    if (s.isEmpty || s.length > 9) return -1L
    var v = 0L
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch < '0' || ch > '9') return -1L
      v = v * 10 + (ch - '0')
      i += 1
    }
    v
  }

  /** Encode back to canonical Y4M bytes (tests and m16 plant these):
    * full stream header with the fixed-rate/progressive/square-pixel
    * tags a real tool emits, `FRAME\n` per frame, raw C444 planes. */
  def encode(img: Video): Array[Byte] = {
    val fb = 3 * img.width * img.height
    img.frames.foreach(f => require(f.length == fb,
      s"frame has ${f.length} bytes, C444 ${img.width}x${img.height} needs $fb"))
    val header = s"YUV4MPEG2 W${img.width} H${img.height} F25:1 Ip A1:1 C444\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameHdr = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length
      + img.frames.length * (frameHdr.length + fb))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    img.frames.foreach { f =>
      System.arraycopy(frameHdr, 0, out, pos, frameHdr.length)
      pos += frameHdr.length
      System.arraycopy(f, 0, out, pos, fb)
      pos += fb
    }
    out
  }
}
