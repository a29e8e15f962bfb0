package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec for 8-bit non-interlaced grayscale (color type 0)
  * and truecolor RGB (color type 2) — the first COMPRESSED real codec in
  * the multimodal path, retiring the "compressed formats are
  * unimplementable offline" limitation for the one compressed image
  * format whose only dependency (zlib) ships inside the JDK
  * (`java.util.zip.Inflater`/`Deflater`/`CRC32`).
  *
  * The format is fully public (the PNG specification, ISO/IEC 15948 /
  * https://www.w3.org/TR/png-3/): an 8-byte signature, then chunks of
  * `len | type | data | CRC32(type‖data)`; IHDR first (dims, bit depth,
  * color type, compression 0, filter 0, interlace 0), one-or-more
  * consecutive IDAT chunks whose concatenation is one zlib stream of
  * filtered scanlines (each row = 1 filter-type byte + width·channels
  * sample bytes, filters None/Sub/Up/Average/Paeth), IEND last and
  * empty. This codec implements all five row filters in both directions.
  *
  * `parse` is strict like its siblings — signature, IHDR-first, EVERY
  * chunk's CRC verified, consecutive IDATs, IEND exactly at end-of-file,
  * and the inflated stream must be EXACTLY `height · (1 + width·channels)`
  * bytes — so [[Multimodal]]'s dispatch can try it safely: no text blob
  * survives the signature + CRC gauntlet. `filtersSeen` (a bitmask of
  * row-filter types encountered) is reported so a planted corpus that
  * cycles filters row-by-row proves every unfilter path actually ran.
  */
object Png {

  /** Decoded raster: `channels` ∈ {1 (gray), 3 (RGB)}; `samples` is
    * row-major top-down, channel-interleaved; `filtersSeen` is the OR of
    * `1 << filterType` over the image's rows. */
  final case class Raster(width: Int, height: Int, channels: Int,
      samples: Array[Byte], filtersSeen: Int)

  private val MaxDim = 1 << 14
  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def crcOf(b: Array[Byte], from: Int, len: Int): Long = {
    val c = new CRC32
    c.update(b, from, len)
    c.getValue
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Strict parse; None on anything that is not a well-formed 8-bit
    * non-interlaced gray/RGB PNG. */
  def parse(bytes: Array[Byte]): Option[Raster] = {
    if (bytes.length < 8 + 25 + 12 + 12) return None // sig+IHDR+IDAT+IEND minimum
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }
    var pos = 8
    // IHDR must be the first chunk
    if (u32(bytes, pos) != 13L) return None
    if (!(bytes(pos + 4) == 'I' && bytes(pos + 5) == 'H' &&
          bytes(pos + 6) == 'D' && bytes(pos + 7) == 'R')) return None
    if (crcOf(bytes, pos + 4, 17) != u32(bytes, pos + 21)) return None
    val w = u32(bytes, pos + 8); val h = u32(bytes, pos + 12)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    if (bytes(pos + 16) != 8) return None // bit depth
    val channels = bytes(pos + 17) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor RGB
      case _ => return None
    }
    // compression 0, filter method 0, interlace 0 (no Adam7)
    if (bytes(pos + 18) != 0 || bytes(pos + 19) != 0 || bytes(pos + 20) != 0)
      return None
    pos += 25
    // walk chunks: IDATs must be consecutive; IEND must close the file
    val idat = new java.io.ByteArrayOutputStream()
    var sawIdat = false
    var idatDone = false
    var ended = false
    while (pos + 12 <= bytes.length && !ended) {
      val len = u32(bytes, pos)
      if (len < 0 || len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        return None
      val t0 = bytes(pos + 4); val t1 = bytes(pos + 5)
      val t2 = bytes(pos + 6); val t3 = bytes(pos + 7)
      if (crcOf(bytes, pos + 4, 4 + len.toInt) != u32(bytes, pos + 8 + len.toInt))
        return None
      val isIdat = t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T'
      val isIend = t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D'
      if (isIdat) {
        if (idatDone) return None // IDATs must be consecutive
        idat.write(bytes, pos + 8, len.toInt)
        sawIdat = true
      } else {
        if (sawIdat) idatDone = true
        if (isIend) {
          if (len != 0L) return None
          if (pos + 12 != bytes.length) return None // IEND must end the file
          ended = true
        } else {
          // any other chunk: critical types are unsupported → reject;
          // ancillary (lowercase first letter) chunks are skipped
          if ((t0 & 0x20) == 0) return None
        }
      }
      pos += 12 + len.toInt
    }
    if (!ended || !sawIdat) return None
    // one zlib stream of h scanlines, each 1 + w·channels bytes — exactly
    val stride = w.toInt * channels
    val expect = h.toInt.toLong * (1 + stride)
    if (expect > Int.MaxValue) return None
    val raw = new Array[Byte](expect.toInt)
    val inf = new Inflater()
    try {
      val comp = idat.toByteArray
      inf.setInput(comp)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length || !inf.finished()) return None
      if (inf.inflate(new Array[Byte](1)) != 0) return None // trailing data
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter: bpp = channels for 8-bit samples
    val out = new Array[Byte](h.toInt * stride)
    val bpp = channels
    var filters = 0
    var y = 0
    while (y < h.toInt) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      filters |= 1 << ft
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val fx = raw(rowIn + x) & 0xff
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => fx
          case 1 => fx + a
          case 2 => fx + b
          case 3 => fx + ((a + b) >> 1)
          case 4 => fx + paeth(a, b, c)
        }
        out(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Raster(w.toInt, h.toInt, channels, out, filters))
  }

  /** Encode a raster as a well-formed PNG, choosing each row's filter
    * type with `filterFor(rowIndex)` (0–4) — the planted-corpus knob that
    * forces every unfilter path through the decoder. */
  def encode(width: Int, height: Int, channels: Int, samples: Array[Byte],
      filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels must be 1 or 3, got $channels")
    require(samples.length == width * height * channels,
      s"sample count ${samples.length} != $width x $height x $channels")
    val stride = width * channels
    val bpp = channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"filter type $ft out of range")
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = samples(y * stride + x) & 0xff
        val a = if (x >= bpp) samples(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) samples((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) samples((y - 1) * stride + x - bpp) & 0xff else 0
        val filt = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = (filt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def0 = new Deflater()
    val comp = try {
      def0.setInput(raw); def0.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def0.finished()) buf.write(tmp, 0, def0.deflate(tmp))
      buf.toByteArray
    } finally def0.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong), 0, 4)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val c = new CRC32
      c.update(tb); c.update(data)
      out.write(be32(c.getValue), 0, 4)
    }
    val colorType = if (channels == 1) 0 else 2
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", comp)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }
}
