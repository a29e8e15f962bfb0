package graft.ext

/** Pure-JVM GIF87a codec for 8-bit palette images — the third COMPRESSED
  * real codec in the multimodal path and the third distinct compression
  * FAMILY: variable-width LZW (9→12-bit codes, LSB-first bit packing,
  * clear/EOI control codes, dictionary reset at 4096), next to m10's
  * zlib DEFLATE and m11's Rice coding. The format is fully public (the
  * CompuServe GIF87a specification): `GIF87a` signature, logical screen
  * descriptor, a 256-entry global color table, one image descriptor at
  * (0,0) covering the full screen, the LZW minimum-code-size byte, the
  * compressed index stream in ≤255-byte sub-blocks, a block terminator,
  * and the `;` trailer.
  *
  * == The LZW width dance (the format's one real subtlety) ==
  * The decoder's dictionary trails the encoder's by exactly one entry
  * (it can only complete an entry after seeing the NEXT code's first
  * symbol), so the two sides bump the code width at DIFFERENT local
  * counts of the same global event: the encoder moves to `W+1` bits
  * when its next free code reaches `2^W`; the decoder must move one
  * entry EARLIER, when its next free code reaches `2^W − 1`. Getting
  * this wrong desynchronizes the bit stream a few hundred codes in —
  * which is why [[GifSpec]] round-trips payloads past both width bumps
  * and through a full 4096-entry dictionary reset.
  *
  * `parse` is strict like its codec siblings, so [[Multimodal]]'s
  * dispatch can try it safely: signature, screen/image descriptors
  * cross-checked, GRAYSCALE palette contract (every entry r==g==b —
  * what [[encode]] emits), exactly `width·height` decoded indices, EOI
  * + block terminator + trailer closing the file with nothing after.
  * The decoded image carries BOTH the raw indices and the
  * palette-RESOLVED gray values: a feature query summing resolved
  * values can only hash-match its oracle if the palette indirection
  * actually ran (the m07 BMP lesson, with a non-identity palette).
  */
object Gif {

  /** `indices` are the decoded 8-bit palette indices, row-major
    * top-down; `gray` is the palette-resolved value of each index. */
  final case class Image(width: Int, height: Int,
      indices: Array[Byte], gray: Array[Byte])

  private val MaxDim = 1 << 12
  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstFree = 258
  private val MaxCodes = 4096

  /** The planted non-identity grayscale palette: index i resolves to
    * `(7·i + 13) mod 256`. Affine with a multiplier coprime to 256, so
    * it is a PERMUTATION of the byte values — an identity-palette bug,
    * a palette-skipped bug, or an off-by-one index all move feature
    * mass and hash-mismatch. */
  def paletteValue(i: Int): Int = (7 * i + 13) & 0xff

  // ---------------------------------------------------------------- encode

  /** Encode a row-major index raster as a well-formed GIF87a with the
    * [[paletteValue]] grayscale global color table. */
  def encode(width: Int, height: Int, indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"bad dims $width x $height")
    require(indices.length == width * height,
      s"index count ${indices.length} != $width x $height")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(width); le16(height)
    // flags: global color table present, 8 bits/pixel color resolution,
    // GCT size 256 (0xF7); background index 0; no aspect ratio
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) {
      val v = paletteValue(i)
      out.write(v); out.write(v); out.write(v)
      i += 1
    }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out.write(0) // no local color table, not interlaced
    out.write(8) // LZW minimum code size
    val comp = lzwEncode(indices)
    var off = 0
    while (off < comp.length) {
      val n = math.min(255, comp.length - off)
      out.write(n)
      out.write(comp, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var nBits = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        nBits -= 8
      }
    }
    // dict key: (prefix code << 8) | next byte — every sequence is a
    // known prefix extended by one symbol. Boxed Integer values so an
    // absent key is a REAL null (a primitive-Int type parameter would
    // unbox null to 0 and turn every miss into a hit on code 0).
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = FirstFree
    put(ClearCode)
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xff
      val key = Integer.valueOf((cur << 8) | b)
      val hit = dict.get(key)
      if (hit ne null) cur = hit.intValue()
      else {
        put(cur)
        if (nextCode < MaxCodes) {
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          // encoder-side width bump: next free code needs W+1 bits
          if (nextCode == (1 << width) && width < 12) width += 1
        } else {
          put(ClearCode)
          dict = new java.util.HashMap[Integer, Integer]()
          nextCode = FirstFree
          width = 9
        }
        cur = b
      }
      i += 1
    }
    put(cur)
    put(EoiCode)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  // ----------------------------------------------------------------- parse

  /** Strict parse; None on anything that is not a well-formed GIF87a
    * with a full-size grayscale GCT and a single full-screen
    * non-interlaced image. */
  def parse(bytes: Array[Byte]): Option[Image] = {
    // sig(6) + screen(7) + gct(768) + descriptor(10) + mcs(1) +
    // one data sub-block(≥2) + terminator(1) + trailer(1)
    if (bytes.length < 6 + 7 + 768 + 10 + 1 + 2 + 1 + 1) return None
    var pos = 0
    val sig = "GIF87a"
    while (pos < 6) {
      if (bytes(pos) != sig.charAt(pos).toByte) return None
      pos += 1
    }
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    val flags = bytes(10) & 0xff
    // GCT present, 256 entries, 8-bit color resolution
    if (flags != 0xf7) return None
    if (sw <= 0 || sh <= 0 || sw > MaxDim || sh > MaxDim) return None
    pos = 13
    val pal = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      val r = bytes(pos) & 0xff
      // grayscale palette contract: r == g == b per entry
      if ((bytes(pos + 1) & 0xff) != r || (bytes(pos + 2) & 0xff) != r)
        return None
      pal(i) = r.toByte
      pos += 3
      i += 1
    }
    if ((bytes(pos) & 0xff) != 0x2c) return None // image descriptor
    if (u16(pos + 1) != 0 || u16(pos + 3) != 0) return None // at (0,0)
    if (u16(pos + 5) != sw || u16(pos + 7) != sh) return None // full screen
    if ((bytes(pos + 9) & 0xff) != 0) return None // no LCT, no interlace
    pos += 10
    if ((bytes(pos) & 0xff) != 8) return None // LZW minimum code size
    pos += 1
    // gather the compressed stream from its sub-blocks
    val comp = new java.io.ByteArrayOutputStream()
    var terminated = false
    while (!terminated) {
      if (pos >= bytes.length) return None
      val n = bytes(pos) & 0xff
      pos += 1
      if (n == 0) terminated = true
      else {
        if (pos + n > bytes.length) return None
        comp.write(bytes, pos, n)
        pos += n
      }
    }
    // trailer must close the file immediately
    if (pos + 1 != bytes.length || (bytes(pos) & 0xff) != 0x3b) return None
    val indices = lzwDecode(comp.toByteArray, sw * sh).getOrElse(return None)
    val gray = new Array[Byte](indices.length)
    var j = 0
    while (j < indices.length) { gray(j) = pal(indices(j) & 0xff); j += 1 }
    Some(Image(sw, sh, indices, gray))
  }

  /** Decode exactly `expect` indices; None on desync, overflow, missing
    * EOI, or codes past EOI. */
  private def lzwDecode(comp: Array[Byte], expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var outLen = 0
    // decoder dictionary as (prefix code, appended symbol) pairs;
    // sequences materialize by walking prefixes
    val prefix = new Array[Int](MaxCodes)
    val append = new Array[Byte](MaxCodes)
    var nextCode = FirstFree
    var width = 9
    var bitBuf = 0L
    var nBits = 0
    var pos = 0
    var prevCode = -1
    val seqBuf = new Array[Byte](MaxCodes)
    def emitSeq(code: Int, extra: Int): Int = {
      // returns the first symbol of the sequence; extra = -1 for none,
      // else the KwKwK appended first-symbol
      var n = 0
      var c = code
      while (c >= FirstFree) {
        seqBuf(n) = append(c); n += 1
        c = prefix(c)
        if (n >= MaxCodes) return -1 // cycle guard
      }
      val first = c
      if (outLen + n + 1 + (if (extra >= 0) 1 else 0) > expect) return -2
      out(outLen) = c.toByte; outLen += 1
      var k = n - 1
      while (k >= 0) { out(outLen) = seqBuf(k); outLen += 1; k -= 1 }
      if (extra >= 0) { out(outLen) = extra.toByte; outLen += 1 }
      first
    }
    var done = false
    while (!done) {
      while (nBits < width && pos < comp.length) {
        bitBuf |= (comp(pos) & 0xffL) << nBits
        nBits += 8
        pos += 1
      }
      if (nBits < width) return None // ran out before EOI
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      nBits -= width
      if (code == ClearCode) {
        nextCode = FirstFree
        width = 9
        prevCode = -1
      } else if (code == EoiCode) {
        done = true
      } else if (prevCode < 0) {
        // first code after a clear must be a literal
        if (code > 255) return None
        if (outLen + 1 > expect) return None
        out(outLen) = code.toByte; outLen += 1
        prevCode = code
      } else {
        var firstSym = -1
        if (code < nextCode) {
          firstSym = emitSeq(code, -1)
        } else if (code == nextCode) {
          // KwKwK: sequence = prev + first(prev)
          var c = prevCode
          while (c >= FirstFree) c = prefix(c)
          firstSym = emitSeq(prevCode, c)
        } else return None // gap in the code space
        if (firstSym < 0) return None
        if (nextCode < MaxCodes) {
          prefix(nextCode) = prevCode
          append(nextCode) = firstSym.toByte
          nextCode += 1
          // decoder-side EARLY width bump: one entry before the
          // encoder's 2^W boundary (the dictionary lags by one)
          if (nextCode == (1 << width) - 1 && width < 12) width += 1
        }
        prevCode = code
      }
    }
    if (outLen != expect) return None
    // nothing but pad bits may follow EOI
    if (pos != comp.length || (nBits > 0 && (bitBuf & ((1L << nBits) - 1)) != 0)) {
      // allow zero pad bits only; any residual set bit or byte is garbage
      if (pos != comp.length) return None
      if ((bitBuf & ((1L << nBits) - 1)) != 0) return None
    }
    Some(out)
  }
}
