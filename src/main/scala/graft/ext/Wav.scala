package graft.ext

/** Minimal pure-JVM RIFF/WAVE (8-bit mono PCM) decoder — the REAL audio
  * container arm, replacing the engine-private "AU\n<len>\n" framing demo
  * (m06) with the public format every audio pipeline actually ingests.
  * The format is fully public (RIFF container, `fmt ` + `data` chunks;
  * e.g. https://en.wikipedia.org/wiki/WAV): little-endian sizes, a
  * 16-byte PCM format chunk, then raw samples.
  *
  * `parse` is strict by design, like [[Pgm]]/[[Bmp]]: RIFF magic, the
  * riff size field consistent with the actual byte length, a `WAVE` form
  * type, a 16-byte `fmt ` chunk declaring PCM (audioFormat 1), mono,
  * 8-bit, internally-consistent byteRate/blockAlign, a `data` chunk
  * whose declared size exactly reaches end-of-file. Text blobs cannot
  * satisfy the magic + redundant-size checks, so the m01/m03/m04 stub
  * oracles stay exact.
  *
  * Unknown chunks between `fmt ` and `data` (LIST/INFO metadata, `fact`)
  * are SKIPPED like a real reader does — chunk sizes are trusted only
  * within bounds, and odd-sized chunks consume their RIFF pad byte.
  */
object Wav {

  /** Decoded 8-bit mono PCM payload + declared sample rate. */
  final case class Pcm(sampleRate: Int, samples: Array[Byte])

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** Strict parse of an 8-bit mono PCM WAV; None on anything else. */
  def parse(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes.length < 44) return None
    if (!tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return None
    // riff size counts everything after its own field
    if (u32(bytes, 4) != bytes.length - 8L) return None
    var pos = 12
    var rate = -1
    // fmt must precede data (the canonical layout; readers assume it to
    // know how to interpret samples)
    var sawFmt = false
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4)
      val body = pos + 8
      if (size < 0 || body + size > bytes.length) return None
      if (tag(bytes, pos, "fmt ")) {
        if (sawFmt) return None // strict: a second fmt chunk is malformed
        if (size != 16) return None // PCM fmt chunk is exactly 16 bytes
        if (u16(bytes, body) != 1) return None // audioFormat: PCM
        val channels = u16(bytes, body + 2)
        rate = u32(bytes, body + 4).toInt
        val byteRate = u32(bytes, body + 8)
        val blockAlign = u16(bytes, body + 12)
        val bits = u16(bytes, body + 14)
        if (channels != 1 || bits != 8) return None
        if (rate <= 0 || byteRate != rate.toLong || blockAlign != 1) return None
        sawFmt = true
      } else if (tag(bytes, pos, "data")) {
        if (!sawFmt) return None
        // strict: the data chunk must exactly reach end-of-file
        if (body + size != bytes.length) return None
        return Some(Pcm(rate,
          java.util.Arrays.copyOfRange(bytes, body, bytes.length)))
      }
      // skip unknown chunk (+ RIFF pad byte for odd sizes)
      pos = body + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Encode samples as a canonical 44-byte-header mono 8-bit PCM WAV
    * (tests plant these; the m08 query builds identical bytes with Spark
    * binary expressions). */
  def encode(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val out = new Array[Byte](44 + samples.length)
    def putTag(i: Int, t: String): Unit =
      (0 until 4).foreach(j => out(i + j) = t(j).toByte)
    def putU16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    def putU32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    putTag(0, "RIFF"); putU32(4, 36 + samples.length); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16)
    putU16(20, 1); putU16(22, 1) // PCM, mono
    putU32(24, sampleRate); putU32(28, sampleRate) // byteRate = rate × 1 × 1
    putU16(32, 1); putU16(34, 8) // blockAlign, bits
    putTag(36, "data"); putU32(40, samples.length)
    System.arraycopy(samples, 0, out, 44, samples.length)
    out
  }
}
