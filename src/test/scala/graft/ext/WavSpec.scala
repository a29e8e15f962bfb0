package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The real public audio container: strict RIFF/WAVE 8-bit mono PCM
  * parsing — LE size-field consistency, chunk walking with unknown-chunk
  * skipping, and the strictness that keeps text and AU blobs off the WAV
  * path. */
class WavSpec extends AnyFunSuite {

  private def pcm(rate: Int)(samples: Int*): Array[Byte] =
    Wav.encode(rate, samples.map(_.toByte).toArray)

  test("encode/parse round-trip preserves rate and samples") {
    val bytes = pcm(16000)(0, 1, 127, 128, 255)
    val p = Wav.parse(bytes).getOrElse(fail("round-trip parse failed"))
    assert(p.sampleRate == 16000)
    assert(p.samples.toSeq == Seq[Byte](0, 1, 127, -128, -1))
  }

  test("unknown chunks between fmt and data are skipped (with odd-size pad)") {
    val base = pcm(8000)(9, 8, 7)
    // splice a 3-byte LIST chunk (odd size → 1 pad byte) before data
    val ins = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 42, 43, 44, 0)
    val out = new Array[Byte](base.length + ins.length)
    System.arraycopy(base, 0, out, 0, 36) // through fmt chunk
    System.arraycopy(ins, 0, out, 36, ins.length)
    System.arraycopy(base, 36, out, 36 + ins.length, base.length - 36)
    // fix the riff size for the extra bytes
    val riff = out.length - 8
    out(4) = riff.toByte; out(5) = (riff >>> 8).toByte
    out(6) = (riff >>> 16).toByte; out(7) = (riff >>> 24).toByte
    val p = Wav.parse(out).getOrElse(fail("LIST-chunk WAV must parse"))
    assert(p.samples.toSeq == Seq[Byte](9, 8, 7))
  }

  test("parse is strict: size lies, stereo, 16-bit, non-PCM, truncation all reject") {
    val good = pcm(16000)(1, 2, 3, 4)
    assert(Wav.parse(good).isDefined)
    assert(Wav.parse(good.dropRight(1)).isEmpty, "truncated data")
    assert(Wav.parse(good :+ 0.toByte).isEmpty, "trailing bytes")
    locally { val b = good.clone(); b(4) = (b(4) + 1).toByte
      assert(Wav.parse(b).isEmpty, "riff size mismatch") }
    locally { val b = good.clone(); b(22) = 2
      assert(Wav.parse(b).isEmpty, "stereo must reject") }
    locally { val b = good.clone(); b(34) = 16
      assert(Wav.parse(b).isEmpty, "16-bit must reject") }
    locally { val b = good.clone(); b(20) = 3
      assert(Wav.parse(b).isEmpty, "non-PCM format must reject") }
    locally { val b = good.clone(); b(28) = (b(28) + 1).toByte
      assert(Wav.parse(b).isEmpty, "inconsistent byteRate must reject") }
    assert(Wav.parse("RIFF raiders of the lost WAVE container prose text"
      .getBytes("US-ASCII")).isEmpty, "prose starting with RIFF must not parse")
    assert(Wav.parse(Array.empty[Byte]).isEmpty)
  }

  test("a duplicate fmt chunk rejects (uniform strictness — no silent overwrite)") {
    val base = pcm(8000)(9, 8, 7)
    // splice a SECOND byte-identical fmt chunk before data: a lenient
    // parser would let it overwrite validation state; strict rejects
    val fmt2 = java.util.Arrays.copyOfRange(base, 12, 36)
    val out = new Array[Byte](base.length + fmt2.length)
    System.arraycopy(base, 0, out, 0, 36)
    System.arraycopy(fmt2, 0, out, 36, fmt2.length)
    System.arraycopy(base, 36, out, 36 + fmt2.length, base.length - 36)
    val riff = out.length - 8
    out(4) = riff.toByte; out(5) = (riff >>> 8).toByte
    out(6) = (riff >>> 16).toByte; out(7) = (riff >>> 24).toByte
    assert(Wav.parse(out).isEmpty, "second fmt chunk must reject")
  }

  test("audio dispatch: AU and WAV route to their own parsers, text to neither") {
    val au = ("AU\n3\nabc").getBytes("US-ASCII")
    assert(Multimodal.parseAu(au).isDefined && Wav.parse(au).isEmpty)
    val wav = pcm(16000)(65, 66, 67)
    assert(Multimodal.parseAu(wav).isEmpty && Wav.parse(wav).isDefined)
    val text = "plain document text".getBytes("US-ASCII")
    assert(Multimodal.parseAu(text).isEmpty && Wav.parse(text).isEmpty)
  }
}
