package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The compressed audio container: bit-granular Rice/fixed-predictor
  * round-trips, CRC-8/CRC-16 strictness, UTF-8 frame numbering, and the
  * dispatch strictness that keeps text/WAV/AU off the FLAC path. */
class FlacSpec extends AnyFunSuite {

  private def pcm(n: Int, f: Int => Int): Array[Byte] =
    (0 until n).map(i => f(i).toByte).toArray

  test("round-trip is exact for each fixed order, incl. multi-frame") {
    for (order <- 0 to 2) {
      // 600 samples -> 3 frames (256/256/88); mix of ramps and noise-ish
      val s = pcm(600, i => (i * 7 + (i * i % 13) - 64) % 128)
      val blob = Flac.encode(16000, s, _ => order)
      val a = Flac.parse(blob).getOrElse(fail(s"order $order failed to parse"))
      assert(a.sampleRate == 16000)
      assert(a.samples.toSeq == s.toSeq, s"order $order samples")
    }
  }

  test("per-frame order cycling round-trips (the planted-corpus shape)") {
    val s = pcm(1000, i => (i % 251) - 120)
    val a = Flac.parse(Flac.encode(8000, s)).getOrElse(fail("cycled parse"))
    assert(a.samples.toSeq == s.toSeq)
  }

  test("tiny and empty streams round-trip") {
    val one = pcm(1, _ => 42)
    assert(Flac.parse(Flac.encode(8000, one)).get.samples.toSeq == one.toSeq)
    assert(Flac.parse(Flac.encode(8000, Array.empty[Byte])).get.samples.isEmpty)
  }

  test("parse is strict: CRCs, truncation, trailing bytes, stereo reject") {
    val good = Flac.encode(16000, pcm(300, i => i % 100))
    assert(Flac.parse(good).isDefined)
    locally { val b = good.clone(); b(b.length - 5) = (b(b.length - 5) ^ 1).toByte
      assert(Flac.parse(b).isEmpty, "flipped frame byte must fail CRC-16") }
    assert(Flac.parse(good.dropRight(1)).isEmpty, "truncation")
    assert(Flac.parse(good :+ 0.toByte).isEmpty, "trailing bytes")
    locally { val b = good.clone(); b(4 + 4 + 12) = (b(4 + 4 + 12) | 0x02).toByte
      // STREAMINFO byte 12 bits 3-1 are channels-1 — bit 1 makes it stereo
      assert(Flac.parse(b).isEmpty, "stereo must reject") }
    assert(Flac.parse("fLaC but actually prose".getBytes("US-ASCII")).isEmpty)
    assert(Flac.parse(Array.empty[Byte]).isEmpty)
  }

  test("audio dispatch: FLAC, WAV, AU, and text each route to their own parser") {
    val fl = Flac.encode(8000, pcm(20, i => i))
    assert(Flac.parse(fl).isDefined && Wav.parse(fl).isEmpty &&
      Multimodal.parseAu(fl).isEmpty)
    val wav = Wav.encode(8000, pcm(20, i => i))
    assert(Flac.parse(wav).isEmpty)
    assert(Flac.parse("plain document text".getBytes("US-ASCII")).isEmpty)
  }
}
