package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The compressed image container: signature + CRC strictness, all five
  * row filters in both directions, grayscale and RGB arms, ancillary-
  * chunk skipping, and the inflate length discipline. */
class PngSpec extends AnyFunSuite {

  private def samples(n: Int): Array[Byte] =
    (0 until n).map(i => ((i * 37 + 11) % 256).toByte).toArray

  test("round-trip is exact for every filter type, gray and RGB") {
    for (ft <- 0 to 4; ch <- Seq(1, 3)) {
      val s = samples(4 * 3 * ch)
      val blob = Png.encode(4, 3, ch, s, _ => ft)
      val img = Png.parse(blob)
        .getOrElse(fail(s"filter $ft channels $ch failed to parse"))
      assert(img.width == 4 && img.height == 3 && img.channels == ch)
      assert(img.filtersSeen == (1 << ft), s"filter $ft bitmask")
      assert(img.samples.toSeq == s.toSeq, s"filter $ft channels $ch samples")
    }
  }

  test("per-row filter cycling round-trips and reports the full bitmask") {
    val s = samples(5 * 6 * 3)
    val img = Png.parse(Png.encode(5, 6, 3, s, k => k % 5))
      .getOrElse(fail("cycled-filter image failed to parse"))
    assert(img.filtersSeen == 31)
    assert(img.samples.toSeq == s.toSeq)
  }

  test("parse is strict: CRC, truncation, trailing bytes, depth, interlace reject") {
    val good = Png.encode(3, 2, 3, samples(18), _ => 4)
    assert(Png.parse(good).isDefined)
    locally { val b = good.clone(); b(b.length - 13) = (b(b.length - 13) ^ 1).toByte
      assert(Png.parse(b).isEmpty, "flipped IDAT byte must fail its CRC") }
    assert(Png.parse(good.dropRight(1)).isEmpty, "truncated IEND")
    assert(Png.parse(good :+ 0.toByte).isEmpty, "trailing bytes after IEND")
    locally { val b = good.clone(); b(24) = 16
      assert(Png.parse(b).isEmpty, "16-bit depth must reject (CRC catches it too)") }
    assert(Png.parse("plain document text long enough to pass the length gate xxxx"
      .getBytes("US-ASCII")).isEmpty, "text must not parse")
    assert(Png.parse(Array.empty[Byte]).isEmpty)
  }

  test("ancillary chunks between IHDR and IDAT are skipped; unknown critical rejects") {
    val good = Png.encode(2, 2, 1, samples(4), _ => 1)
    // splice a chunk right after IHDR (offset 8 + 25): len 4, type given
    def splice(typ: String): Array[Byte] = {
      val data = "abcd".getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      val v = crc.getValue
      val ins = Array[Byte](0, 0, 0, 4) ++ typ.getBytes("US-ASCII") ++ data ++
        Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
          ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      good.take(33) ++ ins ++ good.drop(33)
    }
    val anc = Png.parse(splice("tEXt"))
      .getOrElse(fail("ancillary tEXt chunk must be skipped"))
    assert(anc.samples.toSeq == samples(4).toSeq)
    assert(Png.parse(splice("QRST")).isEmpty,
      "unknown CRITICAL chunk (uppercase first letter) must reject")
  }

  test("IDAT split across two consecutive chunks parses; separated IDATs reject") {
    val good = Png.encode(2, 2, 1, samples(4), _ => 2)
    // locate the single IDAT chunk (starts at 33): split its data in two
    val len = ((good(33) & 0xff) << 24) | ((good(34) & 0xff) << 16) |
      ((good(35) & 0xff) << 8) | (good(36) & 0xff)
    val data = good.slice(41, 41 + len)
    val (d1, d2) = data.splitAt(math.max(1, len / 2))
    def chunk(typ: String, d: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(d)
      val v = crc.getValue
      Array(((d.length >>> 24) & 0xff).toByte, ((d.length >>> 16) & 0xff).toByte,
        ((d.length >>> 8) & 0xff).toByte, (d.length & 0xff).toByte) ++
        typ.getBytes("US-ASCII") ++ d ++
        Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
          ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    }
    val head = good.take(33)
    val tail = good.drop(41 + len + 4) // from after IDAT's CRC (the IEND chunk)
    val split = head ++ chunk("IDAT", d1) ++ chunk("IDAT", d2) ++ tail
    val img = Png.parse(split).getOrElse(fail("split IDAT must parse"))
    assert(img.samples.toSeq == samples(4).toSeq)
    val separated = head ++ chunk("IDAT", d1) ++ chunk("tEXt", "x".getBytes) ++
      chunk("IDAT", d2) ++ tail
    assert(Png.parse(separated).isEmpty, "non-consecutive IDATs must reject")
  }

  test("codec dispatch: PNG blobs don't parse as PGM/PPM/BMP and vice versa") {
    val png = Png.encode(1, 1, 3, Array[Byte](65, 66, 67))
    assert(Png.parse(png).isDefined && Ppm.parse(png).isEmpty &&
      Pgm.parse(png).isEmpty && Bmp.parse(png).isEmpty)
    val p6 = Ppm.encode(Ppm.Rgb(1, 1, Array[Byte](65, 66, 67)))
    assert(Png.parse(p6).isEmpty)
  }
}
