package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The second real pure-JVM codec: strict 8-bit paletted uncompressed BMP
  * parsing — little-endian header words, palette indirection, 4-byte row
  * stride, bottom-up raster — and the strictness that keeps harness text
  * blobs on the stub path. */
class BmpSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(px: Int*): Pgm.Image =
    Pgm.Image(w, h, px.map(_.toByte).toArray)

  test("encode/parse round-trip preserves dims and pixels (gray palette identity)") {
    val i = img(3, 2)(0, 64, 128, 192, 255, 7)
    val back = Bmp.parse(Bmp.encode(i)).getOrElse(fail("round-trip parse failed"))
    assert(back.width == 3 && back.height == 2)
    assert(back.pixels.toSeq == i.pixels.toSeq)
  }

  test("width forcing stride padding round-trips (w=5, stride=8)") {
    val i = img(5, 3)((1 to 15): _*)
    val bytes = Bmp.encode(i)
    // payload = 3 rows of stride 8
    assert(bytes.length == 14 + 40 + 1024 + 3 * 8)
    val back = Bmp.parse(bytes).getOrElse(fail("padded round-trip failed"))
    assert(back.pixels.toSeq == i.pixels.toSeq,
      "stride padding bytes must never leak into decoded pixels")
  }

  test("bottom-up storage is re-flipped to top-down pixels") {
    val i = img(4, 2)(10, 11, 12, 13, 20, 21, 22, 23)
    val bytes = Bmp.encode(i)
    val offset = 14 + 40 + 1024
    // stored first row must be the LAST image row (bottom-up)
    assert(bytes.slice(offset, offset + 4).toSeq == Seq[Byte](20, 21, 22, 23))
    val back = Bmp.parse(bytes).getOrElse(fail("parse failed"))
    assert(back.pixels.toSeq == i.pixels.toSeq)
  }

  test("top-down (negative height) rasters parse in stored order") {
    val i = img(4, 2)(10, 11, 12, 13, 20, 21, 22, 23)
    val bytes = Bmp.encode(i)
    // flip height to -2 (two's complement LE at offset 22) — payload now
    // means top-down, so decoded rows come back REVERSED vs `i`
    bytes(22) = (-2).toByte; bytes(23) = 0xff.toByte
    bytes(24) = 0xff.toByte; bytes(25) = 0xff.toByte
    val back = Bmp.parse(bytes).getOrElse(fail("top-down parse failed"))
    assert(back.pixels.toSeq ==
      Seq[Byte](20, 21, 22, 23, 10, 11, 12, 13))
  }

  test("palette indirection resolves through (r+g+b)/3 gray") {
    val i = img(4, 1)(1, 2, 3, 1)
    val bytes = Bmp.encode(i)
    // remap palette entry 1 to (b,g,r) = (10, 20, 33) → gray 21
    val p = 54 + 4 * 1
    bytes(p) = 10; bytes(p + 1) = 20; bytes(p + 2) = 33
    val back = Bmp.parse(bytes).getOrElse(fail("parse failed"))
    assert(back.pixels.toSeq == Seq[Byte](21, 2, 3, 21))
  }

  test("parse is strict: wrong size, compression, depth, dims, and text all reject") {
    val good = Bmp.encode(img(4, 2)(1, 2, 3, 4, 5, 6, 7, 8))
    assert(Bmp.parse(good).isDefined)
    assert(Bmp.parse(good.dropRight(1)).isEmpty, "truncated payload")
    assert(Bmp.parse(good :+ 0.toByte).isEmpty, "trailing bytes")
    locally { // fileSize field disagreeing with the actual length
      val b = good.clone(); b(2) = (b(2) + 1).toByte
      assert(Bmp.parse(b).isEmpty, "fileSize mismatch")
    }
    locally { // RLE8 compression
      val b = good.clone(); b(30) = 1
      assert(Bmp.parse(b).isEmpty, "compressed BMP must reject")
    }
    locally { // 24-bit depth
      val b = good.clone(); b(28) = 24
      assert(Bmp.parse(b).isEmpty, "non-8-bit depth must reject")
    }
    locally { // zero width
      val b = good.clone(); b(18) = 0
      assert(Bmp.parse(b).isEmpty, "zero width must reject")
    }
    assert(Bmp.parse("BMP files start with the letters BM, like this prose"
      .getBytes("US-ASCII")).isEmpty, "prose starting with BM must not parse")
    assert(Bmp.parse(Array.empty[Byte]).isEmpty)
  }

  test("decode dispatch: BMP blobs feature from decoded pixels, text from bytes") {
    val i = img(4, 2)(1, 2, 3, 4, 5, 6, 7, 8)
    val f = Multimodal.decode(Bmp.encode(i))
    // features over the RASTER (1..8), not the blob bytes
    assert(f.toSeq == Seq(1L + 5L, 2L + 6L, 3L + 7L, 4L + 8L))
  }
}
