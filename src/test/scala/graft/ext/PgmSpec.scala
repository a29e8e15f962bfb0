package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The real pure-JVM codec: strict P5 parsing, nearest-neighbor resize,
  * and the decode/resize dispatch that keeps harness text blobs on the
  * stub path (and therefore the m01/m02/m03/m04 oracles exact). */
class PgmSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(px: Int*): Pgm.Image =
    Pgm.Image(w, h, px.map(_.toByte).toArray)

  test("encode/parse round-trip preserves dims and pixels") {
    val i = img(3, 2)(0, 64, 128, 192, 255, 7)
    val back = Pgm.parse(Pgm.encode(i)).getOrElse(fail("round-trip parse failed"))
    assert(back.width == 3 && back.height == 2)
    assert(back.pixels.toSeq == i.pixels.toSeq)
  }

  test("parse accepts header comments and flexible whitespace") {
    val bytes = ("P5 # comment to newline\n# another\n 2\t2 # dims\n255\n"
      .getBytes("US-ASCII")) ++ Array[Byte](1, 2, 3, 4)
    val i = Pgm.parse(bytes).getOrElse(fail("commented header must parse"))
    assert(i.width == 2 && i.height == 2 && i.pixels.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("parse is strict: truncated, padded, bad maxval, and text all reject") {
    val good = Pgm.encode(img(2, 2)(9, 8, 7, 6))
    assert(Pgm.parse(good).isDefined)
    assert(Pgm.parse(good.dropRight(1)).isEmpty, "truncated payload")
    assert(Pgm.parse(good :+ 0.toByte).isEmpty, "payload longer than w*h")
    assert(Pgm.parse("P5\n2 2\n0\n....".getBytes("US-ASCII")).isEmpty, "maxval 0")
    assert(Pgm.parse("P5\n2 2\n65535\n....".getBytes("US-ASCII")).isEmpty,
      "16-bit maxval (2-byte samples) is out of scope and must reject")
    assert(Pgm.parse("P5 is a binary image format from netpbm".getBytes("US-ASCII")).isEmpty,
      "prose starting with P5 must not parse")
    assert(Pgm.parse(Array.empty[Byte]).isEmpty)
  }

  test("resizeNearest: integer source mapping, down and up") {
    val i = img(4, 2)(0, 1, 2, 3, 10, 11, 12, 13)
    // 2x1: src x = floor(dst*4/2) = 0,2; src y = floor(0*2/1) = 0
    assert(Pgm.resizeNearest(i, 2, 1).pixels.toSeq == Seq[Byte](0, 2))
    // identity
    assert(Pgm.resizeNearest(i, 4, 2).pixels.toSeq == i.pixels.toSeq)
    // upscale 8x2: each source column repeats twice
    assert(Pgm.resizeNearest(i, 8, 2).pixels.toSeq ==
      Seq[Byte](0, 0, 1, 1, 2, 2, 3, 3, 10, 10, 11, 11, 12, 12, 13, 13))
  }

  test("decode dispatch: PGM features come from pixels, not raw bytes") {
    val i = img(2, 2)(5, 6, 7, 8)
    val bytes = Pgm.encode(i)
    assert(Multimodal.decode(bytes).toSeq == Seq(5L, 6L, 7L, 8L),
      "features must be over the decoded raster (header excluded)")
    assert(Multimodal.decode(bytes).toSeq != Multimodal.decodeStub(bytes).toSeq,
      "the dispatch must be observable: stub-over-raw-bytes differs")
    val text = "just a document".getBytes("US-ASCII")
    assert(Multimodal.decode(text).toSeq == Multimodal.decodeStub(text).toSeq,
      "non-PGM blobs keep the stub path")
  }

  test("resize dispatch: PGM resamples the raster; non-PGM keeps the stub") {
    val i = img(4, 4)((0 until 16).map(_ * 10): _*)
    val out = Multimodal.resize(Pgm.encode(i), 2, 2)
    // nearest: rows 0,2 and cols 0,2 → pixels (0,0)=0 (0,2)=20 (2,0)=80 (2,2)=100
    assert(out.toSeq == Seq[Byte](0, 20, 80, 100))
    val text = "0123456789".getBytes("US-ASCII")
    assert(Multimodal.resize(text, 2, 2).toSeq == Multimodal.resizeStub(text, 2, 2).toSeq)
  }
}
