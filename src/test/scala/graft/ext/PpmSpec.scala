package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The color image container: strict binary P6 parsing (channel-
  * interleaved RGB triplets), comment/whitespace header handling, the
  * 3-channel nearest-neighbor resample, and the dispatch strictness that
  * keeps text and P5 blobs off the P6 path. */
class PpmSpec extends AnyFunSuite {

  private def rgb(w: Int, h: Int)(samples: Int*): Ppm.Rgb =
    Ppm.Rgb(w, h, samples.map(_.toByte).toArray)

  test("encode/parse round-trip preserves dims and interleaved samples") {
    val img = rgb(2, 2)(1, 2, 3, 4, 5, 6, 7, 8, 9, 250, 251, 252)
    val p = Ppm.parse(Ppm.encode(img)).getOrElse(fail("round-trip parse failed"))
    assert(p.width == 2 && p.height == 2)
    assert(p.samples.toSeq == img.samples.toSeq)
  }

  test("header comments and whitespace runs between tokens parse") {
    val payload = (1 to 6).map(_.toByte).toArray
    val header = "P6 # color\n# another comment\n 2\t1 # dims\n255\n"
      .getBytes("US-ASCII")
    val p = Ppm.parse(header ++ payload).getOrElse(fail("commented header must parse"))
    assert(p.width == 2 && p.height == 1)
    assert(p.samples.toSeq == payload.toSeq)
  }

  test("parse is strict: truncation, trailing bytes, bad maxval, bad magic reject") {
    val good = Ppm.encode(rgb(2, 1)(9, 8, 7, 6, 5, 4))
    assert(Ppm.parse(good).isDefined)
    assert(Ppm.parse(good.dropRight(1)).isEmpty, "truncated payload")
    assert(Ppm.parse(good :+ 0.toByte).isEmpty, "trailing bytes")
    assert(Ppm.parse("P6\n2 1\n256\n______".getBytes("US-ASCII")).isEmpty,
      "maxval 256 (2-byte samples) must reject")
    assert(Ppm.parse("P6\n0 1\n255\n".getBytes("US-ASCII")).isEmpty, "zero width")
    assert(Ppm.parse("P6 prose that mentions pixels but is text"
      .getBytes("US-ASCII")).isEmpty, "prose starting with P6 must not parse")
    assert(Ppm.parse(Array.empty[Byte]).isEmpty)
  }

  test("resizeNearest copies whole 3-byte pixels with the integer source map") {
    // 4x2 image whose pixel (x,y) is (10x+y, 100+x, 200+y): resample to
    // 2x1 -> source pixels (0,0) and (2,0)
    val src = Ppm.Rgb(4, 2, (for (y <- 0 until 2; x <- 0 until 4)
      yield Seq(10 * x + y, 100 + x, 200 + y)).flatten.map(_.toByte).toArray)
    val out = Ppm.resizeNearest(src, 2, 1)
    assert(out.samples.toSeq == Seq[Byte](0, 100.toByte, 200.toByte,
      20, 102, 200.toByte))
  }

  test("codec dispatch: P5, P6, BMP, and text each route to their own parser") {
    val p6 = Ppm.encode(rgb(1, 1)(65, 66, 67))
    assert(Ppm.parse(p6).isDefined && Pgm.parse(p6).isEmpty && Bmp.parse(p6).isEmpty)
    val p5 = Pgm.encode(Pgm.Image(3, 1, Array[Byte](65, 66, 67)))
    assert(Pgm.parse(p5).isDefined && Ppm.parse(p5).isEmpty)
    val text = "plain document text".getBytes("US-ASCII")
    assert(Ppm.parse(text).isEmpty && Pgm.parse(text).isEmpty)
    // decode() features the P6 raster, not the container bytes
    assert(Multimodal.decode(p6).sum == 65L + 66 + 67)
  }
}
