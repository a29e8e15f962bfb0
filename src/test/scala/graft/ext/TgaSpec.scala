package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** TGA type-10 codec unit coverage: a hand-assembled golden stream,
  * both packet families provably exercised, the 128-run clamp, the
  * scanline-cut rule, bottom-up flip + BGR order, round-trip identity,
  * and strict-parse rejections. */
class TgaSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Tga.Rgb = {
    require(px.length == w * h)
    Tga.Rgb(w, h, px.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray)
  }

  private def header(w: Int, h: Int): Array[Byte] =
    (Array(0, 0, 10) ++ Array.fill(9)(0) ++
      Array(w & 0xff, w >> 8, h & 0xff, h >> 8, 24, 0)).map(_.toByte)

  test("golden stream: run + raw packets, bottom-up rows, BGR, byte for byte") {
    // 2 rows x 3 px: row0 = (1,2,3) (1,2,3) (9,8,7); row1 = 3 distinct.
    // Stored bottom-up: row1 first as one raw packet of 3, then row0 as
    // an RLE packet of 2 + a raw packet of 1 — pixels in B,G,R order.
    val enc = Tga.encode(img(3, 2, Seq(
      (1, 2, 3), (1, 2, 3), (9, 8, 7),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))))
    val expected = header(3, 2) ++ Array[Int](
      0x02, 30, 20, 10, 60, 50, 40, 90, 80, 70, // raw x3 (row 1 first)
      0x81, 3, 2, 1,                            // RLE x2 of (1,2,3)
      0x00, 7, 8, 9                             // raw x1 of (9,8,7)
    ).map(_.toByte)
    assert(enc.toSeq == expected.toSeq,
      s"got ${enc.map(b => f"${b & 0xff}%02X").mkString(" ")}")
    val Some(dec) = Tga.parse(enc)
    assert(dec.width == 3 && dec.height == 2)
    assert(dec.samples.toSeq == img(3, 2, Seq(
      (1, 2, 3), (1, 2, 3), (9, 8, 7),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))).samples.toSeq)
  }

  test("128-run clamp: a 300-pixel constant scanline splits 128+128+44") {
    val enc = Tga.encode(img(300, 1, Seq.fill(300)((5, 6, 7))))
    val body = enc.drop(18).map(_ & 0xff).toSeq
    assert(body == Seq(
      0xFF, 7, 6, 5, 0xFF, 7, 6, 5, 0x80 | 43, 7, 6, 5))
    assert(Tga.parse(enc).get.samples.length == 900)
  }

  test("runs never cross scanlines: constant 4x2 emits one RLE per row") {
    val enc = Tga.encode(img(4, 2, Seq.fill(8)((1, 1, 1))))
    val body = enc.drop(18).map(_ & 0xff).toSeq
    assert(body == Seq(0x83, 1, 1, 1, 0x83, 1, 1, 1),
      s"got ${body.map(v => f"$v%02X")}")
  }

  test("round-trip identity on 200 pseudo-random rasters (runs planted)") {
    val rnd = new scala.util.Random(1213)
    for (n <- 0 until 200) {
      val w = 1 + rnd.nextInt(9); val h = 1 + rnd.nextInt(9)
      val px = Array.tabulate(w * h) { _ =>
        if (rnd.nextInt(3) == 0) (7, 7, 7) // plant run material
        else (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
      }
      val im = img(w, h, px.toIndexedSeq)
      val dec = Tga.parse(Tga.encode(im))
      assert(dec.exists(_.samples.sameElements(im.samples)),
        s"round-trip $n failed (w=$w h=$h)")
    }
  }

  test("strict parse: rejects non-subset and malformed streams") {
    val good = Tga.encode(img(2, 1, Seq((1, 2, 3), (4, 5, 6))))
    assert(Tga.parse(good).isDefined)
    // trailing byte
    assert(Tga.parse(good :+ 0.toByte).isEmpty)
    // truncated pixel data
    assert(Tga.parse(good.dropRight(1)).isEmpty)
    // wrong image type (2 = uncompressed, outside the strict subset)
    assert(Tga.parse(good.updated(2, 2.toByte)).isEmpty)
    // top-down descriptor bit (0x20) is outside the subset
    assert(Tga.parse(good.updated(17, 0x20.toByte)).isEmpty)
    // 32-bit depth is outside the subset
    assert(Tga.parse(good.updated(16, 32.toByte)).isEmpty)
    // a packet that crosses the scanline edge: 1x1 image, RLE of 2
    val cross = header(1, 1) ++ Array[Int](0x81, 3, 2, 1).map(_.toByte)
    assert(Tga.parse(cross).isEmpty)
    // zero-size dims
    assert(Tga.parse(header(0, 1) ++ Array[Byte]()).isEmpty)
    // empty / header-only
    assert(Tga.parse(Array.emptyByteArray).isEmpty)
    assert(Tga.parse(header(2, 1)).isEmpty)
  }
}
