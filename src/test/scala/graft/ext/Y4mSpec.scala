package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** YUV4MPEG2 codec unit coverage: a hand-assembled golden stream
  * (header tags, FRAME lines, raw C444 planes byte for byte),
  * multi-frame boundaries, tolerated-but-uninterpreted header/frame
  * parameters, round-trip identity on random rasters, and the strict
  * rejections (wrong/absent colourspace, missing FRAME line, truncated
  * plane, trailing garbage, unterminated header). */
class Y4mSpec extends AnyFunSuite {

  private def video(w: Int, h: Int, frames: Array[Byte]*): Y4m.Video =
    Y4m.Video(w, h, frames.toArray)

  test("golden stream: header + FRAME lines + raw planes, byte for byte") {
    // 1x2 C444: planes are 2 bytes each, frame payload 6 bytes
    val f0 = Array[Byte](1, 2, 3, 4, 5, 6)
    val f1 = Array[Byte](10, 20, 30, 40, 50, 60)
    val enc = Y4m.encode(video(1, 2, f0, f1))
    val expected =
      "YUV4MPEG2 W1 H2 F25:1 Ip A1:1 C444\n".getBytes("US-ASCII") ++
        "FRAME\n".getBytes("US-ASCII") ++ f0 ++
        "FRAME\n".getBytes("US-ASCII") ++ f1
    assert(enc.toSeq == expected.toSeq)
    val Some(dec) = Y4m.parse(enc)
    assert(dec.width == 1 && dec.height == 2 && dec.frames.length == 2)
    assert(dec.frames(0).toSeq == f0.toSeq && dec.frames(1).toSeq == f1.toSeq)
  }

  test("zero-frame stream parses (header only, a legal y4m)") {
    val Some(dec) = Y4m.parse("YUV4MPEG2 W3 H3 C444\n".getBytes("US-ASCII"))
    assert(dec.width == 3 && dec.height == 3 && dec.frames.isEmpty)
  }

  test("frame boundaries: plane bytes land in the right frame, not smeared") {
    // 2 frames whose byte at plane-offset 0 differs — a boundary slip
    // (off-by-one in the FRAME line length or plane size) would swap or
    // shift the leading bytes between frames
    val a = Array.tabulate[Byte](12)(i => i.toByte)
    val b = Array.tabulate[Byte](12)(i => (100 + i).toByte)
    val Some(dec) = Y4m.parse(Y4m.encode(video(2, 2, a, b)))
    assert(dec.frames(0)(0) == 0 && dec.frames(1)(0) == 100)
    assert(dec.frames(0)(11) == 11 && dec.frames(1)(11) == 111)
  }

  test("uninterpreted header and frame parameters are tolerated") {
    val planes = Array.fill[Byte](3)(7)
    val blob = ("YUV4MPEG2 W1 H1 F30000:1001 It A4:3 C444 XYSCSS=444\n" +
      "FRAME Ixyz\n").getBytes("US-ASCII") ++ planes
    val Some(dec) = Y4m.parse(blob)
    assert(dec.width == 1 && dec.height == 1 && dec.frames.length == 1)
    assert(dec.frames(0).toSeq == planes.toSeq)
  }

  test("strict rejections") {
    def bytes(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val ok = Y4m.encode(video(1, 1, Array[Byte](1, 2, 3)))
    assert(Y4m.parse(ok).isDefined)
    // wrong magic
    assert(Y4m.parse(bytes("YUV4MPEG3 W1 H1 C444\n")).isEmpty)
    // absent colourspace defaults to 4:2:0 per spec — we refuse to guess
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1\n")).isEmpty)
    // any non-444 colourspace
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1 C420\n")).isEmpty)
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1 C444alpha\n")).isEmpty)
    // unterminated header line
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1 C444")).isEmpty)
    // missing / malformed FRAME line
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1 C444\n") ++
      Array[Byte](1, 2, 3)).isEmpty)
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1 C444\nFRAMEX\n") ++
      Array[Byte](1, 2, 3)).isEmpty)
    // truncated plane
    assert(Y4m.parse(ok.dropRight(1)).isEmpty)
    // trailing garbage after the last plane
    assert(Y4m.parse(ok ++ Array[Byte](0)).isEmpty)
    // zero / absurd dims
    assert(Y4m.parse(bytes("YUV4MPEG2 W0 H1 C444\n")).isEmpty)
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H99999999 C444\n")).isEmpty)
    // unknown tag letter
    assert(Y4m.parse(bytes("YUV4MPEG2 W1 H1 C444 Z9\n")).isEmpty)
  }

  test("round-trip identity on random rasters") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 200) {
      val w = 1 + rnd.nextInt(6)
      val h = 1 + rnd.nextInt(6)
      val nf = rnd.nextInt(4)
      val frames = Array.fill(nf) {
        val f = new Array[Byte](3 * w * h); rnd.nextBytes(f); f
      }
      val Some(dec) = Y4m.parse(Y4m.encode(video(w, h, frames: _*)))
      assert(dec.width == w && dec.height == h && dec.frames.length == nf)
      frames.zip(dec.frames).foreach { case (in, out) =>
        assert(in.toSeq == out.toSeq)
      }
    }
  }
}
