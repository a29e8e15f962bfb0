package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** QOI codec unit coverage: a hand-assembled golden stream, round-trip
  * identity over adversarial payloads, byte wrap-around, every op family
  * provably exercised, and strict-parse rejections. */
class QoiSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Qoi.Rgb = {
    require(px.length == w * h)
    Qoi.Rgb(w, h, px.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray)
  }

  test("golden stream: run flush + LUMA, hand-assembled byte for byte") {
    // 1x3 of [(0,0,0), (0,0,0), (1,2,3)]: prev starts (0,0,0) so the
    // first two pixels are a run of 2 (0xC1); then dg=2, dr-dg=-1,
    // db-dg=1 → LUMA 0xA2 0x79
    val enc = Qoi.encode(img(1, 3, Seq((0, 0, 0), (0, 0, 0), (1, 2, 3))))
    val expected =
      Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 3, 3, 0,
        0xC1, 0xA2, 0x79, 0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(enc.toSeq == expected.toSeq,
      s"got ${enc.map(b => f"${b & 0xff}%02X").mkString(" ")}")
    val Some((dec, ops)) = Qoi.parse(enc)
    assert(dec.samples.toSeq == img(1, 3,
      Seq((0, 0, 0), (0, 0, 0), (1, 2, 3))).samples.toSeq)
    assert(ops == (Qoi.OpRun | Qoi.OpLuma))
  }

  test("every op family round-trips and is provably exercised") {
    val cases = Seq(
      // constant → RUN (after the first pixel's RGB)
      ("run", Seq.fill(8)((200, 100, 50)), Qoi.OpRun),
      // revisit a stored color after others → INDEX
      ("index", Seq((10, 20, 30), (200, 10, 90), (10, 20, 30)), Qoi.OpIndex),
      // ±1 steps → DIFF
      ("diff", Seq((100, 100, 100), (101, 100, 99), (100, 101, 100)), Qoi.OpDiff),
      // ~20-step coordinated jumps → LUMA
      ("luma", Seq((100, 100, 100), (120, 121, 122)), Qoi.OpLuma),
      // uncorrelated big jump → RGB
      ("rgb", Seq((0, 0, 0), (250, 3, 127)), Qoi.OpRgb))
    cases.foreach { case (name, px, op) =>
      val src = img(px.length, 1, px)
      val Some((dec, ops)) = Qoi.parse(Qoi.encode(src))
      assert(dec.samples.toSeq == src.samples.toSeq, s"$name round trip")
      assert((ops & op) != 0, s"$name: expected op bit $op in mask $ops")
    }
  }

  test("byte wrap-around: 255→0 encodes as a small wrapped diff and decodes back") {
    val src = img(2, 1, Seq((255, 255, 255), (0, 0, 1)))
    val enc = Qoi.encode(src)
    val Some((dec, ops)) = Qoi.parse(enc)
    assert(dec.samples.toSeq == src.samples.toSeq)
    // BOTH transitions wrap: (0,0,0)→(255,255,255) is (−1,−1,−1) and
    // (255,255,255)→(0,0,1) is (+1,+1,+2) — a DIFF and a LUMA, three op
    // bytes total, never a 4-byte RGB
    assert((ops & Qoi.OpDiff) != 0 && (ops & Qoi.OpLuma) != 0)
    assert(enc.length == 14 + 3 + 8, s"len ${enc.length}")
  }

  test("round-trip identity on 200 pseudo-random rasters") {
    val rnd = new scala.util.Random(41)
    (0 until 200).foreach { k =>
      val w = 1 + rnd.nextInt(7); val h = 1 + rnd.nextInt(9)
      val samples = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      // bias some runs/revisits in so the op mix varies
      if (k % 3 == 0 && samples.length >= 12)
        System.arraycopy(samples, 0, samples, 6, 6)
      val src = Qoi.Rgb(w, h, samples)
      val Some((dec, _)) = Qoi.parse(Qoi.encode(src))
      assert(dec.width == w && dec.height == h)
      assert(dec.samples.toSeq == src.samples.toSeq, s"case $k ${w}x$h")
    }
  }

  test("strict parse: rejects non-subset and malformed streams") {
    val good = Qoi.encode(img(2, 2, Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (1, 2, 3))))
    assert(Qoi.parse(good).isDefined)
    // bad magic
    val m = good.clone(); m(0) = 'Q'.toByte
    assert(Qoi.parse(m).isEmpty)
    // 4-channel header is outside the strict subset
    val c4 = good.clone(); c4(12) = 4
    assert(Qoi.parse(c4).isEmpty)
    // truncation anywhere
    (1 until good.length).foreach(n => assert(Qoi.parse(good.take(n)).isEmpty))
    // broken end marker
    val e = good.clone(); e(e.length - 1) = 0
    assert(Qoi.parse(e).isEmpty)
    // run overrunning the raster: header for 1x1 + RUN(62) + marker
    val overrun = Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 1, 3, 0,
      0xFD, 0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(Qoi.parse(overrun).isEmpty)
    // INDEX op referencing an unset table slot
    val unset = Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 1, 3, 0,
      0x05, 0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(Qoi.parse(unset).isEmpty)
  }
}
