package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, idx: Array[Byte]): Gif.Image = {
    val img = Gif.parse(Gif.encode(w, h, idx))
      .getOrElse(fail(s"round-trip parse failed for ${w}x$h"))
    assert(img.width == w && img.height == h)
    img
  }

  test("round-trip: small rasters, all-equal runs, and single pixels") {
    for ((w, h, fill) <- Seq((1, 1, 42), (8, 8, 7), (5, 3, 0), (16, 2, 255))) {
      val idx = Array.fill(w * h)(fill.toByte)
      val img = roundTrip(w, h, idx)
      assert(img.indices.toSeq == idx.toSeq)
    }
  }

  test("round-trip survives both width bumps and a 4096-entry dictionary reset") {
    // low-entropy pseudo-random bytes: the dictionary grows by ~1 entry
    // per code, so 40k symbols crosses 512 (9→10), 1024 (10→11),
    // 2048 (11→12), and the 4096 reset several times
    val rnd = new scala.util.Random(20260814)
    val idx = Array.fill(40000)((rnd.nextInt(8) * 17).toByte)
    val img = roundTrip(200, 200, idx)
    assert(img.indices.toSeq == idx.toSeq)
    // high-entropy too (dictionary grows fastest: mostly literals)
    val idx2 = Array.fill(40000)(rnd.nextInt(256).toByte)
    val img2 = roundTrip(200, 200, idx2)
    assert(img2.indices.toSeq == idx2.toSeq)
  }

  test("KwKwK pattern (cScSc...) decodes exactly") {
    // the classic LZW edge: the decoder receives a code it has not yet
    // defined; abab... and aaa... both force it early
    for (pattern <- Seq(
        Array.tabulate(64)(i => (if (i % 2 == 0) 'a' else 'b').toByte),
        Array.fill(64)('a'.toByte))) {
      val img = roundTrip(8, 8, pattern)
      assert(img.indices.toSeq == pattern.toSeq)
    }
  }

  test("palette resolution: gray = (7·index + 13) mod 256, not the index") {
    val idx = Array.tabulate(16)(_.toByte)
    val img = roundTrip(8, 2, idx)
    assert(img.gray.toSeq == idx.map(i => ((7 * (i & 0xff) + 13) & 0xff).toByte).toSeq)
    assert(img.gray.toSeq != img.indices.toSeq)
  }

  test("strict parse rejects malformed containers") {
    val good = Gif.encode(8, 4, Array.tabulate(32)(_.toByte))
    assert(Gif.parse(good).isDefined)
    // GIF89a signature (we emit and accept only 87a)
    val v89 = good.clone(); v89(4) = '9'.toByte
    assert(Gif.parse(v89).isEmpty)
    // truncation anywhere
    assert(Gif.parse(good.dropRight(1)).isEmpty)
    assert(Gif.parse(good.take(700)).isEmpty)
    // trailing garbage after the trailer
    assert(Gif.parse(good :+ 0.toByte).isEmpty)
    // non-grayscale palette entry (g component off)
    val badPal = good.clone(); badPal(13 + 3 * 5 + 1) = (badPal(13 + 3 * 5 + 1) ^ 1).toByte
    assert(Gif.parse(badPal).isEmpty)
    // image descriptor dims disagreeing with the screen
    val badDim = good.clone()
    val descOff = 13 + 768
    badDim(descOff + 5) = (badDim(descOff + 5) ^ 1).toByte
    assert(Gif.parse(badDim).isEmpty)
  }

  test("corrupted LZW payload fails closed, never throws") {
    val good = Gif.encode(8, 8, Array.tabulate(64)(i => (i * 3).toByte))
    val dataOff = 13 + 768 + 10 + 1 + 1 // first byte inside the first sub-block
    for (i <- dataOff until math.min(good.length - 2, dataOff + 8)) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      val r = try Gif.parse(bad) catch {
        case e: Throwable => fail(s"threw at byte $i: $e")
      }
      // a flipped payload byte may still decode to w·h indices only if
      // it lands in pad bits — anywhere else must fail closed
      r.foreach(img => assert(img.indices.length == 64))
    }
  }
}
