package graft.ext

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Total-function discipline for every codec parser: the multimodal
  * dispatch feeds RAW CORPUS BYTES to each `parse` in turn, so a parser
  * that throws (instead of returning None) on adversarial input kills
  * the whole partition task. Fuzz three byte-string families — pure
  * random, random with a valid magic prefix, and corrupted valid
  * encodings (one random byte flipped/truncated) — and require every
  * parser to return (not throw) on all of them. */
class CodecFuzzSpec extends AnyFunSuite {

  private val parsers: Seq[(String, Array[Byte] => Option[Any])] = Seq(
    "Pgm" -> (Pgm.parse(_)), "Ppm" -> (Ppm.parse(_)), "Bmp" -> (Bmp.parse(_)),
    "Png" -> (Png.parse(_)), "Wav" -> (Wav.parse(_)),
    "Flac" -> (Flac.parse(_)), "Au" -> (Multimodal.parseAu(_)),
    "Gif" -> (Gif.parse(_)), "Qoi" -> (Qoi.parse(_)), "Tga" -> (Tga.parse(_)),
    "Y4m" -> (Y4m.parse(_)))

  private val magics = Seq("P5\n", "P6\n", "BM", "\u0089PNG\r\n\u001a\n",
    "RIFF", "AU\n", "GIF87a", "qoif", "YUV4MPEG2 ")

  private val rawBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Arbitrary.arbitrary[Byte]).map(_.toArray))

  private val magicPrefixed: Gen[Array[Byte]] = for {
    m <- Gen.oneOf(magics)
    rest <- rawBytes
  } yield m.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ rest

  private val corruptedValid: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(15, 60)
    payload <- Gen.listOfN(n, Arbitrary.arbitrary[Byte]).map(_.toArray)
    blob <- Gen.oneOf(
      Pgm.encode(Pgm.Image(n, 1, payload)),
      Ppm.encode(Ppm.Rgb(5, n / 15, java.util.Arrays.copyOf(payload, 15 * (n / 15)))),
      Png.encode(5, n / 15, 3, java.util.Arrays.copyOf(payload, 15 * (n / 15)), _ % 5),
      Wav.encode(8000, payload),
      Flac.encode(8000, payload),
      Gif.encode(n, 1, payload),
      Qoi.encode(Qoi.Rgb(5, n / 15, java.util.Arrays.copyOf(payload, 15 * (n / 15)))),
      Y4m.encode(Y4m.Video(2, 2, Array(
        java.util.Arrays.copyOf(payload, 12),
        java.util.Arrays.copyOfRange(payload, 3, 15)))))
    mode <- Gen.chooseNum(0, 2)
    idx <- Gen.chooseNum(0, blob.length - 1)
    bit <- Gen.chooseNum(0, 7)
  } yield mode match {
    case 0 => val b = blob.clone(); b(idx) = (b(idx) ^ (1 << bit)).toByte; b
    case 1 => blob.take(idx) // truncate
    case 2 => blob ++ Array(idx.toByte) // trailing garbage
  }

  for ((genName, gen) <- Seq("random bytes" -> rawBytes,
      "magic-prefixed random" -> magicPrefixed,
      "corrupted valid encodings" -> corruptedValid))
    test(s"no parser throws on $genName") {
      val prop = Prop.forAll(gen) { bytes =>
        parsers.forall { case (name, p) =>
          try { p(bytes); true }
          catch { case e: Throwable =>
            fail(s"$name.parse threw ${e.getClass.getSimpleName} on " +
              s"${bytes.length} bytes: ${e.getMessage}")
          }
        }
      }
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
      assert(res.passed, res.status.toString)
    }
}
