package graft.ext

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("decodeStub: deterministic positional byte sums") {
    val f = Multimodal.decodeStub(Array[Byte](1, 2, 3, 4, 5))
    assert(f.toSeq == Seq(1L + 5L, 2L, 3L, 4L))
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq == Seq(0L, 0L, 0L, 0L))
    // unsigned byte handling
    assert(Multimodal.decodeStub(Array[Byte](-1)).toSeq == Seq(255L, 0L, 0L, 0L))
  }

  test("resizeStub and frameSampleStub shapes") {
    val b = (0 until 100).map(_.toByte).toArray
    assert(Multimodal.resizeStub(b, 4, 5).length == 20)
    assert(Multimodal.resizeStub(b, 50, 50).length == 100) // never grows
    assert(Multimodal.frameSampleStub(b, 10).length == 10)
    assert(Multimodal.frameSampleStub(b, 10).toSeq == (0 until 100 by 10).map(_.toByte))
    intercept[IllegalArgumentException] { Multimodal.frameSampleStub(b, 0) }
  }

  test("extractFeatures: typed mapPartitions pipeline over binary column") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "abcd"),
      (2L, "audio", "zz")).toDF("media_id", "kind", "text")
      .selectExpr("media_id", "kind", "CAST(text AS BINARY) AS content")
    val got = Multimodal.extractFeatures(spark, media)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "image", 4L, 'a'.toLong, 'b'.toLong),
      (2L, "audio", 2L, 'z'.toLong, 'z'.toLong)))
  }

  test("m03: identical blobs pair at Hamming 0; cross-kind pairs never form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant two identical image blobs, one near blob (same phash nibbles
    // except one feature), and an identical AUDIO blob that must NOT pair
    // with the images despite an equal hash
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    Seq(
      (1L, "aaaabbbb", "en", "image"),
      (2L, "aaaabbbb", "en", "image"),   // exact dup of 1
      (3L, "aaaabbbb", "en", "audio"),   // same bytes, different kind
      (4L, "zzzz", "en", "image"))       // distant
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.queries("m03_media_phash_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toList
    assert(rows.contains((1L, 2L, "image", 0)), s"missing exact pair: $rows")
    rows.foreach { case (a, b, _, h) =>
      assert(Set(a, b).intersect(Set(3L)).isEmpty, s"cross-kind pair leaked: $rows")
      assert(h >= 0 && h <= 2)
    }
  }

  test("planted PGM blob decodes through the real codec inside the mapPartitions batch") {
    import spark.implicits._
    // a real 3x2 image planted next to a text blob: the image's features
    // must come from its decoded raster, the text's from the byte stub —
    // both through the SAME extractFeatures pipeline
    val pgm = Pgm.encode(Pgm.Image(3, 2, Array[Byte](10, 20, 30, 40, 50, 60)))
    val media = Seq(
      (1L, "image", pgm),
      (2L, "text", "abcd".getBytes("US-ASCII")))
      .toDF("media_id", "kind", "content")
    val got = Multimodal.extractFeatures(spark, media)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // image: pixel sums by position mod 4 = (10+50, 20+60, 30, 40); n_bytes
    // is the BLOB length (header + raster), the honest storage accounting
    assert(got(0) == ((1L, pgm.length.toLong, 60L, 80L, 30L, 40L)))
    // text: stub over raw bytes, unchanged
    assert(got(1) == ((2L, 4L, 'a'.toLong, 'b'.toLong, 'c'.toLong, 'd'.toLong)))
  }

  test("planted PGM blob rides sampleFrames through the real resize") {
    import spark.implicits._
    // 16x16 gradient: pixel (y,x) = y*16+x. Real path: decode → nearest
    // 8x8 (rows/cols 0,2,4,..,14) → every-4th frame sampling.
    val px = Array.tabulate(256)(i => i.toByte)
    val pgm = Pgm.encode(Pgm.Image(16, 16, px))
    val media = Seq((7L, "image", pgm)).toDF("media_id", "kind", "content")
    val r = Multimodal.sampleFrames(spark, media).collect().head
    val resized = Pgm.resizeNearest(Pgm.Image(16, 16, px), 8, 8).pixels
    val frames = resized.grouped(4).map(_.head).toArray
    assert(r.getInt(1) == frames.length)
    assert(r.getInt(2) == (frames.head & 0xff))
    assert(r.getInt(3) == (frames.last & 0xff))
    assert(r.getLong(4) == frames.map(_ & 0xff).map(_.toLong).sum)
  }

  test("m01 query runs over the harness documents table") {
    val df = Multimodal.queries("m01_media_features")(spark, "/root/testdata/sf0.001")
    val rows = df.limit(5).collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("media_id", "kind", "n_bytes", "f0", "f1", "f2", "f3"))
  }

  test("parseAu: strict magic / length-line / exact-payload validation") {
    def au(n: Int, payload: String) = s"AU\n$n\n$payload".getBytes("US-ASCII")
    assert(Multimodal.parseAu(au(3, "abc")).map(new String(_, "US-ASCII")) == Some("abc"))
    assert(Multimodal.parseAu(au(0, "")).map(_.length) == Some(0))
    assert(Multimodal.parseAu(au(4, "abc")).isEmpty)       // short payload
    assert(Multimodal.parseAu(au(2, "abc")).isEmpty)       // long payload
    assert(Multimodal.parseAu("AV\n3\nabc".getBytes).isEmpty)  // bad magic
    assert(Multimodal.parseAu("AU\nx3\nabc".getBytes).isEmpty) // non-digit len
    assert(Multimodal.parseAu("AU\n3abc".getBytes).isEmpty)    // no len terminator
    assert(Multimodal.parseAu("AU\n\nabc".getBytes).isEmpty)   // empty len
  }

  test("audioFrameCensus: full-frames-only boundaries and overlap counting") {
    val b = Array.tabulate(560)(_ => 1.toByte) // every byte contributes 1
    // 560 bytes, frame 400 hop 160: frames at 0 and 160 → 2 frames
    assert(Multimodal.audioFrameCensus(b, 400, 160) == ((2L, 800L, 400L)))
    // 559 bytes: second frame would need byte 559 → only 1 full frame
    assert(Multimodal.audioFrameCensus(b.take(559), 400, 160) == ((1L, 400L, 400L)))
    assert(Multimodal.audioFrameCensus(b.take(400), 400, 160) == ((1L, 400L, 400L)))
    assert(Multimodal.audioFrameCensus(b.take(399), 400, 160) == ((0L, 0L, 0L)))
    // unsigned byte handling: 0xFF counts as 255, not -1
    val hot = Array.fill(400)(0xff.toByte)
    assert(Multimodal.audioFrameCensus(hot, 400, 160) == ((1L, 102000L, 102000L)))
  }

  test("m06: planted blob frames through the strict parser; corrupt blob sentinels") {
    import spark.implicits._
    val good = ("AU\n500\n" + "a" * 500).getBytes("US-ASCII")
    val bad = ("AU\n501\n" + "a" * 500).getBytes("US-ASCII") // length lie
    val media = Seq((1L, "audio", good), (2L, "audio", bad))
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.frameAudio(spark, media).orderBy("media_id").collect()
    // 500 'a's: frames at 0 and 160 (bytes 160..559 would overrun → only k=0)
    // nf = (500-400)/160 + 1 = 1; energy = 400*97
    assert(rows(0).getLong(3) == 1L && rows(0).getLong(4) == 400L * 97)
    assert(rows(1).getLong(3) == -1L && rows(1).getLong(4) == -1L)
  }

  test("m15 dispatch: magic-byte routing on a hand-built mixed feed, corrupt and truncated blobs account as sentinels") {
    import spark.implicits._
    val raster = Array.tabulate(15)(i => (i * 7 + 1).toByte) // 5x1 RGB
    def sums = {
      val rs = Seq(0, 3, 6, 9, 12).map(i => (raster(i) & 0xff).toLong).sum
      val gs = Seq(1, 4, 7, 10, 13).map(i => (raster(i) & 0xff).toLong).sum
      val bs = Seq(2, 5, 8, 11, 14).map(i => (raster(i) & 0xff).toLong).sum
      (rs, gs, bs)
    }
    val ppm = Ppm.encode(Ppm.Rgb(5, 1, raster))
    val qoi = Qoi.encode(Qoi.Rgb(5, 1, raster))
    val png = Png.encode(5, 1, 3, raster)
    val corrupt = { val c = ppm.clone(); c(0) = 'X'.toByte; c } // magic gone
    val truncated = java.util.Arrays.copyOfRange(qoi, 0, qoi.length - 2)
    val mixed = Seq(
      MediaRecord(1L, "a", ppm), MediaRecord(2L, "a", qoi),
      MediaRecord(3L, "a", png), MediaRecord(4L, "a", corrupt),
      MediaRecord(5L, "a", truncated)).toDF()
    val got = Multimodal.dispatchFeatures(spark, mixed).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val (rs, gs, bs) = sums
    assert(got(1L) == (("ppm", 5, 1, rs, gs, bs)), s"ppm: ${got(1L)}")
    assert(got(2L) == (("qoi", 5, 1, rs, gs, bs)), s"qoi: ${got(2L)}")
    assert(got(3L) == (("png", 5, 1, rs, gs, bs)), s"png: ${got(3L)}")
    // unknown magic is ACCOUNTED, not dropped; a recognized magic whose
    // body fails the strict parse keeps its format tag with sentinels
    assert(got(4L) == (("unknown", -1, -1, -1L, -1L, -1L)), s"corrupt: ${got(4L)}")
    assert(got(5L) == (("qoi", -1, -1, -1L, -1L, -1L)), s"truncated: ${got(5L)}")
    assert(got.size == 5)
  }
}
