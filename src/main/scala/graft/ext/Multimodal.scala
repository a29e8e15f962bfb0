package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Typed metadata for an opaque media blob. In a production pipeline the
  * media table is `(media_id, kind, content: binary, meta: struct)` with the
  * blob either inline (small) or a reference into object storage (large) —
  * at 100 TB you shard by `media_id` so decode parallelism = partitions, and
  * you keep `spark.sql.files.maxPartitionBytes` low enough that a partition
  * of blobs fits executor memory. */
final case class MediaMeta(
    kind: String,        // "image" | "audio" | "video"
    width: Int,
    height: Int,
    nFrames: Int,
    sampleRate: Int)

final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long,
    f0: Long, f1: Long, f2: Long, f3: Long)

final case class FrameSummary(
    media_id: Long, n_frames: Int, first_b: Int, last_b: Int, checksum: Long)

final case class AudioFrameStats(
    media_id: Long, kind: String, n_bytes: Long,
    n_frames: Long, total_energy: Long, peak_energy: Long)

final case class ColorFeatures(
    media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int,
    r_sum: Long, g_sum: Long, b_sum: Long, resize_checksum: Long)

final case class PngFeatures(
    media_id: Long, kind: String,
    width: Int, height: Int, channels: Int, filters_seen: Int,
    r_sum: Long, g_sum: Long, b_sum: Long)

final case class GifFeatures(
    media_id: Long, kind: String,
    width: Int, height: Int,
    idx_sum: Long, gray_sum: Long, first_gray: Int, last_gray: Int)

final case class QoiFeatures(
    media_id: Long, kind: String,
    width: Int, height: Int,
    r_sum: Long, g_sum: Long, b_sum: Long)

final case class TgaFeatures(
    media_id: Long, kind: String,
    width: Int, height: Int,
    r_sum: Long, g_sum: Long, b_sum: Long,
    first_px: Int, last_px: Int)

final case class DispatchFeatures(
    media_id: Long, kind: String, format: String,
    width: Int, height: Int,
    r_sum: Long, g_sum: Long, b_sum: Long)

final case class Y4mFeatures(
    media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int,
    y_sum: Long, u_sum: Long, v_sum: Long,
    y_weighted: Long, y_bright: Long, first_y: Int, last_v: Int)

/** Multimodal-column plumbing: binary content + typed metadata, with
  * decode / feature-extract / resize / frame-sample implemented as
  * `mapPartitions` over a typed Dataset — the Scala analog of a Pandas-UDF
  * `mapInPandas` batch: one JVM call per partition, imperative per-blob
  * work inside, declarative plan outside.
  *
  * ==CODECS==
  * EIGHT real pure-JVM codecs are wired in: binary PGM (P5) via
  * [[Pgm]], 8-bit paletted uncompressed BMP via [[Bmp]], color P6 PPM
  * via [[Ppm]], COMPRESSED 8-bit gray/RGB PNG via [[Png]] (zlib
  * DEFLATE through the JDK's `java.util.zip` — no external deps), and
  * LZW-compressed GIF87a via [[Gif]] (from-scratch variable-width LZW)
  * on the image side; the strict AU-style container ([[parseAu]]), RIFF/WAVE
  * 8-bit PCM ([[Wav]]), and COMPRESSED FLAC via [[Flac]]'s
  * Rice/fixed-predictor codec on the audio side. A blob that strictly
  * parses as one of them is decoded to its raster/payload and
  * featured/resized from real samples. JPEG alone remains behind the
  * **deterministic fake** (clearly marked below) — not because a
  * decoder is unimplementable, but because JPEG is LOSSY: a
  * planted-text oracle cannot predict decoded pixels, so a from-scratch
  * decoder here would be unverifiable against the hash gate. The
  * Spark-side plumbing — schema, typed Encoders, partitioning, batch
  * shape, feature extraction through `mapPartitions` — is real and
  * tested; a production JPEG arm drops into the dispatch exactly as the
  * eight real arms did.
  *
  * There is no media table in the harness, so `documents.text` cast to
  * binary stands in for the blob column (ASCII, so byte == code point —
  * which also makes the stub features SQL-expressible for the oracle).
  */
object Multimodal {

  /** Little-endian u32 from an int column: big-endian hex, byte pairs
    * reversed, unhex'd back to binary — pure codegen'd string ops. The
    * encode half of the real-codec queries (m07 BMP, m08 WAV) builds
    * binary container headers from these. */
  private def le32(x: Column): Column = {
    val hx = lpad(hex(x), 8, "0")
    unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2)))
  }

  private def le16(x: Column): Column = {
    val hx = lpad(hex(x), 4, "0")
    unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
  }

  /** STUB decode + feature-extract: 4 accumulator "features", feature j =
    * sum of bytes at positions ≡ j (mod 4). Deterministic, locale-free. */
  def decodeStub(bytes: Array[Byte]): Array[Long] = {
    val f = new Array[Long](4)
    var i = 0
    while (i < bytes.length) { f(i % 4) += bytes(i) & 0xff; i += 1 }
    f
  }

  /** Real-codec dispatch: a blob that parses as a binary PGM ([[Pgm]] —
    * the one image format the container lets us decode with zero
    * dependencies) gets its features from the DECODED RASTER (same
    * j-mod-4 accumulators, but over pixel samples — header bytes never
    * contaminate the features); anything else falls through to the byte
    * stub. [[Pgm.parse]]'s strict header + exact-length validation is
    * what makes the dispatch safe on the harness corpus: text blobs
    * cannot satisfy it, so the m01/m03/m04 oracles (stub features over
    * text) are untouched. */
  def decode(bytes: Array[Byte]): Array[Long] =
    Pgm.parse(bytes).orElse(Bmp.parse(bytes)) match {
      case Some(img) => decodeStub(img.pixels)
      case None => Ppm.parse(bytes) match {
        case Some(rgb) => decodeStub(rgb.samples) // color arm: interleaved RGB
        case None => decodeStub(bytes)
      }
    }

  /** STUB resize: keep every byte whose index maps into the target "area"
    * (a real implementation decodes + bilinear-resamples). */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.min(bytes.length, w * h)
    java.util.Arrays.copyOfRange(bytes, 0, n)
  }

  /** Real-codec dispatch for resize: a PGM blob is decoded and
    * nearest-neighbor resampled to `w`×`h` ([[Pgm.resizeNearest]] — the
    * real decode → resample → per-frame path); other blobs keep the
    * prefix-truncation stub, so harness text rows (and the m02 oracle)
    * behave exactly as before. */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    Pgm.parse(bytes).orElse(Bmp.parse(bytes)) match {
      case Some(img) => Pgm.resizeNearest(img, w, h).pixels
      case None => Ppm.parse(bytes) match {
        case Some(rgb) => Ppm.resizeNearest(rgb, w, h).samples // 3-channel arm
        case None => resizeStub(bytes, w, h)
      }
    }

  /** STUB frame sampling: every `everyN`-th byte is a "frame". */
  def frameSampleStub(bytes: Array[Byte], everyN: Int): Array[Byte] = {
    require(everyN > 0, "everyN must be positive")
    bytes.grouped(everyN).map(_.head).toArray
  }

  /** Strict parser for the engine's minimal audio container ("AU\n<len
    * decimal>\n<payload>"): magic, decimal length line, EXACT payload
    * length — any violation returns None. Like [[Pgm.parse]], the
    * strictness is what lets m06's oracle gate the codec: a header
    * mis-read or wrong payload slice would contaminate the energy sums
    * with header bytes and hash-mismatch. */
  def parseAu(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length < 5 || bytes(0) != 'A' || bytes(1) != 'U' || bytes(2) != '\n')
      return None
    var i = 3
    var n = 0L
    var digits = 0
    while (i < bytes.length && bytes(i) != '\n') {
      val c = bytes(i)
      if (c < '0' || c > '9' || n > Int.MaxValue) return None
      n = n * 10 + (c - '0'); digits += 1; i += 1
    }
    if (i >= bytes.length || digits == 0) return None
    i += 1
    if (bytes.length - i != n) return None
    Some(java.util.Arrays.copyOfRange(bytes, i, bytes.length))
  }

  /** Per-blob framing census over a PCM-like byte payload: sliding frames
    * of `frame` bytes every `hop` bytes (full frames only — the 25 ms /
    * 10 ms speech-pipeline convention scaled to bytes), per-frame energy
    * = sum of unsigned byte values. Returns (n_frames, total_energy,
    * peak_energy); overlapping bytes count once per covering frame. */
  def audioFrameCensus(payload: Array[Byte], frame: Int, hop: Int): (Long, Long, Long) = {
    require(frame > 0 && hop > 0, "frame and hop must be positive")
    val n = payload.length
    val nf = if (n >= frame) (n - frame) / hop + 1 else 0
    var total = 0L; var peak = 0L
    var k = 0
    while (k < nf) {
      var e = 0L
      var j = k * hop
      val end = j + frame
      while (j < end) { e += payload(j) & 0xff; j += 1 }
      total += e
      if (e > peak) peak = e
      k += 1
    }
    (nf.toLong, total, peak)
  }

  /** Audio analog of [[extractFeatures]]: decode-once mapPartitions batch,
    * strict container parse then [[audioFrameCensus]] — a blob that fails
    * every parse contributes a sentinel (-1) row rather than silently
    * framing raw container bytes. Dispatch mirrors the image side's
    * PGM→BMP chain: the engine-private AU framing demo first, then the
    * REAL public RIFF/WAVE PCM container ([[Wav]]) — both strict, so
    * neither misclassifies the other (or raw text). */
  def frameAudio(spark: SparkSession, media: DataFrame,
      frame: Int = 400, hop: Int = 160): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        parseAu(r.content).orElse(Wav.parse(r.content).map(_.samples))
            .orElse(Flac.parse(r.content).map(_.samples)) match {
          case Some(p) =>
            val (nf, tot, peak) = audioFrameCensus(p, frame, hop)
            AudioFrameStats(r.media_id, r.kind, r.content.length.toLong, nf, tot, peak)
          case None =>
            AudioFrameStats(r.media_id, r.kind, r.content.length.toLong, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** Color analog of [[extractFeatures]] for P6 PPM blobs: decode once
    * per blob, then PER-CHANNEL byte sums over the interleaved raster
    * (a channel-smearing bug — wrong stride, wrong start offset — moves
    * mass between r/g/b and the oracle catches it) plus a 2×2
    * nearest-neighbor [[Ppm.resizeNearest]] checksum, exercising the
    * 3-byte-pixel resample path. A blob that fails the strict parse
    * contributes a sentinel (-1) row rather than silently featuring
    * container bytes — the m06/m08 convention. */
  def colorFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        Ppm.parse(r.content) match {
          case Some(img) =>
            val s = img.samples
            var rs = 0L; var gs = 0L; var bs = 0L
            var i = 0
            while (i + 2 < s.length) {
              rs += s(i) & 0xff; gs += s(i + 1) & 0xff; bs += s(i + 2) & 0xff
              i += 3
            }
            val rz = Ppm.resizeNearest(img, 2, 2).samples
            var ck = 0L
            var j = 0
            while (j < rz.length) { ck += rz(j) & 0xff; j += 1 }
            ColorFeatures(r.media_id, r.kind, r.content.length.toLong,
              img.width, img.height, rs, gs, bs, ck)
          case None =>
            ColorFeatures(r.media_id, r.kind, r.content.length.toLong,
              -1, -1, -1L, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** COMPRESSED-codec round-trip batch: per blob, the raw RGB samples in
    * `content` are PNG-encoded with a per-row filter-type cycle
    * (row k uses filter k mod 5 — Sub/Up/Average/Paeth all run, not
    * just None), DEFLATE-compressed, then strictly re-parsed by
    * [[Png.parse]] (signature, per-chunk CRC32, exact inflated length)
    * and featured per channel. The encode must live in the JVM batch —
    * DEFLATE is not expressible as Spark column ops — which is exactly
    * the real-pipeline shape: codecs run where the blob bytes are.
    * `filters_seen` reports the OR of encountered filter types so the
    * oracle can assert every unfilter path executed. Parse failure →
    * sentinel (-1) row. */
  /** m10's raster width and media construction, factored so the
    * streaming twin ([[graft.streaming]]'s StreamingParitySpec) features
    * the SAME planted blobs from a document STREAM — all ops here are
    * narrow (filter + substr over the binary cast), so the frame builds
    * unchanged on a streaming scan. */
  private[graft] val PngW = 5
  private[graft] def pngMedia(docs: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val h = least(floor(length(bin) / (3 * PngW)), lit(8)).cast("int")
    docs.filter(length(bin) >= 3 * PngW)
      .select(col("doc_id").as("media_id"), col("source").as("kind"),
        bin.substr(lit(1), h * (3 * PngW)).as("content"))
  }

  def pngFeatures(spark: SparkSession, media: DataFrame, w: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val h = r.content.length / (3 * w)
        val blob = Png.encode(w, h, 3,
          java.util.Arrays.copyOfRange(r.content, 0, 3 * w * h), k => k % 5)
        Png.parse(blob) match {
          case Some(img)
              if img.width == w && img.height == h && img.channels == 3 =>
            val s = img.samples
            var rs = 0L; var gs = 0L; var bs = 0L
            var i = 0
            while (i + 2 < s.length) {
              rs += s(i) & 0xff; gs += s(i + 1) & 0xff; bs += s(i + 2) & 0xff
              i += 3
            }
            PngFeatures(r.media_id, r.kind, img.width, img.height,
              img.channels, img.filtersSeen, rs, gs, bs)
          case _ =>
            PngFeatures(r.media_id, r.kind, -1, -1, -1, -1, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** m12's raster width and media construction (m10's factoring): text
    * bytes become an 8-wide, ≤8-tall PALETTE-INDEX raster; all ops are
    * narrow so the frame builds unchanged on a streaming scan. */
  private[graft] val QoiW = 5
  private[graft] def qoiMedia(docs: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val h = least(floor(length(bin) / (3 * QoiW)), lit(8)).cast("int")
    docs.filter(length(bin) >= 3 * QoiW)
      .select(col("doc_id").as("media_id"), col("source").as("kind"),
        bin.substr(lit(1), h * (3 * QoiW)).as("content"))
  }

  /** QOI round-trip batch: per blob, the raw RGB samples in `content`
    * are QOI-encoded ([[Qoi.encode]] — the op-stream walk is stateful
    * per pixel, not a column op) and strictly re-parsed by
    * [[Qoi.parse]], then featured per channel. Parse failure → sentinel
    * (-1) row, the m06/m08 convention. The ops-seen mask stays a
    * spec-side assertion (op usage is data-dependent, so it is not
    * SQL-predictable the way m10's planted filter cycle is). */
  def qoiFeatures(spark: SparkSession, media: DataFrame, w: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val h = r.content.length / (3 * w)
        val blob = Qoi.encode(Qoi.Rgb(w, h,
          java.util.Arrays.copyOfRange(r.content, 0, 3 * w * h)))
        Qoi.parse(blob) match {
          case Some((img, _)) if img.width == w && img.height == h =>
            val s = img.samples
            var rs = 0L; var gs = 0L; var bs = 0L
            var i = 0
            while (i + 2 < s.length) {
              rs += s(i) & 0xff; gs += s(i + 1) & 0xff; bs += s(i + 2) & 0xff
              i += 3
            }
            QoiFeatures(r.media_id, r.kind, img.width, img.height, rs, gs, bs)
          case _ =>
            QoiFeatures(r.media_id, r.kind, -1, -1, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** m14 uses m13's raster convention exactly (5-pixel-wide RGB, ≤8
    * rows) so the two compression families are measured on identical
    * inputs. */
  private[graft] val TgaW = 5
  private[graft] def tgaMedia(docs: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val h = least(floor(length(bin) / (3 * TgaW)), lit(8)).cast("int")
    docs.filter(length(bin) >= 3 * TgaW)
      .select(col("doc_id").as("media_id"), col("source").as("kind"),
        bin.substr(lit(1), h * (3 * TgaW)).as("content"))
  }

  /** TGA round-trip batch: per blob, the raw RGB samples are RLE-packed
    * into a type-10 TGA ([[Tga.encode]] — run detection is stateful per
    * scanline, not a column op) and strictly re-parsed by [[Tga.parse]],
    * then featured per channel PLUS the top-left/bottom-right pixels:
    * the channel sums catch a BGR-order slip, the corner pixels catch a
    * bottom-up row-flip slip (sums alone are flip-invariant). Parse
    * failure → sentinel (-1) row, the m06/m08 convention. */
  def tgaFeatures(spark: SparkSession, media: DataFrame, w: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val h = r.content.length / (3 * w)
        val blob = Tga.encode(Tga.Rgb(w, h,
          java.util.Arrays.copyOfRange(r.content, 0, 3 * w * h)))
        Tga.parse(blob) match {
          case Some(img) if img.width == w && img.height == h =>
            val s = img.samples
            var rs = 0L; var gs = 0L; var bs = 0L
            var i = 0
            while (i + 2 < s.length) {
              rs += s(i) & 0xff; gs += s(i + 1) & 0xff; bs += s(i + 2) & 0xff
              i += 3
            }
            def px(o: Int): Int =
              ((s(o) & 0xff) << 16) | ((s(o + 1) & 0xff) << 8) | (s(o + 2) & 0xff)
            TgaFeatures(r.media_id, r.kind, img.width, img.height,
              rs, gs, bs, px(0), px(s.length - 3))
          case _ =>
            TgaFeatures(r.media_id, r.kind, -1, -1, -1L, -1L, -1L, -1, -1)
        }
      }
    }.toDF()
  }

  /** m15's dispatch batch: sniff each blob's MAGIC BYTES, route to the
    * matching strict parser, and emit unified features; unrecognized or
    * unparseable blobs emit the 'unknown'/sentinel row rather than
    * disappearing. Factored so MultimodalSpec can feed it hand-built
    * mixed and corrupted feeds directly. */
  def dispatchFeatures(spark: SparkSession, mixed: DataFrame): DataFrame = {
    import spark.implicits._
    mixed.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val b = r.content
        def feat(fmt: String, w: Int, hh: Int, samples: Array[Byte]) = {
          var rs = 0L; var gs = 0L; var bs = 0L
          var i = 0
          while (i + 2 < samples.length) {
            rs += samples(i) & 0xff; gs += samples(i + 1) & 0xff
            bs += samples(i + 2) & 0xff
            i += 3
          }
          DispatchFeatures(r.media_id, r.kind, fmt, w, hh, rs, gs, bs)
        }
        def bad(fmt: String) =
          DispatchFeatures(r.media_id, r.kind, fmt, -1, -1, -1L, -1L, -1L)
        if (b.length >= 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte)
          Ppm.parse(b).map(i => feat("ppm", i.width, i.height, i.samples))
            .getOrElse(bad("ppm"))
        else if (b.length >= 4 && b(0) == 'q'.toByte && b(1) == 'o'.toByte &&
            b(2) == 'i'.toByte && b(3) == 'f'.toByte)
          Qoi.parse(b).map { case (i, _) =>
            feat("qoi", i.width, i.height, i.samples) }.getOrElse(bad("qoi"))
        else if (b.length >= 4 && (b(0) & 0xff) == 0x89 &&
            b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte)
          Png.parse(b).filter(_.channels == 3)
            .map(i => feat("png", i.width, i.height, i.samples))
            .getOrElse(bad("png"))
        else bad("unknown")
      }
    }.toDF()
  }

  private[graft] val Y4mW = 4
  private[graft] val Y4mH = 4
  private[graft] val Y4mFrameBytes = 3 * Y4mW * Y4mH // C444: 48

  /** m16's media cut: each document's leading bytes become whole C444
    * frames (48 bytes each = Y,U,V planes of a 4×4 frame), at most 8
    * frames per doc — the video sibling of m09's 5-wide raster cut. */
  private[graft] def y4mMedia(docs: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val nf = least(floor(length(bin) / Y4mFrameBytes), lit(8)).cast("int")
    docs.filter(length(bin) >= Y4mFrameBytes)
      .select(col("doc_id").as("media_id"), col("source").as("kind"),
        bin.substr(lit(1), nf * Y4mFrameBytes).as("content"))
  }

  /** m16's round-trip batch: the content bytes are sliced into C444
    * frames, [[Y4m]]-encoded in the batch (header + FRAME lines are not
    * column ops), strictly re-parsed, and featured from the PARSED
    * planes: per-plane sums catch a plane-order swap, the frame-index-
    * weighted luma sum catches a frame-boundary slip (plane sums alone
    * are boundary-invariant), and the bright-luma census is the
    * per-frame luma histogram a video-quality gate computes. Parse
    * failure → sentinel (-1) row, the m06/m08 convention. */
  def y4mFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val fb = Y4mFrameBytes
    val plane = Y4mW * Y4mH
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val nf = r.content.length / fb
        val frames = Array.tabulate(nf)(f =>
          java.util.Arrays.copyOfRange(r.content, f * fb, (f + 1) * fb))
        val blob = Y4m.encode(Y4m.Video(Y4mW, Y4mH, frames))
        Y4m.parse(blob) match {
          case Some(v) if v.width == Y4mW && v.height == Y4mH
              && v.frames.length == nf =>
            var ys = 0L; var us = 0L; var vs = 0L
            var yw = 0L; var yb = 0L
            var f = 0
            while (f < v.frames.length) {
              val fr = v.frames(f)
              var i = 0
              while (i < fb) {
                val b = fr(i) & 0xff
                if (i < plane) {
                  ys += b; yw += (f + 1).toLong * b
                  if (b >= 64) yb += 1
                } else if (i < 2 * plane) us += b
                else vs += b
                i += 1
              }
              f += 1
            }
            Y4mFeatures(r.media_id, r.kind, blob.length.toLong,
              v.width, v.height, v.frames.length, ys, us, vs, yw, yb,
              v.frames(0)(0) & 0xff, v.frames(nf - 1)(fb - 1) & 0xff)
          case _ =>
            Y4mFeatures(r.media_id, r.kind, -1L, -1, -1, -1,
              -1L, -1L, -1L, -1L, -1L, -1, -1)
        }
      }
    }.toDF()
  }

  private[graft] val GifW = 8
  private[graft] def gifMedia(docs: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val h = least(floor(length(bin) / GifW), lit(8)).cast("int")
    docs.filter(length(bin) >= GifW)
      .select(col("doc_id").as("media_id"), col("source").as("kind"),
        bin.substr(lit(1), h * GifW).as("content"))
  }

  /** LZW round-trip batch: per blob, the raw palette indices in
    * `content` are GIF87a-encoded (variable-width LZW — not expressible
    * as column ops, so it lives in the JVM batch like m10's DEFLATE and
    * m11's Rice), strictly re-parsed by [[Gif.parse]], and featured
    * from BOTH the decoded indices and the palette-RESOLVED gray
    * values. The planted palette is the non-identity permutation
    * `(7i+13) mod 256`, so `gray_sum`/`first_gray`/`last_gray` only
    * match the oracle if the parser really read the color table and
    * resolved every index through it. Parse failure → sentinel (-1)
    * row, the m06/m08 convention. */
  def gifFeatures(spark: SparkSession, media: DataFrame, w: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val h = r.content.length / w
        val blob = Gif.encode(w, h,
          java.util.Arrays.copyOfRange(r.content, 0, w * h))
        Gif.parse(blob) match {
          case Some(img) if img.width == w && img.height == h =>
            var is = 0L; var gs = 0L
            var i = 0
            while (i < img.indices.length) {
              is += img.indices(i) & 0xff
              gs += img.gray(i) & 0xff
              i += 1
            }
            GifFeatures(r.media_id, r.kind, img.width, img.height, is, gs,
              img.gray(0) & 0xff, img.gray(img.gray.length - 1) & 0xff)
          case _ =>
            GifFeatures(r.media_id, r.kind, -1, -1, -1L, -1L, -1, -1)
        }
      }
    }.toDF()
  }

  /** Batch feature extraction: typed Dataset in, typed Dataset out, one
    * decoder invocation per blob, batched per partition. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val f = decode(r.content)
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, f(0), f(1), f(2), f(3))
      }
    }.toDF()
  }

  /** Resize + frame-sample through the stub codecs: per blob, "resize" to
    * an 8×8 area (prefix truncation) then take every 4th byte as a frame;
    * summarize frames per media. Same mapPartitions batch shape a real
    * video pipeline uses (decode → resample → per-frame features). */
  def sampleFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val frames = frameSampleStub(resize(r.content, 8, 8), 4)
        FrameSummary(
          r.media_id,
          frames.length,
          if (frames.isEmpty) -1 else frames.head & 0xff,
          if (frames.isEmpty) -1 else frames.last & 0xff,
          frames.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // documents.text as the stand-in blob; source as the media kind.
    "m01_media_features" -> { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          $"text".cast("binary").as("content"))
      extractFeatures(s, media).orderBy($"media_id")
    },

    "m02_frame_sample" -> { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          $"text".cast("binary").as("content"))
      sampleFrames(s, media).orderBy($"media_id")
    },

    // Media near-dup via perceptual hash — the image-dedup pipeline shape
    // (pHash/dHash + bucketed pairing) through the SAME typed
    // mapPartitions decode plumbing as m01: blobs → stub features → a
    // 16-bit signature (4 bits per feature) → d04's VALUE-SPACE Hamming
    // pairing (the ≤2^16 distinct (kind, phash) values pair in value
    // space, never the media rows) → expand back to media pairs with two
    // equi-joins. At 100 TB the blobs are decoded once in the feature
    // pass, the pairing input is one 2-byte signature per blob, and the
    // quadratic is bounded by the value-space size — swap decodeStub for
    // a real decoder + DCT and this IS production image dedup.
    // Multimodal PAIR curation — the LAION-shape step that turns raw
    // (media, caption, embedding) rows into a contrastive-training pair
    // table: align media blobs with their embedding rows (the inner join
    // that defines "has a usable visual embedding"), then gate each pair
    // on BOTH sides' dedup rep rules — media keeps only its (kind,
    // phash) group's min-id (m03's signature, decode-once), text keeps
    // only its md5 group's min-id (d01's rule) — and report the per-kind
    // census a pair-curation run logs: aligned pairs, pairs lost to a
    // media dup, to a text dup, and the shippable remainder.
    //
    // Scale shape: blobs are decoded ONCE in the mapPartitions feature
    // pass; both rep rules are map-side-combinable min-aggs over 2-byte
    // signatures / 16-byte fingerprints (never content); the alignment
    // is an id equi-join (co-partitioned at 100 TB, where both tables
    // are keyed by the same ingest id); the census is a 3-row
    // conditional agg. Nothing quadratic anywhere.
    "m04_pair_curation" -> { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          $"text".cast("binary").as("content"))
      val ph = extractFeatures(s, media)
        .select($"media_id", $"kind",
          (($"f0" % 16) + ($"f1" % 16) * 16 + ($"f2" % 16) * 256
            + ($"f3" % 16) * 4096).cast("bigint").as("phash"))
      val mrep = ph.groupBy($"kind", $"phash").agg(min($"media_id").as("m_rep"))
      val mflag = ph.join(mrep, Seq("kind", "phash"))
        .select($"media_id", $"kind", ($"media_id" === $"m_rep").as("media_rep"))
      val docs = Tables.documents(s, d)
      val trep = docs.groupBy(md5($"text".cast("binary")).as("fp"))
        .agg(min($"doc_id").as("t_rep"))
      val tflag = docs.select($"doc_id", md5($"text".cast("binary")).as("fp"))
        .join(trep, "fp")
        .select($"doc_id", ($"doc_id" === $"t_rep").as("text_rep"))
      val emb = Tables.embeddings(s, d).select($"vec_id")
      mflag.join(emb, $"media_id" === $"vec_id")
        .join(tflag, $"media_id" === $"doc_id")
        .groupBy($"kind")
        .agg(count(lit(1)).as("n_aligned"),
          sum(when(!$"media_rep", 1L).otherwise(0L)).as("n_media_dup"),
          sum(when(!$"text_rep", 1L).otherwise(0L)).as("n_text_dup"),
          sum(when($"media_rep" && $"text_rep", 1L).otherwise(0L)).as("n_kept"))
        .orderBy($"kind")
    },

    // The REAL-codec arm of the decode path, oracle-checked: each document
    // is packed into a genuine binary PGM blob (16-wide raster, height =
    // min(len/16, 8) rows of its text bytes — built with Spark binary
    // concat, no codec needed to ENCODE), then decoded by [[Pgm.parse]]
    // inside the same mapPartitions batch as m01. Features must come from
    // the parsed RASTER: if the strict parse ever regressed (header
    // mis-read, wrong payload slicing), header bytes would contaminate
    // the sums and the DuckDB oracle — which computes the expected
    // pixel sums directly from the text — would hash-mismatch loudly.
    // This is what upgrades the codec from spec-tested to oracle-gated.
    "m05_pgm_decode" -> { (s, d) =>
      import s.implicits._
      // dims and payload slice are derived from the BYTE length of the
      // UTF-8 payload, not the character count — the two only coincide on
      // ASCII (the harness corpus invariant SchemaCanarySpec pins), and a
      // codec header must describe octets
      val bin = $"text".cast("binary")
      val h = least(floor(length(bin) / 16), lit(8)).cast("int")
      val media = Tables.documents(s, d)
        .filter(length(bin) >= 16)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          concat(
            concat(lit("P5\n16 "), h.cast("string"), lit("\n255\n")).cast("binary"),
            bin.substr(lit(1), h * 16)).as("content"))
      extractFeatures(s, media).orderBy($"media_id")
    },

    // The AUDIO arm of the decode path, oracle-gated like m05: each doc's
    // text bytes are packed into the engine's minimal audio container
    // (built with Spark binary concat — no codec needed to encode), then
    // strictly parsed back and framed 400-bytes/160-hop (the speech
    // 25 ms / 10 ms convention scaled to bytes) inside the decode-once
    // mapPartitions batch. The oracle computes the expected frame
    // energies straight from the text characters, so a parser or framing
    // regression (off-by-one hop, header bytes leaking into the payload)
    // hash-mismatches loudly. Scale shape: one decoder invocation per
    // blob, features are a handful of integers per media row — the blob
    // dies in the batch that decoded it.
    "m06_audio_frames" -> { (s, d) =>
      import s.implicits._
      // header length = BYTE length of the UTF-8 payload (length over the
      // binary cast), not the character count: on non-ASCII text a
      // char-count header under-reports the payload and the strict parse
      // rejects the blob (SchemaCanarySpec pins the corpus ASCII
      // invariant, but the codec must be correct for any input)
      val bin = $"text".cast("binary")
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          concat(
            concat(lit("AU\n"), length(bin).cast("string"), lit("\n"))
              .cast("binary"),
            bin).as("content"))
      frameAudio(s, media).orderBy($"media_id")
    },

    // The real PUBLIC audio container (m06's AU framing demo upgraded to
    // RIFF/WAVE): text bytes packed as mono 8-bit PCM — "RIFF"/"WAVE"
    // magic, LE size fields, the 16-byte PCM fmt chunk, a data chunk
    // declared to exactly end-of-file — then strictly parsed back by
    // [[Wav.parse]] and framed 400/160 in the same decode-once batch.
    // The redundant size fields (riff size vs actual length, data size vs
    // EOF, byteRate vs rate×align) are each strict-checked, so any
    // header-construction or parse regression kills the parse (sentinel
    // -1 rows) or contaminates the energies — either way the oracle,
    // which frames the text directly, hash-mismatches loudly.
    "m08_wav_frames" -> { (s, d) =>
      import s.implicits._
      val bin = $"text".cast("binary")
      val len = length(bin)
      val header = concat(
        lit("RIFF").cast("binary"),
        le32(len + 36),                    // riff size: rest of file
        lit("WAVE").cast("binary"),
        lit("fmt ").cast("binary"),
        le32(lit(16)),                     // PCM fmt chunk size
        le16(lit(1)), le16(lit(1)),        // audioFormat PCM, mono
        le32(lit(16000)), le32(lit(16000)),// sampleRate, byteRate (8-bit mono)
        le16(lit(1)), le16(lit(8)),        // blockAlign, bitsPerSample
        lit("data").cast("binary"),
        le32(len))                         // data size: to end-of-file
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          concat(header, bin).as("content"))
      frameAudio(s, media).orderBy($"media_id")
    },

    // The SECOND real-codec arm (r11 ask #5): each document's text bytes
    // are packed into a genuine 8-bit paletted uncompressed BMP —
    // little-endian header words built with hex/lpad/unhex byte surgery,
    // a 256-entry gray BGRA palette literal, and the raster laid out
    // BOTTOM-UP with width 15 so every row carries a real stride-padding
    // byte — then decoded by [[Bmp.parse]] inside the same mapPartitions
    // batch as m01/m05. Width 15 (not 16) is deliberate: it forces the
    // 4-byte row-stride padding logic to run on every row, so a parser
    // that mis-handles stride or the bottom-up flip contaminates the
    // pixel sums and the oracle — which computes expected sums straight
    // from the text — hash-mismatches loudly. Features must come from
    // the parsed raster (palette-resolved, re-flipped to top-down), so
    // the oracle's char order only matches if ALL of LE fields, palette
    // indirection, stride and row order decode correctly.
    "m07_bmp_decode" -> { (s, d) =>
      import s.implicits._
      val W = 15
      val bin = $"text".cast("binary")
      val h = least(floor(length(bin) / W), lit(8)).cast("int")
      val palette = lit((0 until 256)
        .flatMap(i => Seq(i, i, i, 0)).map(_.toByte).toArray)
      val pad = lit(Array[Byte](0))
      val rows = (0 until 8).map { k =>
        // stored row k = image row h-1-k (bottom-up), 15 payload bytes
        // + 1 stride-padding byte
        when(lit(k) < h,
          concat(bin.substr((h - lit(1 + k)) * W + 1, lit(W)), pad))
          .otherwise(lit(Array.empty[Byte]))
      }
      val header = concat(
        lit("BM").cast("binary"),
        le32(lit(14 + 40 + 1024) + h * 16), // file size
        le32(lit(0)),                       // reserved
        le32(lit(1078)),                    // pixel-data offset
        le32(lit(40)),                      // BITMAPINFOHEADER size
        le32(lit(W)),                       // width
        le32(h),                            // height > 0: bottom-up
        le16(lit(1)), le16(lit(8)),         // planes, bits-per-pixel
        le32(lit(0)),                       // BI_RGB
        le32(h * 16),                       // image size (stride 16)
        le32(lit(2835)), le32(lit(2835)),   // 72 dpi in px/metre
        le32(lit(256)), le32(lit(0)))       // clrUsed, clrImportant
      val media = Tables.documents(s, d)
        .filter(length(bin) >= W)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          concat((header +: palette +: rows): _*).as("content"))
      extractFeatures(s, media).orderBy($"media_id")
    },

    // The COLOR-codec arm (third real image container): each document's
    // text bytes are packed as a genuine binary P6 PPM — 5 pixels wide,
    // so every row is 15 payload bytes of INTERLEAVED R,G,B triplets —
    // then strictly parsed back by [[Ppm.parse]] and featured PER
    // CHANNEL in the decode-once batch, plus a 2×2 3-channel
    // nearest-neighbor resize checksum (m02's resize path extended to
    // color). The oracle computes channel sums and the resample's 12
    // source bytes straight from the text characters: a stride bug
    // smears channels into each other, a resample bug picks the wrong
    // source pixels — either hash-mismatches loudly.
    "m09_ppm_decode" -> { (s, d) =>
      import s.implicits._
      val W = 5 // pixels per row = 15 payload bytes (3-byte channel stride)
      val bin = $"text".cast("binary")
      val h = least(floor(length(bin) / (3 * W)), lit(8)).cast("int")
      val media = Tables.documents(s, d)
        .filter(length(bin) >= 3 * W)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          concat(
            concat(lit(s"P6\n$W "), h.cast("string"), lit("\n255\n"))
              .cast("binary"),
            bin.substr(lit(1), h * (3 * W))).as("content"))
      colorFeatures(s, media).orderBy($"media_id")
    },

    // The COMPRESSED-codec arm: real PNG (zlib DEFLATE via the JDK's
    // java.util.zip — the one compressed image format implementable with
    // zero external deps), retiring the "compressed codecs are offline-
    // unimplementable" caveat for PNG. Each document's text bytes become
    // a 5-pixel-wide RGB raster, PNG-encoded with row filters cycling
    // through ALL FIVE types (k mod 5), deflated, then strictly decoded
    // back (signature, per-chunk CRC32, exact inflated length, full
    // unfilter). The oracle predicts per-channel sums from the text AND
    // the filter bitmask from the row count — a wrong Paeth predictor,
    // a mis-unfiltered Average row, or an inflate slicing bug shifts the
    // channel sums and hash-mismatches loudly.
    "m10_png_decode" -> { (s, d) =>
      pngFeatures(s, pngMedia(Tables.documents(s, d)), PngW)
        .orderBy(col("media_id"))
    },

    // The LZW arm — the third compressed codec and the third distinct
    // compression FAMILY (variable-width LZW next to m10's DEFLATE and
    // m11's Rice): text bytes become palette indices, GIF87a-encoded
    // and strictly decoded back through [[Gif]]'s full code dance
    // (9→12-bit widths with the decoder's early bump, clear/EOI,
    // KwKwK, sub-block framing). Features come from the decoded
    // indices AND the palette-resolved grays under the planted
    // non-identity palette — a parser that skips the color table, or
    // an LZW desync anywhere, hash-mismatches loudly. n_bytes is
    // absent: LZW sizes aren't SQL-predictable (the m10/m11 rule).
    "m12_gif_decode" -> { (s, d) =>
      gifFeatures(s, gifMedia(Tables.documents(s, d)), GifW)
        .orderBy(col("media_id"))
    },

    // The FOURTH compressed codec / fourth compression family: QOI's
    // pixel-predictive op stream (run + recent-color index + wrapped
    // small deltas — qoiformat.org's public one-page spec) next to
    // m10's DEFLATE, m11's Rice and m12's LZW. Text bytes become the
    // same 5-wide RGB raster as m09/m10, QOI-encoded and strictly
    // re-parsed in the decode-once batch; per-channel sums only match
    // the oracle's direct text computation if every op family decodes
    // exactly (a wrong LUMA green bias or an index-table hash slip
    // shifts the sums). QoiSpec asserts all five op families actually
    // execute; CodecFuzzSpec drives adversarial bytes.
    "m13_qoi_decode" -> { (s, d) =>
      qoiFeatures(s, qoiMedia(Tables.documents(s, d)), QoiW)
        .orderBy(col("media_id"))
    },

    // The FIFTH compressed codec / fifth compression family: TGA
    // type-10's plain run-length packets (Truevision TGA 2.0 spec) next
    // to m10's DEFLATE, m11's Rice, m12's LZW and m13's predictive op
    // stream — the family's simplest entropy scheme, where every decode
    // hazard is LAYOUT: BGR byte order (channel sums catch a swap),
    // bottom-up row storage (the corner-pixel features catch an unflipped
    // read — sums alone are flip-invariant), and the packets-never-cross-
    // scanlines rule the strict parser enforces. Same 5-wide RGB raster
    // as m09/m10/m13, so compression families compare on identical
    // inputs. TgaSpec plants fixtures driving both packet types, the
    // 128-run clamp and the scanline cut; CodecFuzzSpec drives
    // adversarial bytes. n_bytes is absent by the m10/m11 rule.
    // FORMAT-DISPATCH ROUTER — the reference's routing dispatch (O10)
    // at the media-ingest layer: a HETEROGENEOUS blob feed (each doc
    // encoded as PPM, QOI, or PNG by id — three containers over the
    // IDENTICAL 5-wide RGB raster) is routed to the right strict parser
    // by MAGIC BYTES ALONE ('P6' / 'qoif' / \x89PNG), never by
    // out-of-band metadata. Because the three containers carry the same
    // raster, the unified features (format tag + dims + channel sums)
    // have ONE oracle: a blob routed to the wrong parser, or a parser
    // disagreeing with another about the pixels, hash-mismatches.
    // Unrecognized magic → the 'unknown' sentinel row (the m06/m08
    // convention), never a dropped row — an ingest router must account
    // for every blob.
    //
    // Scale shape: sniff + decode are per-row batch work inside the
    // scan-side mapPartitions (two map stages, blob never re-encoded or
    // exchanged); the only exchange is the output sort. Adding a format
    // = one magic branch + one parser — the router itself stays O(1)
    // per blob.
    "m15_format_dispatch" -> { (s, d) =>
      import s.implicits._
      val bin = col("text").cast("binary")
      val h = least(floor(length(bin) / 15), lit(8)).cast("int")
      val media = Tables.documents(s, d).filter(length(bin) >= 15)
        .select(col("doc_id").as("media_id"), col("source").as("kind"),
          bin.substr(lit(1), h * 15).as("content"))
      val mixed = media.as[MediaRecord].mapPartitions { it =>
        it.map { r =>
          val w = 5
          val hh = r.content.length / 15
          val raster = java.util.Arrays.copyOfRange(r.content, 0, 15 * hh)
          val blob = (r.media_id % 3) match {
            case 0 => Ppm.encode(Ppm.Rgb(w, hh, raster))
            case 1 => Qoi.encode(Qoi.Rgb(w, hh, raster))
            case _ => Png.encode(w, hh, 3, raster, k => k % 5)
          }
          MediaRecord(r.media_id, r.kind, blob)
        }
      }.toDF()
      dispatchFeatures(s, mixed).orderBy(col("media_id"))
    },

    "m14_tga_decode" -> { (s, d) =>
      tgaFeatures(s, tgaMedia(Tables.documents(s, d)), TgaW)
        .orderBy(col("media_id"))
    },

    // The VIDEO container — YUV4MPEG2 through [[Y4m]]'s strict C444
    // parser, completing image/audio/video with the same planted-blob
    // oracle discipline (the m09/PPM argument applied to video: Y4M is
    // header-plus-raw-planes, so DuckDB replays every decoded byte
    // straight from the text). Text bytes become whole 4×4 C444 frames
    // (48 bytes = Y,U,V planes), Y4M-encoded in the batch and strictly
    // re-parsed; per-PLANE sums catch a plane-order swap, the
    // frame-index-WEIGHTED luma sum catches a frame-boundary slip
    // (plane sums alone are boundary-invariant), the bright-luma census
    // is a video-quality gate's histogram bucket, and n_bytes IS
    // SQL-predictable here (uncompressed container: 35-byte header +
    // 54 bytes per frame) unlike the m10-m14 compressed codecs.
    // Scale shape: encode+parse+feature is scan-side per-row batch
    // work; the only exchange is the output sort (m-family rule).
    "m16_y4m_frames" -> { (s, d) =>
      y4mFeatures(s, y4mMedia(Tables.documents(s, d)))
        .orderBy(col("media_id"))
    },

    // The compressed-AUDIO arm — FLAC through [[Flac]]'s pure-JVM
    // Rice/fixed-predictor codec, m10's PNG story for sound: text bytes
    // become 8-bit mono PCM, FLAC-encoded in the batch (bit-packing is
    // not a column op) with the fixed-predictor order CYCLING 0→1→2
    // across frames, then strictly decoded back (CRC-8 + CRC-16 per
    // frame, exact sample-count and EOF) and framed 400/160 exactly like
    // m06/m08. The oracle frames the text directly — a Rice slicing
    // bug, wrong predictor reconstruction, or a frame boundary error
    // shifts the energies and hash-mismatches. n_bytes is deliberately
    // absent from the output: DEFLATE-class sizes aren't
    // SQL-predictable (same reason m10 omits it).
    "m11_flac_frames" -> { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          $"text".cast("binary").as("content"))
      val enc = media.as[MediaRecord].mapPartitions { it =>
        it.map(r => MediaRecord(r.media_id, r.kind, Flac.encode(16000, r.content)))
      }.toDF()
      frameAudio(s, enc)
        .select($"media_id", $"kind", $"n_frames", $"total_energy",
          $"peak_energy")
        .orderBy($"media_id")
    },

    "m03_media_phash_dedup" -> { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select($"doc_id".as("media_id"), $"source".as("kind"),
          $"text".cast("binary").as("content"))
      val ph = extractFeatures(s, media)
        .select($"media_id", $"kind",
          (($"f0" % 16) + ($"f1" % 16) * 16 + ($"f2" % 16) * 256
            + ($"f3" % 16) * 4096).cast("bigint").as("phash"))
      val vals = ph.select($"kind", $"phash").distinct()
      val vp = vals.as("va").join(vals.as("vb"),
          col("va.kind") === col("vb.kind") &&
            bit_count(col("va.phash").bitwiseXOR(col("vb.phash"))) <= 2)
        .select(col("va.kind").as("vk"),
          col("va.phash").as("ha"), col("vb.phash").as("hb"))
      vp.join(ph.as("x"), $"vk" === col("x.kind") && $"ha" === col("x.phash"))
        .join(ph.as("y"), $"vk" === col("y.kind") && $"hb" === col("y.phash")
          && col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
          $"vk".as("kind"),
          bit_count($"ha".bitwiseXOR($"hb")).cast("int").as("hamming"))
        .orderBy($"media_a", $"media_b")
    }
  )

  val oracle: Map[String, String] = Map(
    // ASCII stand-in blobs make the stub features expressible in SQL:
    // byte i == ord(char i).
    "m01_media_features" -> {
      def f(j: Int) =
        s"CAST(list_sum(list_transform(range(1, length(text) + 1), i -> CASE WHEN (i - 1) % 4 = $j THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS f$j"
      raw"""SELECT doc_id AS media_id, source AS kind,
           |  CAST(length(text) AS BIGINT) AS n_bytes,
           |  ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
           |FROM documents ORDER BY media_id""".stripMargin
    },

    // same stub features as m01, folded to the 16-bit signature; the
    // oracle pairs directly (the semantic spec) — the Spark side's
    // value-space pairing is plan shape, not semantics
    "m03_media_phash_dedup" -> {
      def f(j: Int) =
        s"CAST(list_sum(list_transform(range(1, length(text) + 1), i -> CASE WHEN (i - 1) % 4 = $j THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS f$j"
      raw"""WITH feats AS (SELECT doc_id AS media_id, source AS kind,
           |    ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
           |  FROM documents),
           |ph AS (SELECT media_id, kind,
           |    CAST(f0 % 16 + (f1 % 16) * 16 + (f2 % 16) * 256 + (f3 % 16) * 4096
           |      AS BIGINT) AS phash
           |  FROM feats)
           |SELECT x.media_id AS media_a, y.media_id AS media_b, x.kind AS kind,
           |  CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
           |FROM ph x JOIN ph y ON x.kind = y.kind AND x.media_id < y.media_id
           |WHERE bit_count(xor(x.phash, y.phash)) <= 2
           |ORDER BY media_a, media_b""".stripMargin
    },

    // the m03 signature + d01 fingerprint rep rules replayed relationally,
    // the embedding alignment as the same inner id join
    "m04_pair_curation" -> {
      def f(j: Int) =
        s"CAST(list_sum(list_transform(range(1, length(text) + 1), i -> CASE WHEN (i - 1) % 4 = $j THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS f$j"
      raw"""WITH feats AS (SELECT doc_id AS media_id, source AS kind,
           |    ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
           |  FROM documents),
           |ph AS (SELECT media_id, kind,
           |    CAST(f0 % 16 + (f1 % 16) * 16 + (f2 % 16) * 256 + (f3 % 16) * 4096
           |      AS BIGINT) AS phash
           |  FROM feats),
           |mrep AS (SELECT kind, phash, MIN(media_id) AS m_rep FROM ph GROUP BY kind, phash),
           |mf AS (SELECT media_id, ph.kind, (media_id = m_rep) AS media_rep
           |  FROM ph JOIN mrep USING (kind, phash)),
           |tr AS (SELECT md5(text) AS fp, MIN(doc_id) AS t_rep FROM documents GROUP BY md5(text)),
           |tf AS (SELECT doc_id, (doc_id = t_rep) AS text_rep
           |  FROM (SELECT doc_id, md5(text) AS fp FROM documents) dd JOIN tr USING (fp)),
           |p AS (SELECT mf.kind, media_rep, text_rep
           |  FROM mf JOIN (SELECT vec_id FROM embeddings) e ON media_id = vec_id
           |  JOIN tf ON media_id = doc_id)
           |SELECT kind, COUNT(*) AS n_aligned,
           |  CAST(SUM(CASE WHEN NOT media_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_media_dup,
           |  CAST(SUM(CASE WHEN NOT text_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_text_dup,
           |  CAST(SUM(CASE WHEN media_rep AND text_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM p GROUP BY kind ORDER BY kind""".stripMargin
    },

    // the oracle computes the expected PIXEL sums straight from the text
    // (raster = first 16·h chars); n_bytes counts the whole blob —
    // 12-byte header ("P5\n16 h\n255\n", h is one digit for h ≤ 8) + raster
    "m05_pgm_decode" -> {
      def f(j: Int) =
        s"CAST(list_sum(list_transform(range(1, 16*h + 1), i -> CASE WHEN (i - 1) % 4 = $j THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS f$j"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 16, 8) AS h
           |  FROM documents WHERE length(text) >= 16)
           |SELECT media_id, kind,
           |  CAST(12 + 16*h AS BIGINT) AS n_bytes,
           |  ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
           |FROM t ORDER BY media_id""".stripMargin
    },

    // the oracle computes expected pixel sums straight from the text
    // (decoded raster = first 15·h chars in ORIGINAL order — the parser
    // undoes the bottom-up storage); n_bytes = 1078-byte header+palette
    // + h padded 16-byte rows. Only a fully-correct LE/palette/stride/
    // row-order decode reproduces these sums.
    "m07_bmp_decode" -> {
      def f(j: Int) =
        s"CAST(list_sum(list_transform(range(1, 15*h + 1), i -> CASE WHEN (i - 1) % 4 = $j THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS f$j"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 15, 8) AS h
           |  FROM documents WHERE length(text) >= 15)
           |SELECT media_id, kind,
           |  CAST(1078 + 16*h AS BIGINT) AS n_bytes,
           |  ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
           |FROM t ORDER BY media_id""".stripMargin
    },

    // per-channel sums straight from the text (payload = first 15·h
    // chars; channel c = positions ≡ c mod 3), and the 2×2 resize
    // checksum from the 12 source bytes nearest-neighbor picks:
    // dst (x,y) ∈ {0,1}² maps to source pixel (x·2, y·(h DIV 2)) of the
    // 5×h raster — 11-byte header ("P6\n5 h\n255\n", h one digit for
    // h ≤ 8) + raster
    "m09_ppm_decode" -> {
      def ch(c: Int, name: String) =
        s"CAST(list_sum(list_transform(range(1, 15*h + 1), i -> CASE WHEN (i - 1) % 3 = $c THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS $name"
      val rz = (for (yp <- 0 to 1; xp <- 0 to 1; c <- 0 to 2) yield {
        val sy = if (yp == 0) "0" else "(h // 2)"
        s"ord(substr(text, ($sy*5 + ${xp * 2})*3 + ${c + 1}, 1))"
      }).mkString(" + ")
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 15, 8) AS h
           |  FROM documents WHERE length(text) >= 15)
           |SELECT media_id, kind,
           |  CAST(11 + 15*h AS BIGINT) AS n_bytes,
           |  CAST(5 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  ${ch(0, "r_sum")}, ${ch(1, "g_sum")}, ${ch(2, "b_sum")},
           |  CAST($rz AS BIGINT) AS resize_checksum
           |FROM t ORDER BY media_id""".stripMargin
    },

    // per-channel sums as m09 (raster = first 15·h chars, channel c =
    // positions ≡ c mod 3); filters_seen from the row count alone: rows
    // 0..h−1 cycle filter types k mod 5, so the decoder must have seen
    // exactly types 0..min(h,5)−1 → mask (1 << least(h,5)) − 1
    "m10_png_decode" -> {
      def ch(c: Int, name: String) =
        s"CAST(list_sum(list_transform(range(1, 15*h + 1), i -> CASE WHEN (i - 1) % 3 = $c THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS $name"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 15, 8) AS h
           |  FROM documents WHERE length(text) >= 15)
           |SELECT media_id, kind,
           |  CAST(5 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  CAST(3 AS INTEGER) AS channels,
           |  CAST((1 << least(h, 5)) - 1 AS INTEGER) AS filters_seen,
           |  ${ch(0, "r_sum")}, ${ch(1, "g_sum")}, ${ch(2, "b_sum")}
           |FROM t ORDER BY media_id""".stripMargin
    },

    // per-channel sums straight from the text (byte i == ord(char i),
    // channel = position mod 3) — the oracle never sees the op stream;
    // the encode→parse round trip is what must preserve the sums
    "m13_qoi_decode" -> {
      def ch(c: Int, name: String) =
        s"CAST(list_sum(list_transform(range(1, 15*h + 1), i -> CASE WHEN (i - 1) % 3 = $c THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS $name"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 15, 8) AS h
           |  FROM documents WHERE length(text) >= 15)
           |SELECT media_id, kind,
           |  CAST(5 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  ${ch(0, "r_sum")}, ${ch(1, "g_sum")}, ${ch(2, "b_sum")}
           |FROM t ORDER BY media_id""".stripMargin
    },

    // the three containers carry the IDENTICAL raster, so expected
    // features are format-independent — only the tag follows the id
    // split; a mis-route or a parser pixel disagreement hash-mismatches
    "m15_format_dispatch" -> {
      def ch(c: Int, name: String) =
        s"CAST(list_sum(list_transform(range(1, 15*h + 1), i -> CASE WHEN (i - 1) % 3 = $c THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS $name"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 15, 8) AS h
           |  FROM documents WHERE length(text) >= 15)
           |SELECT media_id, kind,
           |  CASE media_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'qoi'
           |    ELSE 'png' END AS format,
           |  CAST(5 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  ${ch(0, "r_sum")}, ${ch(1, "g_sum")}, ${ch(2, "b_sum")}
           |FROM t ORDER BY media_id""".stripMargin
    },

    // every decoded byte straight from the text: frame f's Y plane =
    // positions with (i-1) % 48 < 16, U next 16, V last 16; the
    // frame-weighted luma sum replays the (frame_index+1) multiplier
    // from integer division; n_bytes from the fixed uncompressed
    // container arithmetic (35-byte stream header + 54 bytes/frame)
    "m16_y4m_frames" -> {
      def plane(lo: Int, hi: Int, name: String) =
        s"CAST(list_sum(list_transform(range(1, 48*nf + 1), i -> CASE WHEN (i - 1) % 48 >= $lo AND (i - 1) % 48 < $hi THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS $name"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 48, 8) AS nf
           |  FROM documents WHERE length(text) >= 48)
           |SELECT media_id, kind,
           |  CAST(35 + 54*nf AS BIGINT) AS n_bytes,
           |  CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           |  CAST(nf AS INTEGER) AS n_frames,
           |  ${plane(0, 16, "y_sum")}, ${plane(16, 32, "u_sum")},
           |  ${plane(32, 48, "v_sum")},
           |  CAST(list_sum(list_transform(range(1, 48*nf + 1),
           |    i -> CASE WHEN (i - 1) % 48 < 16
           |      THEN ((i - 1) // 48 + 1) * ord(substr(text, i, 1))
           |      ELSE 0 END)) AS BIGINT) AS y_weighted,
           |  CAST(list_sum(list_transform(range(1, 48*nf + 1),
           |    i -> CASE WHEN (i - 1) % 48 < 16
           |        AND ord(substr(text, i, 1)) >= 64
           |      THEN 1 ELSE 0 END)) AS BIGINT) AS y_bright,
           |  CAST(ord(substr(text, 1, 1)) AS INTEGER) AS first_y,
           |  CAST(ord(substr(text, 48*nf, 1)) AS INTEGER) AS last_v
           |FROM t ORDER BY media_id""".stripMargin
    },

    // m13's channel-sum oracle plus the two corner pixels straight from
    // the text layout: top-left = bytes 1..3, bottom-right = the last
    // triplet — only a parser that both un-flips the bottom-up rows AND
    // un-swaps BGR reproduces all five values
    "m14_tga_decode" -> {
      def ch(c: Int, name: String) =
        s"CAST(list_sum(list_transform(range(1, 15*h + 1), i -> CASE WHEN (i - 1) % 3 = $c THEN ord(substr(text, i, 1)) ELSE 0 END)) AS BIGINT) AS $name"
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 15, 8) AS h
           |  FROM documents WHERE length(text) >= 15)
           |SELECT media_id, kind,
           |  CAST(5 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  ${ch(0, "r_sum")}, ${ch(1, "g_sum")}, ${ch(2, "b_sum")},
           |  CAST(ord(substr(text, 1, 1)) * 65536 + ord(substr(text, 2, 1)) * 256
           |    + ord(substr(text, 3, 1)) AS INTEGER) AS first_px,
           |  CAST(ord(substr(text, 15*h - 2, 1)) * 65536
           |    + ord(substr(text, 15*h - 1, 1)) * 256
           |    + ord(substr(text, 15*h, 1)) AS INTEGER) AS last_px
           |FROM t ORDER BY media_id""".stripMargin
    },

    // indices are the text bytes; grays resolve through the planted
    // affine palette (7i+13) mod 256 — computable straight from the
    // characters, so the oracle checks the palette indirection without
    // ever seeing the LZW stream
    "m12_gif_decode" ->
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    least(length(text) // 8, 8) AS h
           |  FROM documents WHERE length(text) >= 8)
           |SELECT media_id, kind,
           |  CAST(8 AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  CAST(list_sum(list_transform(range(1, 8*h + 1),
           |    i -> ord(substr(text, i, 1)))) AS BIGINT) AS idx_sum,
           |  CAST(list_sum(list_transform(range(1, 8*h + 1),
           |    i -> (ord(substr(text, i, 1)) * 7 + 13) % 256)) AS BIGINT) AS gray_sum,
           |  CAST((ord(substr(text, 1, 1)) * 7 + 13) % 256 AS INTEGER) AS first_gray,
           |  CAST((ord(substr(text, 8*h, 1)) * 7 + 13) % 256 AS INTEGER) AS last_gray
           |FROM t ORDER BY media_id""".stripMargin,

    // identical framing oracle to m06, different container overhead: the
    // canonical WAV header is a fixed 44 bytes
    "m08_wav_frames" ->
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    length(text) AS n,
           |    CASE WHEN length(text) >= 400
           |         THEN (length(text) - 400) // 160 + 1 ELSE 0 END AS nf
           |  FROM documents),
           |fe AS (SELECT media_id, kind, n, nf,
           |    list_transform(range(0, nf), k ->
           |      list_sum(list_transform(range(1, 401),
           |        j -> ord(substr(text, CAST(k * 160 + j AS BIGINT), 1))))) AS es
           |  FROM t)
           |SELECT media_id, kind,
           |  CAST(44 + n AS BIGINT) AS n_bytes,
           |  CAST(nf AS BIGINT) AS n_frames,
           |  CAST(coalesce(list_sum(es), 0) AS BIGINT) AS total_energy,
           |  CAST(coalesce(list_max(es), 0) AS BIGINT) AS peak_energy
           |FROM fe ORDER BY media_id""".stripMargin,

    // m06's framing census without the container-size column (compressed
    // sizes aren't SQL-predictable): decoded FLAC samples == text bytes
    "m11_flac_frames" ->
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    length(text) AS n,
           |    CASE WHEN length(text) >= 400
           |         THEN (length(text) - 400) // 160 + 1 ELSE 0 END AS nf
           |  FROM documents),
           |fe AS (SELECT media_id, kind, n, nf,
           |    list_transform(range(0, nf), k ->
           |      list_sum(list_transform(range(1, 401),
           |        j -> ord(substr(text, CAST(k * 160 + j AS BIGINT), 1))))) AS es
           |  FROM t)
           |SELECT media_id, kind,
           |  CAST(nf AS BIGINT) AS n_frames,
           |  CAST(coalesce(list_sum(es), 0) AS BIGINT) AS total_energy,
           |  CAST(coalesce(list_max(es), 0) AS BIGINT) AS peak_energy
           |FROM fe ORDER BY media_id""".stripMargin,

    // the oracle frames the TEXT directly (payload == text bytes, ASCII):
    // frame k covers chars [k*160+1, k*160+400]; n_bytes adds the
    // "AU\n<len>\n" header (4 + digits of len)
    "m06_audio_frames" ->
      raw"""WITH t AS (SELECT doc_id AS media_id, source AS kind, text,
           |    length(text) AS n,
           |    CASE WHEN length(text) >= 400
           |         THEN (length(text) - 400) // 160 + 1 ELSE 0 END AS nf
           |  FROM documents),
           |fe AS (SELECT media_id, kind, n, nf,
           |    list_transform(range(0, nf), k ->
           |      list_sum(list_transform(range(1, 401),
           |        j -> ord(substr(text, CAST(k * 160 + j AS BIGINT), 1))))) AS es
           |  FROM t)
           |SELECT media_id, kind,
           |  CAST(4 + length(CAST(n AS VARCHAR)) + n AS BIGINT) AS n_bytes,
           |  CAST(nf AS BIGINT) AS n_frames,
           |  CAST(coalesce(list_sum(es), 0) AS BIGINT) AS total_energy,
           |  CAST(coalesce(list_max(es), 0) AS BIGINT) AS peak_energy
           |FROM fe ORDER BY media_id""".stripMargin,

    // resize = prefix-truncate to 64 bytes; frames = bytes 0,4,8,… of the
    // truncation; ASCII stand-in blobs keep it SQL-expressible.
    "m02_frame_sample" ->
      raw"""WITH t AS (SELECT doc_id AS media_id,
           |    least(length(text), 64) AS n, text FROM documents),
           |f AS (SELECT media_id, n, (n + 3) // 4 AS nf, text FROM t)
           |SELECT media_id,
           |  CAST(nf AS INTEGER) AS n_frames,
           |  CAST(CASE WHEN nf = 0 THEN -1 ELSE ord(substr(text, 1, 1)) END AS INTEGER) AS first_b,
           |  CAST(CASE WHEN nf = 0 THEN -1
           |       ELSE ord(substr(text, (nf - 1) * 4 + 1, 1)) END AS INTEGER) AS last_b,
           |  CAST(coalesce(list_sum(list_transform(range(0, nf),
           |    k -> ord(substr(text, k * 4 + 1, 1)))), 0) AS BIGINT) AS checksum
           |FROM f ORDER BY media_id""".stripMargin
  )
}
