package graft.ext

/** Pure-JVM FLAC codec for 8-bit mono streams — the compressed AUDIO
  * sibling of [[Png]]: like PNG, FLAC is fully public (the FLAC format
  * specification, RFC 9639 / https://xiph.org/flac/format.html) and —
  * being built from bit-packing, fixed linear predictors, and Rice
  * coding rather than licensed DSP — implementable with zero
  * dependencies. What it adds structurally over the uncompressed audio
  * arms (AU, WAV) is the full entropy-coded path: bit-granular reading,
  * UTF-8-style coded frame numbers, CRC-8 frame-header and CRC-16
  * whole-frame checksums, zig-zag Rice residuals with partitioned
  * parameters, and order-0..4 fixed-predictor reconstruction.
  *
  * Supported (strictly — anything else returns None): "fLaC" magic, a
  * leading STREAMINFO metadata block (other metadata blocks skipped),
  * mono / 8-bits-per-sample / fixed-blocksize streams, subframe types
  * CONSTANT, VERBATIM, and FIXED orders 0–4, Rice method 0 (4-bit
  * parameters) with any partition order including escaped raw
  * partitions, and wasted-bits shifts. Every frame's CRC-8 and CRC-16
  * are verified, the decoded sample count must equal STREAMINFO's
  * total, and the last frame must end the file exactly.
  */
object Flac {

  /** Decoded stream: 8-bit SIGNED mono PCM samples. */
  final case class Audio(sampleRate: Int, samples: Array[Byte])

  // ---- CRCs (FLAC polynomials: CRC-8 0x07, CRC-16 0x8005, init 0) ----

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit I/O ----

  private final class BitReader(val b: Array[Byte], startByte: Int) {
    var pos: Int = startByte // byte position
    var bit: Int = 0         // bits consumed in current byte (0..7)
    def inBounds: Boolean = pos < b.length
    def failed: Boolean = _failed
    private var _failed = false
    def fail(): Long = { _failed = true; 0L }
    def bits(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        if (pos >= b.length) return fail()
        val avail = 8 - bit
        val take = math.min(avail, left)
        val cur = (b(pos) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | cur
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }
    def unary(): Int = {
      var q = 0
      while (true) {
        if (pos >= b.length) { fail(); return 0 }
        if (bits(1) == 1L) return q
        q += 1
        if (q > (1 << 24)) { fail(); return 0 } // runaway guard
      }
      0
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def write(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nb, left)
        val piece = ((v >>> (left - take)) & ((1L << take) - 1)).toInt
        cur = (cur << take) | piece
        nb += take
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        left -= take
      }
    }
    def align(): Unit = if (nb != 0) { write(0, 8 - nb) }
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private def zigzag(v: Int): Long = if (v >= 0) v.toLong << 1 else ((-v.toLong) << 1) - 1
  private def unzigzag(u: Long): Int =
    if ((u & 1) == 0) (u >>> 1).toInt else -(((u + 1) >>> 1).toInt)

  /** signed n-bit value from raw bits */
  private def signExtend(v: Long, n: Int): Int = {
    val shifted = v << (64 - n)
    (shifted >> (64 - n)).toInt
  }

  // fixed-predictor reconstruction, s = residual + prediction
  private def predict(order: Int, s: Array[Int], i: Int): Int = order match {
    case 0 => 0
    case 1 => s(i - 1)
    case 2 => 2 * s(i - 1) - s(i - 2)
    case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
    case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
  }

  /** Strict parse; None on anything outside the supported subset or any
    * CRC/length violation. */
  def parse(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 4 + 4 + 34) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      return None
    var pos = 4
    // metadata blocks; first MUST be STREAMINFO (type 0, length 34)
    var rate = -1; var total = -1L
    var first = true
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      if (pos + len > bytes.length) return None
      if (first) {
        if (typ != 0 || len != 34) return None
        val r = new BitReader(bytes, pos)
        r.bits(16); r.bits(16) // min/max blocksize
        r.bits(24); r.bits(24) // min/max framesize
        rate = r.bits(20).toInt
        val channels = r.bits(3).toInt + 1
        val bps = r.bits(5).toInt + 1
        total = r.bits(36)
        if (channels != 1 || bps != 8) return None
        if (rate <= 0 || total < 0 || total > Int.MaxValue) return None
        first = false
      } else if (typ == 0 || typ == 127) return None // dup STREAMINFO / invalid
      pos += len
    }
    if (rate < 0) return None
    val samples = new Array[Byte](total.toInt)
    var got = 0
    while (got < total) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      if (r.bits(14) != 0x3ffe) return None // sync
      if (r.bits(1) != 0) return None       // reserved
      r.bits(1)                             // blocking strategy (accept both)
      val bsCode = r.bits(4).toInt
      val srCode = r.bits(4).toInt
      val chAsg = r.bits(4).toInt
      val ssCode = r.bits(3).toInt
      if (r.bits(1) != 0) return None       // reserved
      if (chAsg != 0) return None           // mono
      if (ssCode != 1) return None          // 8 bits per sample
      if (srCode != 0) return None          // rate from STREAMINFO
      // UTF-8-style coded frame/sample number
      val b0 = r.bits(8).toInt
      var follow = 0
      if (b0 < 0x80) follow = 0
      else if ((b0 & 0xe0) == 0xc0) follow = 1
      else if ((b0 & 0xf0) == 0xe0) follow = 2
      else if ((b0 & 0xf8) == 0xf0) follow = 3
      else if ((b0 & 0xfc) == 0xf8) follow = 4
      else if ((b0 & 0xfe) == 0xfc) follow = 5
      else if (b0 == 0xfe) follow = 6
      else return None
      var k = 0
      while (k < follow) {
        if ((r.bits(8).toInt & 0xc0) != 0x80) return None
        k += 1
      }
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.bits(8).toInt + 1
        case 7 => r.bits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      if (blockSize <= 0 || got + blockSize > total) return None
      // CRC-8 over header bytes [frameStart, here) — header ends byte-aligned
      if (r.bit != 0) return None
      val crc8Pos = r.pos
      if (crc8(bytes, frameStart, crc8Pos) != r.bits(8).toInt) return None
      // one mono subframe
      if (r.bits(1) != 0) return None // padding
      val sfType = r.bits(6).toInt
      var wasted = 0
      if (r.bits(1) == 1L) wasted = r.unary() + 1
      val bps = 8 - wasted
      val s = new Array[Int](blockSize)
      sfType match {
        case 0 => // CONSTANT
          val v = signExtend(r.bits(bps), bps)
          java.util.Arrays.fill(s, v)
        case 1 => // VERBATIM
          var i = 0
          while (i < blockSize) { s(i) = signExtend(r.bits(bps), bps); i += 1 }
        case t if t >= 8 && t <= 12 => // FIXED order 0-4
          val order = t - 8
          if (order > blockSize) return None
          var i = 0
          while (i < order) { s(i) = signExtend(r.bits(bps), bps); i += 1 }
          // partitioned Rice residual
          val method = r.bits(2).toInt
          if (method > 1) return None
          val pBits = if (method == 0) 4 else 5
          val escape = (1 << pBits) - 1
          val po = r.bits(4).toInt
          val parts = 1 << po
          // FLAC: block must split evenly and the first partition must
          // still have room for its warmup-shortened run
          if (blockSize % parts != 0 || (blockSize >> po) < order) return None
          var p = 0
          var idx = order
          while (p < parts) {
            val n = (blockSize >> po) - (if (p == 0) order else 0)
            if (n < 0) return None
            val param = r.bits(pBits).toInt
            if (param == escape) {
              val raw = r.bits(5).toInt
              var j = 0
              while (j < n) {
                val res = if (raw == 0) 0 else signExtend(r.bits(raw), raw)
                s(idx) = res + predict(order, s, idx); idx += 1; j += 1
              }
            } else {
              var j = 0
              while (j < n) {
                val q = r.unary()
                val rem = if (param == 0) 0L else r.bits(param)
                val res = unzigzag((q.toLong << param) | rem)
                s(idx) = res + predict(order, s, idx); idx += 1; j += 1
              }
            }
            p += 1
          }
        case _ => return None // LPC and reserved types unsupported
      }
      if (r.failed) return None
      r.align()
      val crc16Pos = r.pos
      if (crc16(bytes, frameStart, crc16Pos) != r.bits(16).toInt) return None
      if (r.failed) return None
      var i = 0
      while (i < blockSize) {
        val v = s(i) << wasted
        if (v < -128 || v > 127) return None
        samples(got + i) = v.toByte
        i += 1
      }
      got += blockSize
      pos = r.pos
    }
    if (pos != bytes.length) return None // strict EOF
    Some(Audio(rate, samples))
  }

  /** Encode 8-bit signed mono samples as a well-formed FLAC stream:
    * fixed 256-sample blocks (last partial), FIXED predictor of order
    * `orderFor(frameIndex)` (0–2; clamped to the frame length), Rice
    * method 0 with partition order 0 and a per-frame parameter fitted to
    * the residual magnitudes. */
  def encode(rate: Int, samples: Array[Byte],
      orderFor: Int => Int = _ % 3): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20), s"rate $rate out of range")
    val block = 256
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.write(block, 16); si.write(block, 16) // min/max blocksize
    si.write(0, 24); si.write(0, 24)         // min/max framesize (unknown)
    si.write(rate, 20)
    si.write(0, 3)  // channels - 1
    si.write(7, 5)  // bps - 1
    si.write(samples.length.toLong, 36)
    si.write(0, 64); si.write(0, 64)         // md5 (unset)
    val siB = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length)
    out.write(siB, 0, siB.length)
    var frame = 0
    var off = 0
    while (off < samples.length || (samples.length == 0 && frame == 0)) {
      if (samples.length == 0) return out.toByteArray // zero-sample stream: no frames
      val n = math.min(block, samples.length - off)
      val order = math.min(math.max(orderFor(frame), 0), math.min(2, n - 1))
      val w = new BitWriter
      w.write(0x3ffe, 14) // sync
      w.write(0, 1); w.write(0, 1) // reserved, fixed blocksize
      w.write(6, 4)  // blocksize: 8-bit value - 1 follows
      w.write(0, 4)  // sample rate: from STREAMINFO
      w.write(0, 4)  // mono
      w.write(1, 3)  // 8 bits per sample
      w.write(0, 1)  // reserved
      // UTF-8 coded frame number
      if (frame < 0x80) w.write(frame, 8)
      else if (frame < 0x800) {
        w.write(0xc0 | (frame >> 6), 8); w.write(0x80 | (frame & 0x3f), 8)
      } else {
        w.write(0xe0 | (frame >> 12), 8); w.write(0x80 | ((frame >> 6) & 0x3f), 8)
        w.write(0x80 | (frame & 0x3f), 8)
      }
      w.write(n - 1, 8)
      val hdr = w.toBytes // aligned: header is whole bytes
      val crc8v = crc8(hdr, 0, hdr.length)
      // subframe: FIXED order, no wasted bits
      val sf = new BitWriter
      sf.write(0, 1)            // padding
      sf.write(8 + order, 6)    // FIXED order
      sf.write(0, 1)            // no wasted bits
      val s = new Array[Int](n)
      var i = 0
      while (i < n) { s(i) = samples(off + i); i += 1 }
      i = 0
      while (i < order) { sf.write(s(i).toLong & 0xff, 8); i += 1 }
      val res = new Array[Int](n - order)
      i = order
      while (i < n) { res(i - order) = s(i) - predict(order, s, i); i += 1 }
      // Rice parameter fitted to mean zig-zag magnitude
      var mean = 0L
      res.foreach(r0 => mean += zigzag(r0))
      mean = if (res.nonEmpty) mean / res.length else 0
      var param = 0
      while ((mean >> param) > 1 && param < 14) param += 1
      sf.write(0, 2)      // Rice method 0
      sf.write(0, 4)      // partition order 0
      sf.write(param, 4)
      res.foreach { r0 =>
        val u = zigzag(r0)
        val q = (u >> param).toInt
        var k = 0
        while (k < q) { sf.write(0, 1); k += 1 }
        sf.write(1, 1)
        if (param > 0) sf.write(u & ((1L << param) - 1), param)
      }
      val body = sf.toBytes
      val frameBytes = new java.io.ByteArrayOutputStream()
      frameBytes.write(hdr, 0, hdr.length)
      frameBytes.write(crc8v)
      frameBytes.write(body, 0, body.length)
      val fb = frameBytes.toByteArray
      val crc16v = crc16(fb, 0, fb.length)
      out.write(fb, 0, fb.length)
      out.write(crc16v >> 8); out.write(crc16v & 0xff)
      off += n
      frame += 1
    }
    out.toByteArray
  }
}
