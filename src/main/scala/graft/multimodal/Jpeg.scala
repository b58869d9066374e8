package graft.multimodal

/** Dependency-free baseline-sequential JPEG (JFIF) codec — grayscale,
  * 8-bit, the seventh real codec in the multimodal path and the first
  * with BOTH a lossy transform stage (DCT + quantization) and an
  * entropy stage (canonical Huffman, byte-stuffed bitstream). GIF's
  * LZW proved the entropy-decoder pattern; JPEG adds the transform
  * pipeline every real image corpus runs through.
  *
  * Decoder (general, within the declared envelope): SOI / APPn / COM
  * skip, DQT (8-bit tables, zigzag), SOF0 baseline 1-component
  * (multi-component raises [[Png.Unsupported]] — declared), DHT
  * (canonical Huffman reconstruction per the JPEG spec's
  * mincode/maxcode/valptr algorithm), DRI + RSTn restart handling,
  * SOS entropy-coded data with 0xFF00 unstuffing, DC prediction +
  * magnitude EXTEND, AC run/size with EOB and ZRL, dequantize,
  * separable IDCT, level shift + clamp. It decodes any baseline
  * grayscale JPEG (the MultimodalSpec cross-checks against the JDK's
  * ImageIO encoder), not just this encoder's output.
  *
  * Encoder: real JFIF bitstream — SOI, APP0, DQT, SOF0, DHT (two
  * generated canonical tables; any DHT-declared code is valid JPEG,
  * the decoder reads what the header says), SOS, Huffman-coded DC
  * diffs + AC runs with byte stuffing, EOI.
  *
  * Determinism contract (what lets `mm_jpeg_features` hash-match a
  * SQL oracle): every rounding is half-AWAY-FROM-ZERO ([[rnd]] — JVM
  * `Math.round` rounds half toward +∞ and would diverge from both
  * engines' SQL round() on negative halves), and the DC arithmetic
  * chain is a fixed sequence of IEEE operations on doubles both
  * engines construct identically (1/√2 via one correctly-rounded
  * sqrt + division; multiplication order pinned in [[fdctBlock]] /
  * [[idctBlock]]). AC terms use Math.cos tables and are covered by
  * tolerance specs, not the exact gate (the gate's fixtures are
  * constant blocks — DC-only by construction).
  *
  * Scale notes: payloads en/decode independently per row inside the
  * BinaryOps batch map — no shuffle, no driver state; malformed bytes
  * raise [[Png.Unsupported]] and callers degrade to a marked row.
  */
object Jpeg {

  final case class Gray(width: Int, height: Int, pixels: Array[Byte])

  /** Round half away from zero — SQL round() semantics in Spark AND
    * DuckDB (Math.round would round -1.5 to -1; both engines say -2).
    */
  def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** 1/√2 — C(0) of the DCT normalization; one correctly-rounded IEEE
    * sqrt and division, identical in any engine.
    */
  val InvSqrt2: Double = 1.0 / math.sqrt(2.0)

  // zigzag scan order: zigzag(i) = raster index of the i-th coefficient
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16): AC basis (u ≥ 1). Index [u][x].
  private val CosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16.0))

  private def cU(u: Int): Double = if (u == 0) InvSqrt2 else 1.0

  /** Forward DCT of one level-shifted 8×8 block (row-major ints in
    * [-128,127]). Multiplication order pinned: inner sum first (exact
    * integers for constant blocks since cos(0)=1), then
    * ((0.25·C(u))·C(v))·inner.
    */
  def fdctBlock(s: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var inner = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            inner += s(y * 8 + x) * CosTab(u)(x) * CosTab(v)(y)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = ((0.25 * cU(u)) * cU(v)) * inner
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT of one dequantized coefficient block → clamped
    * unsigned pixels. Zero coefficients are skipped, so a DC-only
    * block's output is exactly 128 + rnd(0.25·((R₀₀·C0)·C0)) — the
    * closed form the oracle replays.
    */
  def idctBlock(r: Array[Double]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = r(v * 8 + u)
            if (c != 0.0) acc += ((c * (cU(u) * CosTab(u)(x))) * (cU(v) * CosTab(v)(y)))
            v += 1
          }
          u += 1
        }
        val p = 128 + rnd(0.25 * acc)
        out(y * 8 + x) = math.max(0, math.min(255, p.toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------ tables

  /** Uniform quantization table (quality knob): all entries `q`. A
    * power-of-two q makes S/q an exact IEEE scaling — part of the
    * determinism contract.
    */
  def quantTable(q: Int): Array[Int] = Array.fill(64)(q)

  /** Generated canonical Huffman tables. DC: 12 categories at code
    * length 5; AC: all 162 baseline symbols (EOB, ZRL, (run,size)) at
    * length 8. Kraft-feasible, never reaching the all-ones code —
    * valid (if non-optimal) JPEG, like any quality setting; the
    * decoder honors whatever DHT declares.
    */
  val DcBits: Array[Int] = { val a = new Array[Int](16); a(4) = 12; a }
  val DcVals: Array[Int] = (0 to 11).toArray
  val AcBits: Array[Int] = { val a = new Array[Int](16); a(7) = 162; a }
  val AcVals: Array[Int] = {
    val b = collection.mutable.ArrayBuffer[Int](0x00)
    for (run <- 0 to 15; size <- 1 to 10) b += ((run << 4) | size)
    b += 0xF0
    b.toArray.sorted
  }

  /** Canonical code assignment (JPEG C.2): codes in order of
    * increasing length, then listing order. Returns (code, length)
    * per symbol.
    */
  def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out(vals(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.toMap
  }

  // ------------------------------------------------------------ encoder

  private final class BitWriter(buf: collection.mutable.ArrayBuffer[Byte]) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          buf += acc.toByte
          if ((acc & 0xff) == 0xff) buf += 0x00.toByte // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per the spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      buf += acc.toByte
      if ((acc & 0xff) == 0xff) buf += 0x00.toByte
      acc = 0; nbits = 0
    }
  }

  private def magnitude(v: Int): (Int, Int) = { // (size, bits)
    val a = math.abs(v)
    var size = 0
    while ((a >> size) != 0) size += 1
    val bits = if (v >= 0) v else v + (1 << size) - 1
    (size, bits)
  }

  /** Encode a grayscale image as baseline JFIF. Width/height pad to
    * block multiples by edge replication (standard practice).
    */
  def encodeGray(img: Gray, q: Int = 16): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    val qt = quantTable(q)
    val bw = (img.width + 7) / 8
    val bh = (img.height + 7) / 8
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += v.toByte
    def u16(v: Int): Unit = { u8((v >> 8) & 0xff); u8(v & 0xff) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16); out ++= "JFIF".getBytes("US-ASCII"); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0) // APP0 v1.1, no density/thumb
    marker(0xdb); u16(2 + 1 + 64); u8(0) // DQT, 8-bit table 0
    var i = 0
    while (i < 64) { u8(qt(Zigzag(i))); i += 1 } // stored in zigzag order
    marker(0xc0); u16(8 + 3 * 1); u8(8); u16(img.height); u16(img.width); u8(1)
    u8(1); u8(0x11); u8(0) // component 1, 1x1 sampling, qtable 0
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(clazz << 4)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda); u16(6 + 2 * 1); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val w = new BitWriter(out)
    var pred = 0
    val blk = new Array[Int](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sy = math.min(img.height - 1, by * 8 + yy)
            val sx = math.min(img.width - 1, bx * 8 + xx)
            blk(yy * 8 + xx) = (img.pixels(sy * img.width + sx) & 0xff) - 128
            xx += 1
          }
          yy += 1
        }
        val coefs = fdctBlock(blk)
        val zz = new Array[Int](64)
        i = 0
        while (i < 64) {
          val ri = Zigzag(i)
          zz(i) = rnd(coefs(ri) / qt(ri)).toInt
          i += 1
        }
        val diff = zz(0) - pred
        pred = zz(0)
        val (ds, db) = magnitude(diff)
        val (dc, dl) = dcCodes(ds)
        w.put(dc, dl)
        if (ds > 0) w.put(db, ds)
        var run = 0
        i = 1
        while (i < 64) {
          if (zz(i) == 0) run += 1
          else {
            while (run > 15) { val (c, l) = acCodes(0xF0); w.put(c, l); run -= 16 }
            val (as, ab) = magnitude(zz(i))
            require(as <= 10, s"AC magnitude category $as exceeds encoder table")
            val (c, l) = acCodes((run << 4) | as)
            w.put(c, l); w.put(ab, as)
            run = 0
          }
          i += 1
        }
        if (run > 0) { val (c, l) = acCodes(0x00); w.put(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    w.flush()
    marker(0xd9) // EOI
    out.toArray
  }

  // ------------------------------------------------------------ decoder

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // JPEG F.2.2.3 mincode/maxcode/valptr decode tables
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var l = 1
      var code = r.bit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | r.bit()
        l += 1
      }
      if (l > 16) throw Png.Unsupported("invalid Huffman code")
      vals(valPtr(l) + (code - minCode(l)))
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawEoi = false
    def align(): Unit = { acc = 0; nbits = 0 }
    /** Next marker if positioned at one (for RST handling). */
    def atMarker: Option[Int] =
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) != 0x00)
        Some(b(pos + 1) & 0xff)
      else None
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw Png.Unsupported("bitstream underrun")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          val m = if (pos < b.length) b(pos) & 0xff else -1
          if (m == 0x00) pos += 1 // stuffed byte
          else if (m == 0xd9) { sawEoi = true; v = 0 } // EOI: pad reads as 0
          else throw Png.Unsupported(f"unexpected marker FF$m%02x in scan")
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** Decode a baseline grayscale JFIF/JPEG stream. */
  def decode(bytes: Array[Byte]): Gray = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      throw Png.Unsupported("not a JPEG SOI")
    var pos = 2
    val qts = collection.mutable.Map.empty[Int, Array[Int]]
    val dcT = collection.mutable.Map.empty[Int, Huff]
    val acT = collection.mutable.Map.empty[Int, Huff]
    var width = 0; var height = 0
    var dcSel = 0; var acSel = 0; var qSel = 0
    var restartInterval = 0
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 1 >= bytes.length) throw Png.Unsupported("truncated before SOS")
      if ((bytes(pos) & 0xff) != 0xff) throw Png.Unsupported("marker expected")
      // spec-legal padding: any run of 0xFF fill bytes may precede the
      // marker code (ITU T.81 §B.1.1.2) — skip to the last 0xFF so the
      // byte after it is the actual marker, not another fill byte.
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= bytes.length) throw Png.Unsupported("truncated before SOS")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        // standalone markers (no length segment): stray SOI, TEM, RSTn
        case x if x == 0xd8 || x == 0x01 || (x >= 0xd0 && x <= 0xd7) => ()
        case _ =>
          val len = u16(pos)
          val body = pos + 2
          m match {
            case 0xdb =>
              var o = body
              while (o < pos + len) {
                val pq = (bytes(o) >> 4) & 0xf
                val tq = bytes(o) & 0xf
                if (pq != 0) throw Png.Unsupported("16-bit DQT unsupported")
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(Zigzag(i)) = bytes(o + 1 + i) & 0xff; i += 1 }
                qts(tq) = t
                o += 65
              }
            case 0xc4 =>
              var o = body
              while (o < pos + len) {
                val clazz = (bytes(o) >> 4) & 0xf
                val id = bytes(o) & 0xf
                val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
                val n = bits.sum
                val vals = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xff)
                if (clazz == 0) dcT(id) = new Huff(bits, vals)
                else acT(id) = new Huff(bits, vals)
                o += 17 + n
              }
            case 0xc0 =>
              if ((bytes(body) & 0xff) != 8) throw Png.Unsupported("non-8-bit precision")
              height = u16(body + 1); width = u16(body + 3)
              val nc = bytes(body + 5) & 0xff
              if (nc != 1) throw Png.Unsupported(s"$nc-component JPEG unsupported (grayscale only)")
              qSel = bytes(body + 8) & 0xf
            case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                 0xcd | 0xce | 0xcf =>
              throw Png.Unsupported(f"non-baseline SOF FF$m%02x")
            case 0xdd =>
              restartInterval = u16(body)
            case 0xda =>
              val ns = bytes(body) & 0xff
              if (ns != 1) throw Png.Unsupported("multi-component scan")
              dcSel = (bytes(body + 2) >> 4) & 0xf
              acSel = bytes(body + 2) & 0xf
              scanStart = pos + len
            case _ => () // APPn / COM / others: skip
          }
          pos += len
      }
    }
    if (width == 0 || height == 0) throw Png.Unsupported("missing SOF0")
    val qt = qts.getOrElse(qSel, throw Png.Unsupported("missing DQT"))
    val dc = dcT.getOrElse(dcSel, throw Png.Unsupported("missing DC DHT"))
    val ac = acT.getOrElse(acSel, throw Png.Unsupported("missing AC DHT"))
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val pix = new Array[Byte](width * height)
    val r = new BitReader(bytes, scanStart)
    var pred = 0
    var blocksDone = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && blocksDone > 0 && blocksDone % restartInterval == 0) {
          r.align()
          r.atMarker match {
            case Some(m) if m >= 0xd0 && m <= 0xd7 => r.pos += 2; pred = 0
            case _ => throw Png.Unsupported("expected RST marker")
          }
        }
        val coefs = new Array[Double](64)
        val ds = dc.decode(r)
        pred += extend(r.receive(ds), ds)
        coefs(0) = pred.toDouble * qt(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = ac.decode(r)
          val run = (rs >> 4) & 0xf
          val size = rs & 0xf
          if (size == 0) {
            if (run == 15) k += 16 else eob = true // ZRL vs EOB
          } else {
            k += run
            if (k > 63) throw Png.Unsupported("AC index overflow")
            val ri = Zigzag(k)
            coefs(ri) = extend(r.receive(size), size).toDouble * qt(ri)
            k += 1
          }
        }
        val block = idctBlock(coefs)
        var yy = 0
        while (yy < 8) {
          val py = by * 8 + yy
          if (py < height) {
            var xx = 0
            while (xx < 8) {
              val px = bx * 8 + xx
              if (px < width) pix(py * width + px) = block(yy * 8 + xx).toByte
              xx += 1
            }
          }
          yy += 1
        }
        blocksDone += 1
        bx += 1
      }
      by += 1
    }
    Gray(width, height, pix)
  }
}
