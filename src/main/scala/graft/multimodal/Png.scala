package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free PNG codec (SURVEY.md §2.6): the one real media
  * decoder behind [[BinaryOps.featurize]] — no image library ships in
  * this environment, but PNG is just zlib + per-scanline filters, both
  * reimplementable from the public spec (RFC 2083 / W3C PNG) on
  * `java.util.zip` alone.
  *
  * Scope: 8-bit, non-interlaced images of every standard color type —
  * greyscale (0), RGB (2), palette (3, expanded to RGB), grey+alpha
  * (4), RGBA (6) — with all five scanline filters (None/Sub/Up/
  * Average/Paeth). 16-bit and Adam7-interlaced files raise a typed
  * [[Png.Unsupported]]; callers fall back to the declared stub. The
  * encoder exists for fixtures and round-trip specs (it can emit any
  * filter type per row, so the decoder's unfilter paths are all
  * exercised against ground truth).
  */
object Png {

  final case class Unsupported(msg: String) extends RuntimeException(msg)

  /** Decoded 8-bit image: row-major, channels interleaved. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > Signature.length &&
      Signature.indices.forall(i => bytes(i) == Signature(i))

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def decode(bytes: Array[Byte]): Image = {
    if (!isPng(bytes)) throw Unsupported("not a PNG signature")
    var off = Signature.length
    var width, height, bitDepth, colorType, interlace = -1
    var palette: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val data = off + 8
      if (len < 0 || data + len + 4 > bytes.length)
        throw Unsupported(s"truncated chunk $typ")
      typ match {
        case "IHDR" =>
          width = be32(bytes, data); height = be32(bytes, data + 4)
          bitDepth = bytes(data + 8) & 0xff
          colorType = bytes(data + 9) & 0xff
          interlace = bytes(data + 12) & 0xff
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, data, data + len)
        case "IDAT" => idat.write(bytes, data, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, tRNS alpha, gAMA, ...) skipped
      }
      off = data + len + 4 // skip CRC (integrity is the transport's job here)
    }
    if (width <= 0 || height <= 0) throw Unsupported("missing IHDR")
    if (bitDepth != 8) throw Unsupported(s"bit depth $bitDepth (only 8 supported)")
    if (interlace != 0) throw Unsupported("Adam7 interlacing not supported")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case t => throw Unsupported(s"color type $t")
    }
    if (colorType == 3 && palette == null) throw Unsupported("palette image without PLTE")

    // inflate the concatenated IDAT stream into filtered scanlines
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // any zero-progress state (truncated input, preset-dictionary
      // FDICT stream) must bail out — needsInput() alone would spin
      // forever on a dictionary-requiring stream
      if (n == 0) throw Unsupported("IDAT stream stalled (truncated or needs dictionary)")
      got += n
    }
    inf.end()
    if (got < raw.length) throw Unsupported(s"short pixel data: $got of ${raw.length}")

    // unfilter (spec §6): each scanline is filter-byte + bytes; a/b/c
    // are the RECONSTRUCTED left / up / up-left bytes
    val out = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val fo = y * (stride + 1)
      val f = raw(fo) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(fo + 1 + i) & 0xff
        val a = if (i >= bpp) out(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) out((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) out((y - 1) * stride + i - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case other => throw Unsupported(s"filter type $other")
        }
        out(y * stride + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }

    if (colorType == 3) {
      // palette indices -> RGB
      val rgb = new Array[Byte](width * height * 3)
      var p = 0
      while (p < width * height) {
        val idx = (out(p) & 0xff) * 3
        if (idx + 2 >= palette.length) throw Unsupported(s"palette index ${out(p) & 0xff} out of range")
        rgb(p * 3) = palette(idx); rgb(p * 3 + 1) = palette(idx + 1); rgb(p * 3 + 2) = palette(idx + 2)
        p += 1
      }
      Image(width, height, 3, rgb)
    } else Image(width, height, channels, out)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** 8-dim feature vector of a decoded image — the real-pixel
    * counterpart of the stub's md5 fakes: dimensions, channel count,
    * and intensity statistics (mean/std/min/max over all samples plus
    * mean horizontal gradient — a cheap sharpness proxy), intensities
    * normalized to [0, 1].
    */
  def features(img: Image): Array[Double] = {
    val n = img.pixels.length
    var sum = 0.0; var sumSq = 0.0; var mn = 255; var mx = 0
    var i = 0
    while (i < n) {
      val v = img.pixels(i) & 0xff
      sum += v; sumSq += v.toDouble * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val mean = sum / n
    val std = math.sqrt(math.max(0.0, sumSq / n - mean * mean))
    // mean |horizontal gradient| per channel sample
    var grad = 0.0; var gn = 0L
    val stride = img.width * img.channels
    var yy = 0
    while (yy < img.height) {
      var xx = img.channels
      while (xx < stride) {
        grad += math.abs((img.pixels(yy * stride + xx) & 0xff) -
          (img.pixels(yy * stride + xx - img.channels) & 0xff))
        gn += 1
        xx += 1
      }
      yy += 1
    }
    Array(
      img.width.toDouble, img.height.toDouble, img.channels.toDouble,
      mean / 255.0, std / 255.0, mn / 255.0, mx / 255.0,
      if (gn == 0) 0.0 else grad / gn / 255.0)
  }

  // ---------------------------------------------------------------- encoder

  /** Fixture/export encoder: 8-bit, channels ∈ {1,2,3,4}, one
    * IHDR/IDAT/IEND stream with proper CRCs. `filterOf(row)` picks the
    * per-row filter type (0-4) so specs can exercise every unfilter
    * path against known pixels.
    */
  def encode(img: Image, filterOf: Int => Int = _ => 0): Array[Byte] = {
    val colorType = img.channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => throw Unsupported(s"cannot encode $c channels")
    }
    val stride = img.width * img.channels
    val bpp = img.channels
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val f = filterOf(y)
      raw(y * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val x = img.pixels(y * stride + i) & 0xff
        val a = if (i >= bpp) img.pixels(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) img.pixels((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) img.pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
          case other => throw Unsupported(s"filter type $other")
        }
        raw(y * (stride + 1) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val zipped = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) zipped.write(buf, 0, def_.deflate(buf))
    def_.end()

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, img.width); putBe32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
    out.write(c)
  }
}
