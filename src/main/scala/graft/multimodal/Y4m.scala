package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

/** Dependency-free Y4M (YUV4MPEG2) video parser — the frame codec
  * behind the frame-sampling operator, closing the last declared
  * multimodal stub the way [[Png]] closed image featurize.
  *
  * Y4M is the uncompressed interchange format every ffmpeg/mjpegtools
  * pipeline speaks: an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> [I? A? C? X?]\n`, then per frame an
  * ASCII `FRAME[ params]\n` marker followed by raw planar YUV bytes.
  * Plane sizes follow the `C` colorspace tag: 4:2:0 (default) carries
  * Y (w×h) + U,V at half resolution both ways; 4:2:2 halves width
  * only; 4:4:4 is full-resolution chroma; `Cmono` has no chroma.
  *
  * Scale notes: payloads decode independently per row inside
  * `mapPartitions` batches (BinaryOps), so the operator parallelizes
  * like any other binary-column map — no shuffle, no driver work. A
  * corrupt payload raises; callers wrap with the same armor as the
  * PNG path (one bad file must never kill a 100 TB batch).
  */
object Y4m {

  private val Magic = "YUV4MPEG2"

  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte]) {
    /** Mean luma over the Y plane, the standard per-frame brightness
      * statistic (bytes are unsigned).
      */
    def meanLuma: Double =
      if (y.isEmpty) 0.0 else {
        var s = 0L; var i = 0
        while (i < y.length) { s += y(i) & 0xff; i += 1 }
        s.toDouble / y.length
      }
  }

  final case class Video(width: Int, height: Int, colorspace: String, frames: Array[Frame])

  def isY4m(bytes: Array[Byte]): Boolean =
    bytes.length > Magic.length &&
      new String(bytes, 0, Magic.length, US_ASCII) == Magic &&
      (bytes(Magic.length) == ' '.toByte || bytes(Magic.length) == '\n'.toByte)

  /** Chroma plane dimensions for a colorspace tag. Ceil-division
    * covers odd frame sizes the way the mjpegtools reference does.
    */
  private def chromaDims(cs: String, w: Int, h: Int): (Int, Int) =
    if (cs.startsWith("420")) ((w + 1) / 2, (h + 1) / 2)
    else if (cs.startsWith("422")) ((w + 1) / 2, h)
    else if (cs.startsWith("444")) (w, h)
    else if (cs.startsWith("mono")) (0, 0)
    else throw new IllegalArgumentException(s"unsupported Y4M colorspace C$cs")

  /** Parse a complete Y4M stream. Strict: a malformed header, an
    * unknown frame marker, or a truncated plane all raise — the
    * caller decides whether to armor (BinaryOps degrades to the
    * deterministic stub, mirroring the PNG path).
    */
  def decode(bytes: Array[Byte]): Video = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "Y4M: missing stream header terminator")
    val header = new String(bytes, 0, nl, US_ASCII)
    val parts = header.split(' ')
    require(parts(0) == Magic, "Y4M: bad magic")
    var w = -1; var h = -1; var cs = "420"
    parts.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'C' => cs = p.substring(1)
        case _   => () // F (rate), I (interlace), A (aspect), X (meta) don't affect layout
      }
    }
    require(w > 0 && h > 0, s"Y4M: missing or invalid W/H in '$header'")
    val (cw, ch) = chromaDims(cs, w, h)
    val ySize = w * h
    val cSize = cw * ch

    val frames = Array.newBuilder[Frame]
    var pos = nl + 1
    while (pos < bytes.length) {
      var lineEnd = pos
      while (lineEnd < bytes.length && bytes(lineEnd) != '\n'.toByte) lineEnd += 1
      require(lineEnd < bytes.length, "Y4M: truncated FRAME marker")
      val marker = new String(bytes, pos, lineEnd - pos, US_ASCII)
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"Y4M: expected FRAME marker, got '$marker'")
      pos = lineEnd + 1
      require(pos + ySize + 2L * cSize <= bytes.length, "Y4M: truncated frame data")
      val y = java.util.Arrays.copyOfRange(bytes, pos, pos + ySize)
      val u = java.util.Arrays.copyOfRange(bytes, pos + ySize, pos + ySize + cSize)
      val v = java.util.Arrays.copyOfRange(bytes, pos + ySize + cSize, pos + ySize + 2 * cSize)
      frames += Frame(y, u, v)
      pos += ySize + 2 * cSize
    }
    Video(w, h, cs, frames.result())
  }

  /** Emit a C420 stream from raw luma planes (chroma fixed at the
    * neutral 128) — the deterministic encoder the gate uses to turn
    * corpus bytes into honest video payloads, and the round-trip
    * partner the spec drives the decoder with.
    */
  def encodeC420(width: Int, height: Int, lumaFrames: Seq[Array[Byte]]): Array[Byte] = {
    val ySize = width * height
    require(lumaFrames.forall(_.length == ySize), "encode: luma plane size mismatch")
    val cSize = ((width + 1) / 2) * ((height + 1) / 2)
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n".getBytes(US_ASCII)
    val frameMarker = "FRAME\n".getBytes(US_ASCII)
    val out = new java.io.ByteArrayOutputStream(
      header.length + lumaFrames.size * (frameMarker.length + ySize + 2 * cSize))
    out.write(header)
    val chroma = Array.fill[Byte](cSize)(128.toByte)
    lumaFrames.foreach { yp =>
      out.write(frameMarker)
      out.write(yp)
      out.write(chroma)
      out.write(chroma)
    }
    out.toByteArray
  }
}
