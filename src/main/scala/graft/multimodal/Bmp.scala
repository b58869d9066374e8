package graft.multimodal

/** Dependency-free BMP (Windows bitmap) decoder for the multimodal
  * featurize path (SURVEY.md §2.6) — the second real codec next to
  * [[Png]]. Scope: the uncompressed BI_RGB BITMAPINFOHEADER form at
  * 24/32 bpp, which is what "a BMP" means in practice; anything else
  * throws [[Png.Unsupported]] and the batch-level dispatch degrades
  * that one payload to the stub (a single odd file must never kill a
  * 100 TB batch). Decodes to [[Png.Image]] so the downstream feature
  * extraction is codec-agnostic.
  */
object Bmp {

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode to 3-channel RGB, row-major top-down (the [[Png.Image]]
    * layout). BMP stores rows bottom-up (positive height) in BGR with
    * 4-byte row padding; negative height means top-down and is
    * handled; 32 bpp drops the alpha/padding byte.
    */
  def decode(bytes: Array[Byte]): Png.Image = {
    if (!isBmp(bytes)) throw Png.Unsupported("not a BMP")
    val dataOff = i32(bytes, 10)
    val dibSize = i32(bytes, 14)
    if (dibSize < 40) throw Png.Unsupported(s"ancient DIB header ($dibSize)")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    if (compression != 0) throw Png.Unsupported(s"compressed BMP ($compression)")
    if (bpp != 24 && bpp != 32) throw Png.Unsupported(s"unsupported bpp ($bpp)")
    if (width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20))
      throw Png.Unsupported(s"bad dimensions ${width}x$rawHeight")
    val srcBytesPerPx = bpp / 8
    val rowSize = ((width * srcBytesPerPx + 3) / 4) * 4
    // a negative/in-header dataOff is malformed and would index before
    // the pixel array — reject it as Unsupported, not an AIOOBE
    if (dataOff < 54) throw Png.Unsupported(s"bad pixel-data offset ($dataOff)")
    if (dataOff.toLong + rowSize.toLong * height > bytes.length)
      throw Png.Unsupported("truncated pixel data")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      val rowOff = dataOff + srcRow * rowSize
      while (x < width) {
        val s = rowOff + x * srcBytesPerPx
        val d = (y * width + x) * 3
        out(d) = bytes(s + 2)     // R (stored B,G,R[,A])
        out(d + 1) = bytes(s + 1) // G
        out(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    Png.Image(width, height, 3, out)
  }

  /** Minimal 24-bpp BI_RGB encoder (fixtures + round-trip tests):
    * takes row-major top-down RGB and writes the bottom-up padded
    * layout [[decode]] reads back.
    */
  def encode24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length mismatch")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        buf.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s))
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }
}
