package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

/** Dependency-free GIF87a/89a decoder — the first genuinely
  * COMPRESSED frame codec in the multimodal path (Y4M is raw planes;
  * PNG/BMP are stills): animated GIFs carry per-frame rectangles of
  * LZW-compressed palette indices, so frame sampling here exercises a
  * real entropy decoder end to end. Frames decode FRAME-LOCAL (each
  * frame's own rectangle and palette; no inter-frame disposal
  * compositing — declared: feature extraction reads per-frame
  * statistics, not a rendered canvas).
  *
  * Layout parsed: header, logical screen descriptor, global color
  * table, graphic-control extensions (delay), image descriptors with
  * optional local color tables and interlacing, LZW sub-blocks,
  * trailer. Variable-width LZW codes (max 12 bits) read LSB-first
  * with dictionary growth and CLEAR/END handling per the spec.
  *
  * Scale notes: payloads decode independently per row inside the
  * BinaryOps batch map — no shuffle, no driver work; malformed bytes
  * raise [[Png.Unsupported]] and callers armor exactly like the
  * PNG/Y4M paths (one bad file must never kill a 100 TB batch).
  */
object Gif {

  /** One frame: its rectangle, delay (centiseconds, 0 if none) and
    * decoded palette indices (row-major, de-interlaced), plus the
    * palette in force (local if present, else global) as RGB triples.
    */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, indices: Array[Byte], palette: Array[Byte]) {
    /** Mean of the red channel — for a grayscale palette this is the
      * mean original byte value (the Y4M meanLuma analogue).
      */
    def meanRed: Double =
      if (indices.isEmpty) 0.0 else {
        var s = 0L; var i = 0
        while (i < indices.length) { s += palette(3 * (indices(i) & 0xff)) & 0xff; i += 1 }
        s.toDouble / indices.length
      }
  }

  final case class Anim(width: Int, height: Int, frames: Array[Frame])

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && {
      val m = new String(bytes, 0, 6, US_ASCII)
      m == "GIF87a" || m == "GIF89a"
    }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decode(bytes: Array[Byte]): Anim = {
    if (!isGif(bytes)) throw Png.Unsupported("not a GIF signature")
    if (bytes.length < 13) throw Png.Unsupported("truncated GIF header")
    val width = u16(bytes, 6)
    val height = u16(bytes, 8)
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > bytes.length) throw Png.Unsupported("truncated global color table")
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    val frames = Array.newBuilder[Frame]
    var delayCs = 0
    var done = false
    while (!done) {
      if (pos >= bytes.length) throw Png.Unsupported("missing GIF trailer")
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          if (pos + 1 >= bytes.length) throw Png.Unsupported("truncated extension")
          val label = bytes(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9) { // graphic control: fixed 4-byte block
            if (pos + 5 >= bytes.length || bytes(pos) != 4)
              throw Png.Unsupported("malformed graphic control")
            delayCs = u16(bytes, pos + 2)
            pos += 5
          }
          // skip remaining sub-blocks (or all, for other labels)
          while ({
            if (pos >= bytes.length) throw Png.Unsupported("truncated sub-blocks")
            val len = bytes(pos) & 0xff; pos += 1 + len; len != 0
          }) ()
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) throw Png.Unsupported("truncated image descriptor")
          val left = u16(bytes, pos + 1); val top = u16(bytes, pos + 3)
          val w = u16(bytes, pos + 5); val h = u16(bytes, pos + 7)
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + 3 * n > bytes.length) throw Png.Unsupported("truncated local color table")
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (pal == null) throw Png.Unsupported("no color table in scope")
          if (w <= 0 || h <= 0) throw Png.Unsupported("empty frame rectangle")
          if (pos >= bytes.length) throw Png.Unsupported("missing LZW code size")
          val minCode = bytes(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) throw Png.Unsupported(s"LZW min code $minCode")
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while ({
            if (pos >= bytes.length) throw Png.Unsupported("truncated LZW sub-blocks")
            val len = bytes(pos) & 0xff
            if (pos + 1 + len > bytes.length) throw Png.Unsupported("truncated LZW sub-block")
            data.write(bytes, pos + 1, len); pos += 1 + len; len != 0
          }) ()
          var idx = lzwDecode(data.toByteArray, minCode, w * h)
          if ((ip & 0x40) != 0) idx = deinterlace(idx, w, h)
          frames += Frame(left, top, w, h, delayCs, idx, pal)
          delayCs = 0
        case other => throw Png.Unsupported(f"unknown GIF block 0x$other%02x")
      }
    }
    Anim(width, height, frames.result())
  }

  /** GIF-variant LZW: variable code width starting at minCode+1 bits
    * (max 12), codes packed LSB-first, CLEAR resets the dictionary,
    * END stops. Dictionary as parallel prefix/suffix arrays with
    * stack unwinding — the classic allocation-free shape.
    */
  private[multimodal] def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var dictSize = end + 1
    var codeSize = minCode + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var acc = 0; var accBits = 0; var dataPos = 0
    var prev = -1
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    def next(): Int = {
      while (accBits < codeSize) {
        if (dataPos >= data.length) return end // truncated: treat as END
        acc |= (data(dataPos) & 0xff) << accBits
        accBits += 8; dataPos += 1
      }
      val code = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize; accBits -= codeSize
      code
    }
    var running = true
    while (running && outPos < nPixels) {
      val code = next()
      if (code == end) running = false
      else if (code == clear) {
        dictSize = end + 1; codeSize = minCode + 1; prev = -1
      } else {
        // KwKwK: `code` names the entry being defined right now —
        // emit sequence(prev) + first(sequence(prev))
        val kwkwk = code == dictSize
        if (code > dictSize || (kwkwk && prev < 0))
          throw Png.Unsupported(s"LZW code $code out of range")
        var sp = 0
        var cur = if (kwkwk) prev else code
        while (cur >= 0) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        val first = stack(sp - 1) // root suffix = first byte of the sequence
        while (sp > 0) {
          sp -= 1
          if (outPos < nPixels) { out(outPos) = stack(sp); outPos += 1 }
        }
        if (kwkwk && outPos < nPixels) { out(outPos) = first; outPos += 1 }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  /** Undo GIF's 4-pass row interlace. */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var row = start
      while (row < h) {
        System.arraycopy(idx, src * w, out, row * w, w)
        src += 1; row += step
      }
    }
    out
  }

  // ---- test/pack-side encoder ----

  /** REAL greedy-longest-match LZW compression of one frame's index
    * stream (variable code width, LSB-first, CLEAR-on-full) — so
    * decoding a packed payload exercises dictionary growth and the
    * KwKwK case, not just literals. Code-width bumps mirror the
    * decoder exactly: after adding an entry, when the dictionary
    * reaches 2^codeSize.
    */
  private[multimodal] def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0; var accBits = 0; var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code << accBits; accBits += codeSize
      while (accBits >= 8) { bits.write(acc & 0xff); acc >>>= 8; accBits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var dictSize = end + 1
    put(clear)
    if (data.nonEmpty) {
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = Integer.valueOf((w << 8) | k)
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue()
        else {
          put(w)
          dict.put(key, Integer.valueOf(dictSize))
          dictSize += 1
          // one later than the decoder's bump (dictSize == 2^size):
          // the decoder defines each entry one code behind the
          // encoder, so its width change reaches the stream one code
          // later — the classic LZW off-by-one
          if (dictSize == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          if (dictSize == 4096) { // full: reset, decoder follows the CLEAR
            put(clear)
            dict.clear(); dictSize = end + 1; codeSize = minCode + 1
          }
          w = k
        }
        i += 1
      }
      put(w)
    }
    put(end)
    if (accBits > 0) bits.write(acc & 0xff)
    bits.toByteArray
  }

  /** Encode frames of raw bytes (one byte = one gray level) as an
    * animated GIF: 256-entry grayscale global palette, one graphic-
    * control + image descriptor + real LZW stream per frame.
    */
  def encodeGray(width: Int, height: Int, frames: Seq[Array[Byte]], delayCs: Int = 4): Array[Byte] = {
    require(frames.forall(_.length == width * height), "frame size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(US_ASCII))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(width); w16(height)
    out.write(0x80 | 7) // GCT present, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 } // gray GCT
    frames.foreach { f =>
      // graphic control (delay)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); w16(delayCs); out.write(0); out.write(0)
      // image descriptor, full rectangle, no LCT, no interlace
      out.write(0x2c); w16(0); w16(0); w16(width); w16(height); out.write(0)
      out.write(8) // LZW min code size
      val payload = lzwEncode(f, 8)
      var off = 0
      while (off < payload.length) {
        val len = math.min(255, payload.length - off)
        out.write(len); out.write(payload, off, len); off += len
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** First frame as a 3-channel [[Png.Image]] (palette applied) —
    * feeds the shared feature extractor.
    */
  def toImage(f: Frame): Png.Image = {
    val px = new Array[Byte](f.width * f.height * 3)
    var i = 0
    while (i < f.indices.length) {
      val p = 3 * (f.indices(i) & 0xff)
      px(3 * i) = f.palette(p); px(3 * i + 1) = f.palette(p + 1); px(3 * i + 2) = f.palette(p + 2)
      i += 1
    }
    Png.Image(f.width, f.height, 3, px)
  }
}
