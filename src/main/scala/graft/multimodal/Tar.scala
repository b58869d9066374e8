package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

/** Dependency-free POSIX ustar (tar) archive writer + reader — the
  * CONTAINER leg of the multimodal family. Training pipelines ship
  * sample archives exactly like this (the WebDataset layout: one tar
  * shard = a batch of named members, read sequentially); this codec
  * packs documents into honest ustar shards and walks them back.
  *
  * The format is the real one: 512-byte headers (name, octal size,
  * header checksum computed with the checksum field blanked to
  * spaces, `ustar` magic), payloads zero-padded to 512-byte blocks,
  * and an end-of-archive marker of two zero blocks. The reader
  * validates magic and checksum per member — what a byte-offset
  * slicer cannot fake — and octal-parses sizes, so a single corrupt
  * header byte fails loudly.
  *
  * Scale notes: shards decode independently per row inside a map (no
  * shuffle, no driver work); malformed shards raise and the caller
  * armors (one bad shard must never kill a 100 TB batch).
  */
object Tar {

  final case class Entry(name: String, data: Array[Byte])

  private val BLOCK = 512

  /** True when the payload starts with a plausible ustar header
    * (magic at offset 257).
    */
  def isTar(bytes: Array[Byte]): Boolean =
    bytes.length >= BLOCK &&
      new String(bytes, 257, 5, US_ASCII) == "ustar"

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits + NUL — the POSIX numeric-field form
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(US_ASCII)
  }

  private def parseOctal(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = off; val end = off + len; var seen = false
    while (i < end) {
      val c = bytes(i)
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == ' ' || c == 0) { if (seen) i = end }
      else throw new IllegalArgumentException(
        s"non-octal byte ${c.toInt} in numeric field")
      i += 1
    }
    v
  }

  /** Write one ustar header block. */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(US_ASCII)
    require(nameB.length <= 100, s"member name over 100 bytes: $name")
    val h = new Array[Byte](BLOCK)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8)        // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8)          // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8)          // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)     // size
    System.arraycopy(octal(0, 12), 0, h, 136, 12)        // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)       // chksum blank
    h(156) = '0'                                          // typeflag: regular
    System.arraycopy("ustar\u000000".getBytes(US_ASCII), 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += h(i) & 0xff; i += 1 }
    // stored form: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy((padded + "\u0000 ").getBytes(US_ASCII), 0, h, 148, 8)
    h
  }

  /** Encode members into one ustar archive (payloads padded to
    * 512-byte blocks, two zero blocks at the end).
    */
  def encode(members: Seq[Entry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      out.write(header(m.name, m.data.length.toLong))
      out.write(m.data)
      val pad = (BLOCK - m.data.length % BLOCK) % BLOCK
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BLOCK))
    out.toByteArray
  }

  /** Walk the archive: validate magic + checksum per header,
    * octal-parse sizes, slice payloads, stop at the zero block.
    * Strict on structure — the caller decides whether to armor.
    */
  def decode(bytes: Array[Byte]): Seq[Entry] = {
    require(bytes.length % BLOCK == 0,
      s"archive length ${bytes.length} not block-aligned")
    val out = Seq.newBuilder[Entry]
    var off = 0
    while (off + BLOCK <= bytes.length) {
      if (bytes.view.slice(off, off + BLOCK).forall(_ == 0)) return out.result()
      require(new String(bytes, off + 257, 5, US_ASCII) == "ustar",
        s"missing ustar magic at offset $off")
      val stored = parseOctal(bytes, off + 148, 8)
      var sum = 0L
      var i = 0
      while (i < BLOCK) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff)
        i += 1
      }
      require(sum == stored, s"header checksum mismatch at offset $off ($sum != $stored)")
      val nameEnd = {
        var e = off; val lim = off + 100
        while (e < lim && bytes(e) != 0) e += 1
        e
      }
      val name = new String(bytes, off, nameEnd - off, US_ASCII)
      val size = parseOctal(bytes, off + 124, 12)
      val dataOff = off + BLOCK
      require(size >= 0 && dataOff + size <= bytes.length,
        s"member $name overruns the archive")
      out += Entry(name, java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt))
      off = dataOff + ((size + BLOCK - 1) / BLOCK).toInt * BLOCK
    }
    throw new IllegalArgumentException("archive ended without a zero end block")
  }
}
