package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Dependency-free WAV (RIFF/WAVE, PCM16LE mono) parser + writer —
  * the audio leg of the multimodal family next to [[Png]]/[[Bmp]]
  * (images), [[Y4m]] (video) and [[Gif]] (entropy-coded frames).
  *
  * The container is the canonical RIFF chunk walk: `RIFF <size> WAVE`
  * then a sequence of `<fourcc> <size> <payload>` chunks, payloads
  * padded to even offsets. `fmt ` declares PCM (audioFormat 1),
  * channel count, sample rate and bit depth; `data` carries the
  * little-endian samples; any other chunk (`LIST`, `fact`, `cue `…)
  * is skipped by size — the walk is what real decoders do, and what a
  * byte-offset slicer cannot fake (the spec plants decoy chunks ahead
  * of `data`).
  *
  * Scale notes: payloads decode independently per row inside
  * `mapPartitions` batches (BinaryOps) — no shuffle, no driver work.
  * Malformed payloads raise; callers armor (one bad file must never
  * kill a 100 TB batch).
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      new String(bytes, 0, 4, US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, US_ASCII) == "WAVE"

  /** Encode mono PCM16LE. `decoyChunk` plants a LIST chunk (with an
    * odd payload size, exercising the pad rule) BEFORE data, so specs
    * prove the parser walks chunks instead of assuming fixed offsets.
    */
  def encode(sampleRate: Int, samples: Array[Short],
             decoyChunk: Boolean = false): Array[Byte] = {
    val decoy = if (decoyChunk) {
      val payload = "INFOgraft".getBytes(US_ASCII) // 9 bytes: odd, needs a pad
      val b = ByteBuffer.allocate(8 + payload.length + 1).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes(US_ASCII)).putInt(payload.length).put(payload).put(0.toByte)
      b.array()
    } else Array.emptyByteArray
    val dataSize = samples.length * 2
    val riffSize = 4 + (8 + 16) + decoy.length + (8 + dataSize)
    val b = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(US_ASCII)).putInt(riffSize).put("WAVE".getBytes(US_ASCII))
    b.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1.toShort)            // PCM
      .putShort(1.toShort)            // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2.toShort)            // block align
      .putShort(16.toShort)           // bits per sample
    b.put(decoy)
    b.put("data".getBytes(US_ASCII)).putInt(dataSize)
    samples.foreach(s => b.putShort(s))
    b.array()
  }

  /** Parse a WAV payload: full chunk walk, strict on structure
    * (magic, a PCM16 mono `fmt ` before `data`, sizes in bounds) —
    * the caller decides whether to armor.
    */
  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a RIFF/WAVE payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(12)
    var sampleRate = -1
    var ok = false
    while (b.remaining() >= 8) {
      val fourcc = { val a = new Array[Byte](4); b.get(a); new String(a, US_ASCII) }
      val size = b.getInt
      require(size >= 0 && size <= b.remaining(), s"chunk $fourcc overruns the payload")
      fourcc match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val start = b.position()
          val audioFormat = b.getShort
          val channels = b.getShort
          sampleRate = b.getInt
          b.getInt; b.getShort // byte rate, block align
          val bits = b.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          require(channels == 1, s"not mono ($channels channels)")
          require(bits == 16, s"not 16-bit ($bits)")
          b.position(start + size + (size & 1))
          ok = true
        case "data" =>
          require(ok, "data chunk before fmt")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = b.getShort; i += 1 }
          return Audio(sampleRate, out)
        case _ => // LIST/fact/cue/...: skip payload + pad byte
          b.position(b.position() + size + (size & 1))
      }
    }
    throw new IllegalArgumentException("no data chunk")
  }
}
