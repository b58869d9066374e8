package graft

import graft.multimodal.{BinaryOps, Bmp, Tar}
import org.apache.spark.sql.functions.{length, octet_length}

class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  test("pack produces binary payload + typed metadata") {
    val packed = BinaryOps.pack(Tables(spark, sf0001).documents)
    val f = packed.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(packed.schema("meta").dataType.typeName == "struct")
    val r = packed.select($"payload", $"meta.media_type").limit(1).collect().head
    assert(r.getAs[Array[Byte]](0).nonEmpty && r.getString(1) == "text/plain")
  }

  test("featurize is deterministic, batched, and preserves row count") {
    val packed = BinaryOps.pack(Tables(spark, sf0001).documents)
    val a = BinaryOps.featurize(packed, batchSize = 7).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val b = BinaryOps.featurize(packed, batchSize = 64).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b, "batch size must not change results")
    assert(a.size == 500)
    a.values.foreach(f => assert(f.length == 8 && f.forall(x => x >= 0 && x <= 1)))
  }

  test("frameSample keeps every stride-th fixed-size byte window") {
    val packed = Seq((1L, "a" * 100)).toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val r = BinaryOps.frameSample(packed, frameBytes = 32, stride = 2).collect().head
    assert(r.n_frames == 4)             // 32+32+32+4
    assert(r.sampled.length == 2)       // frames 0 and 2
    assert(r.sampled(0).length == 32)
  }

  test("resizeStub is deterministic and hits the target size") {
    val out = BinaryOps.resizeStub("hello world".getBytes, 4)
    assert(out.length == 4)
    assert(out.toSeq == BinaryOps.resizeStub("hello world".getBytes, 4).toSeq)
    assert(BinaryOps.resizeStub(Array.emptyByteArray, 4).length == 4)
  }

  test("rollingHash matches the Rabin-Karp fold") {
    import graft.functions.TextFns
    val got = Seq("ab").toDF("t").select(TextFns.rollingHash($"t")).as[Long].head()
    assert(got == 97L * 257 + 98)       // 25027
  }

  test("fakeDecode stub is content-addressed (same bytes -> same features)") {
    val x = BinaryOps.fakeDecode("abc".getBytes)
    assert(x.toSeq == BinaryOps.fakeDecode("abc".getBytes).toSeq)
    assert(x.toSeq != BinaryOps.fakeDecode("abd".getBytes).toSeq)
  }

  // ------------------------------------------------------------- real PNG

  import graft.multimodal.Png

  /** Deterministic RGB gradient: every channel value exercised. */
  private def gradient(w: Int, h: Int, ch: Int): Png.Image =
    Png.Image(w, h, ch,
      Array.tabulate(w * h * ch)(i => ((i * 7 + i / 3) % 256).toByte))

  test("PNG round-trips through every scanline filter and color type") {
    for (ch <- Seq(1, 2, 3, 4)) {
      val img = gradient(13, 11, ch) // odd sizes: no alignment luck
      // cycle filters 0..4 across rows so Sub/Up/Average/Paeth all run
      val back = Png.decode(Png.encode(img, filterOf = y => y % 5))
      assert(back.width == 13 && back.height == 11 && back.channels == ch)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"pixel mismatch at $ch channels")
    }
  }

  test("palette PNG expands through PLTE to RGB") {
    // hand-build a 2x2 color-type-3 image: indices 0..3 into a 4-color palette
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val rgb = Png.decode(palettePng(2, 2, Array[Byte](0, 1, 2, 3), pal))
    assert(rgb.channels == 3)
    assert(rgb.pixels.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
  }

  private def palettePng(w: Int, h: Int, idx: Array[Byte], pal: Array[Byte]): Array[Byte] = {
    // encode as greyscale (same 1-byte-per-pixel layout), then rewrite
    // IHDR's color type to 3 and splice a PLTE chunk before IDAT
    val grey = Png.encode(Png.Image(w, h, 1, idx))
    val out = new java.io.ByteArrayOutputStream()
    out.write(grey, 0, 8 + 8 + 13 + 4) // signature + IHDR chunk
    val bytes = out.toByteArray
    bytes(8 + 8 + 9) = 3 // IHDR color type offset
    // recompute IHDR CRC
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 8 + 4, 4 + 13)
    val c = crc.getValue.toInt
    for (i <- 0 until 4) bytes(8 + 8 + 13 + i) = (c >>> (24 - 8 * i)).toByte
    val res = new java.io.ByteArrayOutputStream()
    res.write(bytes)
    // PLTE chunk
    val len = pal.length
    res.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
    val t = "PLTE".getBytes("US-ASCII")
    res.write(t); res.write(pal)
    val pc = new java.util.zip.CRC32(); pc.update(t); pc.update(pal)
    val pcv = pc.getValue.toInt
    res.write(Array[Byte]((pcv >>> 24).toByte, (pcv >>> 16).toByte, (pcv >>> 8).toByte, pcv.toByte))
    // rest of the greyscale stream (IDAT + IEND)
    res.write(grey, 8 + 8 + 13 + 4, grey.length - (8 + 8 + 13 + 4))
    res.toByteArray
  }

  test("featurize computes REAL pixel stats for PNG payloads, stub for the rest") {
    // 4x1 greyscale with known values -> known mean/std/min/max/gradient
    val img = Png.Image(4, 1, 1, Array[Byte](0, 100.toByte, 200.toByte, 0))
    val png = Png.encode(img)
    val packed = Seq((1L, png), (2L, "not an image".getBytes)).toDF("doc_id", "payload")
    val f = BinaryOps.featurize(packed).collect().map(m => m.doc_id -> m.features).toMap
    val real = f(1L)
    assert(real(0) == 4.0 && real(1) == 1.0 && real(2) == 1.0)
    assert(math.abs(real(3) - 75.0 / 255.0) < 1e-12)            // mean
    assert(math.abs(real(5) - 0.0) < 1e-12 && math.abs(real(6) - 200.0 / 255.0) < 1e-12)
    assert(math.abs(real(7) - (100 + 100 + 200) / 3.0 / 255.0) < 1e-12) // mean |dx|
    // non-PNG payload: md5 stub, all dims in [0,1]
    assert(f(2L).toSeq == BinaryOps.fakeDecode("not an image".getBytes).toSeq)
  }

  // ------------------------------------------------------------- real Y4M

  import graft.multimodal.Y4m

  test("Y4M round-trips C420 luma planes through encode/decode") {
    val f0 = Array.tabulate(64)(i => i.toByte)
    val f1 = Array.tabulate(64)(i => (255 - i).toByte)
    val v = Y4m.decode(Y4m.encodeC420(8, 8, Seq(f0, f1)))
    assert(v.width == 8 && v.height == 8 && v.colorspace == "420")
    assert(v.frames.length == 2)
    assert(v.frames(0).y.toSeq == f0.toSeq && v.frames(1).y.toSeq == f1.toSeq)
    assert(v.frames(0).u.length == 16 && v.frames(0).u.forall(_ == 128.toByte))
    assert(math.abs(v.frames(0).meanLuma - (0 until 64).sum / 64.0) < 1e-12)
  }

  test("Y4M parses colorspace variants, frame params, and odd dimensions") {
    import java.nio.charset.StandardCharsets.US_ASCII
    def stream(cs: String, w: Int, h: Int, cw: Int, ch: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F30000:1001 It A0:0 C$cs XYSCSS=$cs\n".getBytes(US_ASCII))
      out.write("FRAME Ix\n".getBytes(US_ASCII))   // frame-level params are legal
      out.write(Array.fill[Byte](w * h)(7))
      out.write(Array.fill[Byte](2 * cw * ch)(9))
      out.toByteArray
    }
    for ((cs, cw, ch) <- Seq(("420jpeg", 3, 2), ("422", 3, 3), ("444", 5, 3), ("mono", 0, 0))) {
      val v = Y4m.decode(stream(cs, 5, 3, cw, ch))
      assert(v.frames.length == 1, cs)
      assert(v.frames(0).y.length == 15 && v.frames(0).u.length == cw * ch, cs)
    }
  }

  test("Y4M rejects malformed streams; videoFrameSample armors them") {
    val good = Y4m.encodeC420(8, 8, Seq(Array.fill[Byte](64)(50)))
    assert(Y4m.isY4m(good) && !Y4m.isY4m("YUV4MPEG-not".getBytes))
    intercept[IllegalArgumentException](Y4m.decode(good.take(good.length - 5))) // truncated plane
    intercept[IllegalArgumentException](Y4m.decode("YUV4MPEG2 W8 H8\nGARBAGE".getBytes))
    intercept[IllegalArgumentException](Y4m.decode("YUV4MPEG2 W8 C420\nFRAME\n".getBytes)) // no H
    val packed = Seq((1L, good), (2L, good.take(good.length - 5))).toDF("doc_id", "payload")
    val r = BinaryOps.videoFrameSample(packed, stride = 1).collect()
      .map(s => s.doc_id -> s).toMap
    assert(r(1L).n_frames == 1 && r(1L).mean_luma == 50.0)
    assert(r(2L).n_frames == 0 && r(2L).mean_luma == -1.0, "corrupt payload must degrade, not throw")
  }

  test("documents stay pure ASCII at every SF (mm_frame_sample oracle precondition)") {
    // the gate's DuckDB oracle does CHARACTER-based substr/ascii math;
    // it equals the engine's UTF-8 BYTE framing only while the corpus
    // is ASCII — pin that here so a generator change fails loudly
    for (dir <- Seq(sf0001, sf001)) {
      val nonAscii = Tables(spark, dir).documents
        .filter(length($"text") =!= octet_length($"text")).count()
      assert(nonAscii == 0, s"$dir: $nonAscii non-ASCII docs break the frame-sample oracle")
    }
  }

  test("videoFrameSample rejects a non-positive stride instead of marking rows corrupt") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      BinaryOps.videoFrameSample(BinaryOps.packY4m(docs), stride = 0))
  }

  test("packY4m + videoFrameSample computes stride-sampled mean luma over content bytes") {
    // 100 'a' bytes -> 2 frames (64 + 36-padded); stride 2 keeps frame 0 only
    val docs = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    val s = BinaryOps.videoFrameSample(BinaryOps.packY4m(docs), stride = 2).collect().head
    assert(s.n_frames == 2 && s.n_sampled == 1)
    assert(math.abs(s.mean_luma - 97.0) < 1e-12) // frame 0 is all 'a'
    val all = BinaryOps.videoFrameSample(BinaryOps.packY4m(docs), stride = 1).collect().head
    assert(all.n_sampled == 2)
    assert(math.abs(all.mean_luma - (97.0 + 97.0 * 36 / 64) / 2) < 1e-12) // padded tail
  }

  test("BMP round-trips 24bpp with padding, top-down, and 32bpp variants") {
    // 3x2 RGB with a non-multiple-of-4 row (3*3=9 bytes -> 12 padded)
    val rgb = Array[Byte](
      10, 20, 30,  40, 50, 60,  70, 80, 90,
      -1, 0, 1,    100, 101, 102, 5, 6, 7)
    val img = Bmp.decode(Bmp.encode24(3, 2, rgb))
    assert(img.width == 3 && img.height == 2 && img.channels == 3)
    assert(img.pixels.toSeq == rgb.toSeq)
    // top-down variant: negate height in the encoded header and
    // reverse the stored row order -> same decoded pixels
    val enc = Bmp.encode24(3, 2, rgb)
    val td = enc.clone()
    val h = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    h.putInt(22, -2)
    val row0 = td.slice(54, 54 + 12); val row1 = td.slice(66, 66 + 12)
    System.arraycopy(row1, 0, td, 54, 12); System.arraycopy(row0, 0, td, 66, 12)
    assert(Bmp.decode(td).pixels.toSeq == rgb.toSeq)
  }

  test("featurize computes REAL pixel stats for BMP payloads; bad BMPs degrade") {
    val flat = Array.fill[Byte](4 * 4 * 3)(100)
    val bmp = Bmp.encode24(4, 4, flat)
    val f = BinaryOps.decodeFeatures(bmp)
    // flat gray 100: f = [width, height, channels?]-shaped like Png.features
    assert(f.toSeq != BinaryOps.fakeDecode(bmp).toSeq, "BMP must not hit the stub")
    val viaPng = Png.features(Bmp.decode(bmp))
    assert(f.toSeq == viaPng.toSeq)
    // RLE-compressed claim -> Unsupported -> stub, batch survives
    val rle = bmp.clone()
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(30, 1)
    assert(intercept[Png.Unsupported](Bmp.decode(rle)).getMessage.contains("compressed"))
    assert(BinaryOps.decodeFeatures(rle).toSeq == BinaryOps.fakeDecode(rle).toSeq)
    // truncated pixel data -> stub
    assert(BinaryOps.decodeFeatures(bmp.take(60)).toSeq ==
      BinaryOps.fakeDecode(bmp.take(60)).toSeq)
  }

  test("out-of-scope PNGs degrade to the stub instead of failing the batch") {
    val img = gradient(4, 4, 1)
    val png = Png.encode(img)
    // corrupt: claim 16-bit depth (offset 8+8+8 = bit depth field)
    val deep = png.clone(); deep(8 + 8 + 8) = 16
    assert(intercept[Png.Unsupported](Png.decode(deep)).getMessage.contains("bit depth"))
    assert(BinaryOps.decodeFeatures(deep).toSeq ==
      BinaryOps.fakeDecode(deep).toSeq, "fallback must be the stub")
    // truncated IDAT
    val cut = png.take(png.length - 20)
    assert(BinaryOps.decodeFeatures(cut).length == 8)
  }

  // ---- GIF (LZW) ----

  test("GIF LZW round-trips literal, dictionary-match and KwKwK inputs") {
    import graft.multimodal.Gif
    val cases = Seq(
      Array.tabulate(64)(i => i.toByte),                   // all-distinct pairs: literals
      Array.fill(64)(7.toByte),                            // aaaa…: immediate KwKwK chain
      Array.tabulate(64)(i => (i % 3).toByte),             // short cycle: dictionary matches
      ("the quick brown fox " * 4).getBytes.take(64))      // text-like
    cases.foreach { px =>
      val gif = Gif.encodeGray(8, 8, Seq(px))
      val a = Gif.decode(gif)
      assert(a.width == 8 && a.height == 8 && a.frames.length == 1)
      assert(a.frames(0).indices.toSeq == px.toSeq, "LZW round trip mismatch")
      // grayscale palette: meanRed = mean byte value
      val expected = px.map(_ & 0xff).sum.toDouble / 64
      assert(math.abs(a.frames(0).meanRed - expected) < 1e-9)
    }
  }

  test("GIF LZW survives dictionary growth across width bumps (long input)") {
    import graft.multimodal.Gif
    // one 64x64 frame of structured bytes: enough distinct digrams to
    // push the dictionary through several code-width bumps
    val px = Array.tabulate(4096)(i => ((i * 31 + (i >> 5)) % 251).toByte)
    val a = Gif.decode(Gif.encodeGray(64, 64, Seq(px)))
    assert(a.frames(0).indices.toSeq == px.toSeq)
  }

  test("GIF animation: frames and delays parse in order") {
    import graft.multimodal.Gif
    val frames = (0 until 5).map(f => Array.fill(64)((40 * f).toByte))
    val a = Gif.decode(Gif.encodeGray(8, 8, frames, delayCs = 12))
    assert(a.frames.length == 5)
    a.frames.zipWithIndex.foreach { case (fr, i) =>
      assert(fr.delayCs == 12)
      assert(fr.indices.forall(_ == (40 * i).toByte))
    }
  }

  test("GIF interlaced frames de-interlace to the original rows") {
    import graft.multimodal.Gif
    // rows carry their own index; pre-permute into interlace order and
    // set the interlace flag, decode must restore row order
    val h = 8; val w = 8
    val rows = Array.tabulate(h)(r => Array.fill(w)(r.toByte))
    val interlaceRows =
      (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)
    val permuted = interlaceRows.flatMap(r => rows(r)).toArray
    val gif = Gif.encodeGray(w, h, Seq(permuted))
    // image descriptor: header(13) + GCT(768) + graphic-control(8);
    // indexOf(0x2C) would hit the gray palette byte 44 first
    val idPos = 13 + 768 + 8
    assert(gif(idPos) == 0x2c.toByte)
    gif(idPos + 9) = (gif(idPos + 9) | 0x40).toByte
    val a = Gif.decode(gif)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        assert(a.frames(0).indices(r * w + c) == r.toByte,
          s"row $r col $c after de-interlace")
      }
    }
  }

  test("corrupt GIFs degrade instead of failing the batch") {
    import graft.multimodal.Gif
    val good = Gif.encodeGray(8, 8, Seq(Array.fill(64)(9.toByte)))
    // truncated mid-stream
    assert(BinaryOps.decodeFeatures(good.take(good.length / 2)).length == 8)
    // bad magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(BinaryOps.decodeFeatures(bad).length == 8)
    // featurize on a VALID gif produces real pixel stats (f0 = width >= 1)
    val feats = BinaryOps.decodeFeatures(good)
    assert(feats(0) >= 1.0, "real GIF decode should report width in f0")
    // direct decode of garbage raises Unsupported (callers armor)
    intercept[graft.multimodal.Png.Unsupported] {
      Gif.decode("GIF89a___definitely_not_valid".getBytes)
    }
  }

  import graft.multimodal.Wav

  test("WAV round-trips PCM16 through the RIFF chunk walk, decoy included") {
    val samples = Array.tabulate(200)(i => ((i * 331) % 65536 - 32768).toShort)
    for (decoy <- Seq(false, true)) {
      val a = Wav.decode(Wav.encode(8000, samples, decoyChunk = decoy))
      assert(a.sampleRate === 8000)
      assert(a.samples.toSeq === samples.toSeq)
    }
  }

  test("WAV rejects malformed payloads; audioStats armors them") {
    val good = Wav.encode(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](Wav.decode("nope".getBytes))
    // stereo payload: patch the channel count in the fmt chunk
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Wav.decode(stereo))
    // truncated mid-data
    intercept[Exception](Wav.decode(good.take(good.length - 2)))
    val armored = BinaryOps.audioStats(
      BinaryOps.packWav(Seq((1L, "hello")).toDF("doc_id", "text"))
        .unionByName(Seq((2L, "broken".getBytes)).toDF("doc_id", "payload")))
      .collect().sortBy(_.doc_id)
    assert(armored(0).peak_abs >= 0 && armored(1).peak_abs === -1L)
  }

  test("packWav + audioStats computes exact integer energy over content bytes") {
    val text = "abc"
    val out = BinaryOps.audioStats(
      BinaryOps.packWav(Seq((7L, text)).toDF("doc_id", "text"))).collect().head
    val samples = text.getBytes.map(b => ((b & 0xff) - 128) * 256L)
    assert(out.n_samples === 3L)
    assert(out.n_frames === 1L)
    assert(out.peak_abs === samples.map(math.abs).max)
    assert(out.sum_sq === samples.map(s => s * s).sum)
  }

  test("tar round-trips members incl. empty, block-aligned and 100-char names") {
    val members = Seq(
      Tar.Entry("empty.txt", Array.emptyByteArray),
      Tar.Entry("a" * 96 + ".txt", Array.fill[Byte](512)(7)), // exactly one block
      Tar.Entry("plain.txt", "hello tar".getBytes),
      Tar.Entry("big.bin", Array.tabulate[Byte](1300)(i => (i % 251).toByte)))
    val archive = Tar.encode(members)
    assert(archive.length % 512 === 0)
    assert(Tar.isTar(archive))
    val back = Tar.decode(archive)
    assert(back.map(_.name) === members.map(_.name))
    back.zip(members).foreach { case (b, m) => assert(b.data.toSeq === m.data.toSeq) }
    // container arithmetic: 512·(1+⌈len/512⌉) per member + 1024 end marker
    val expect = members.map(m => 512 * (1 + (m.data.length + 511) / 512)).sum + 1024
    assert(archive.length === expect)
  }

  test("tar rejects corrupt headers; tarShardStats armors them") {
    val good = Tar.encode(Seq(Tar.Entry("x.txt", "payload".getBytes)))
    // flip a payload-size digit: checksum no longer matches
    val bad = good.clone(); bad(125) = '7'
    intercept[IllegalArgumentException](Tar.decode(bad))
    // truncation loses the end marker
    intercept[Exception](Tar.decode(good.take(good.length - 1024)))
    intercept[IllegalArgumentException](Tar.decode("not a tar at all".getBytes))
    val armored = BinaryOps.tarShardStats(
      Seq(("good", good), ("bad", bad)).toDF("source", "payload"))
      .collect().sortBy(_.source)
    assert(armored(0).source === "bad" && armored(0).n_members === -1L && !armored(0).headers_ok)
    assert(armored(1).source === "good" && armored(1).n_members === 1L && armored(1).headers_ok)
  }

  test("resizeNN samples floor-index pixels in both directions, any channel count") {
    import graft.multimodal.Png
    // 4x2 two-channel image with distinct values per (pixel, channel)
    val img = Png.Image(4, 2, 2, Array.tabulate[Byte](16)(i => (i * 3).toByte))
    val down = BinaryOps.resizeNN(img, 2, 1)
    assert(down.width === 2 && down.height === 1 && down.channels === 2)
    // (0,0)->src(0,0) ; (1,0)->src(2,0)
    assert(down.pixels.toSeq === Seq[Byte](0, 3, 12, 15))
    val up = BinaryOps.resizeNN(img, 8, 4)
    assert(up.width === 8 && up.height === 4)
    // upscale duplicates: out(x2,y2) = src(x2/2, y2/2)
    for (y2 <- 0 until 4; x2 <- 0 until 8; c <- 0 until 2)
      assert(up.pixels((y2 * 8 + x2) * 2 + c) ===
        img.pixels(((y2 / 2) * 4 + x2 / 2) * 2 + c))
  }

  test("imageResize decodes real BMPs and armors malformed payloads") {
    val good = BinaryOps.packBmp(Seq((1L, "abcd")).toDF("doc_id", "text"))
    val bad = Seq((2L, "not a bmp".getBytes)).toDF("doc_id", "payload")
    val out = BinaryOps.imageResize(good.unionByName(bad), 4, 4)
      .collect().sortBy(_.doc_id)
    assert(out(0).src_w === 8 && out(0).dst_w === 4 && out(0).n_px === 16L)
    // sampled positions are 16*y2 + 2*x2; only position 0 ('a') and 2 ('c')
    // fall inside the 4-byte text, rest are zero padding
    assert(out(0).sum_resized === ('a' + 'c').toLong)
    assert(out(1).src_w === -1 && out(1).n_px === 0L)
  }

  test("JPEG: constant-block images round-trip to the closed-form DC reconstruction") {
    // one block per byte value class incl. the clamp-at-255 corner
    val vals = Array(0, 1, 64, 127, 128, 200, 254, 255, 32, 90, 17, 250, 5, 99, 180, 66)
    val side = 32
    val pix = new Array[Byte](side * side)
    for (y <- 0 until side; x <- 0 until side)
      pix(y * side + x) = vals((y / 8) * 4 + (x / 8)).toByte
    val enc = graft.multimodal.Jpeg.encodeGray(graft.multimodal.Jpeg.Gray(side, side, pix))
    val dec = graft.multimodal.Jpeg.decode(enc)
    assert(dec.width === side && dec.height === side)
    val b = graft.multimodal.Jpeg.InvSqrt2
    def closedForm(v: Int): Int = {
      val s00 = ((0.25 * b) * b) * (64.0 * (v - 128))
      val sq = graft.multimodal.Jpeg.rnd(s00 / 16.0)
      val rec = 128 + graft.multimodal.Jpeg.rnd(0.25 * (((sq * 16.0) * b) * b))
      math.max(0, math.min(255, rec.toInt))
    }
    for (by <- 0 until 4; bx <- 0 until 4) {
      val got = dec.pixels((by * 8) * side + bx * 8) & 0xff
      assert(got === closedForm(vals(by * 4 + bx)),
        s"block ($bx,$by) v=${vals(by * 4 + bx)}")
      // constant blocks stay constant through the DC-only chain
      for (y <- 0 until 8; x <- 0 until 8)
        assert((dec.pixels((by * 8 + y) * side + bx * 8 + x) & 0xff) === got)
    }
  }

  test("JPEG: general gradient survives our encode→decode within quantization error") {
    val (w, h) = (24, 16)
    val pix = Array.tabulate(w * h)(i => ((i % w) * 10 + (i / w) * 3).toByte)
    val enc = graft.multimodal.Jpeg.encodeGray(graft.multimodal.Jpeg.Gray(w, h, pix), q = 16)
    val dec = graft.multimodal.Jpeg.decode(enc)
    assert(dec.width === w && dec.height === h)
    val maxErr = pix.indices.map(i => math.abs((pix(i) & 0xff) - (dec.pixels(i) & 0xff))).max
    // uniform q=16 bounds per-coefficient error by 8; a smooth ramp
    // reconstructs much closer than the worst case
    assert(maxErr <= 16, s"max reconstruction error $maxErr")
  }

  test("JPEG: decodes the JDK ImageIO encoder's baseline grayscale output") {
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 5) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "ImageIO refused to encode")
    val bytes = bos.toByteArray
    val ours = graft.multimodal.Jpeg.decode(bytes)
    assert(ours.width === w && ours.height === h)
    // reference decode: ImageIO reading its own bytes; decoder IDCTs
    // legitimately differ by a little — pin close agreement, not bits
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val diffs = for (y <- 0 until h; x <- 0 until w) yield
      math.abs(ref.getRaster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xff))
    assert(diffs.max <= 2, s"max decoder disagreement ${diffs.max}")
  }

  test("0xFF fill bytes before a marker are spec-legal padding, not a parse error") {
    val pix = Array.tabulate(64)(i => ((i * 31) % 256).toByte)
    val clean = graft.multimodal.Jpeg.encodeGray(graft.multimodal.Jpeg.Gray(8, 8, pix))
    // insert two fill 0xFF bytes before the DQT marker (FF DB): a padded
    // third-party encoder output must decode identically (ITU T.81 B.1.1.2)
    val at = clean.indices.find(i => (clean(i) & 0xff) == 0xff &&
      i + 1 < clean.length && (clean(i + 1) & 0xff) == 0xdb).get
    val padded = clean.take(at) ++ Array(0xff.toByte, 0xff.toByte) ++ clean.drop(at)
    val a = graft.multimodal.Jpeg.decode(clean)
    val b = graft.multimodal.Jpeg.decode(padded)
    assert(b.width === a.width && b.height === a.height)
    assert(b.pixels.toSeq === a.pixels.toSeq)
  }

  test("corrupt JPEGs degrade instead of failing the batch") {
    val good = graft.multimodal.Jpeg.encodeGray(
      graft.multimodal.Jpeg.Gray(8, 8, Array.fill(64)(100.toByte)))
    val truncated = good.take(good.length / 2)
    val garbage = Array.fill[Byte](50)(0x3c)
    val df = Seq((1L, good), (2L, truncated), (3L, garbage)).toDF("doc_id", "payload")
    val out = BinaryOps.jpegFeatures(df).collect().sortBy(_.doc_id)
    assert(out(0).width === 8 && out(0).sum_rec > 0)
    assert(out(1).width === -1 && out(2).width === -1)
  }

  test("mm_jpeg_features packs first-16-byte constant blocks (padding → byte 0)") {
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val out = BinaryOps.jpegFeatures(BinaryOps.packJpeg(docs)).collect().sortBy(_.doc_id)
    val b = graft.multimodal.Jpeg.InvSqrt2
    def rec(v: Int): Long = {
      val s00 = ((0.25 * b) * b) * (64.0 * (v - 128))
      val sq = graft.multimodal.Jpeg.rnd(s00 / 16.0)
      math.max(0L, math.min(255L, 128 + graft.multimodal.Jpeg.rnd(0.25 * (((sq * 16.0) * b) * b))))
    }
    val expected1 = 64L * ("abcd".map(c => rec(c.toInt)).sum + 12 * rec(0))
    assert(out(0).sum_rec === expected1 && out(0).n_blocks === 16L)
    assert(out(1).sum_rec === 64L * 16 * rec(0))
  }

  test("packTarShards groups by source with id-ordered doc members") {
    val docs = Seq(
      (3L, "cc", "s1"), (1L, "aa", "s1"), (2L, "bb", "s2"))
      .toDF("doc_id", "text", "source")
    val shards = BinaryOps.packTarShards(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val s1 = Tar.decode(shards("s1"))
    assert(s1.map(_.name) === Seq("doc_1.txt", "doc_3.txt"))
    assert(s1.map(e => new String(e.data)) === Seq("aa", "cc"))
    assert(Tar.decode(shards("s2")).map(_.name) === Seq("doc_2.txt"))
  }
}
