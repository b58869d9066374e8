package graft

import graft.multimodal.BinaryOps

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
}
