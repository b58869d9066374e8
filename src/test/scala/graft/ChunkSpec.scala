package graft

import org.apache.spark.sql.functions._

class ChunkSpec extends GraftSuite {
  import spark.implicits._

  test("chunking covers long docs with stride-80 windows of 100 tokens") {
    // 250 tokens -> ceil((250-20)/80) = 3 chunks: [1..100],[81..180],[161..250]
    val text = (1 to 250).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextFns.toks($"text").as("t"))
      .withColumn("nc", greatest(lit(1), ceil((size($"t") - lit(20)) / lit(80.0))).cast("int"))
      .select($"doc_id", $"t", explode(expr("sequence(0, nc - 1)")).as("chunk_id"))
      .select($"chunk_id", size(expr("slice(t, chunk_id * 80 + 1, 100)")).as("n"))
    val chunks = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(chunks == Map(0 -> 100, 1 -> 100, 2 -> 90))
  }

  test("split buckets are content-addressed and roughly 80/10/10") {
    val splits = graft.queries.Extra.etlSplit(spark, sf001)
      .groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > 300 && splits("train") < 480)
    // determinism: same ids -> same split every run
    val a = graft.queries.Extra.etlSplit(spark, sf001).collect().map(_.toString).toSeq
    val b = graft.queries.Extra.etlSplit(spark, sf001).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
