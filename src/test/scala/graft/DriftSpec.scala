package graft

import graft.queries.DriftQ
import org.apache.spark.sql.functions._

/** Round-6 wave 6 — changepoint, entropy, quantization. */
class DriftSpec extends GraftSuite {
  import spark.implicits._

  test("ts_changepoint picks the argmax split on a synthetic step series") {
    // Build a step series through the same plan shape driver-side:
    // 10 days at 100 cents then 10 days at 500 — the best split is day 9.
    val row = DriftQ.tsChangepoint(spark, sf0001).collect()(0)
    val n = row.getLong(row.fieldIndex("n_days"))
    assert(n > 1)
    val d = row.getDouble(row.fieldIndex("delta"))
    assert(d >= 0)
    // argmax property: no other split beats the returned delta
    val daily = Tables(spark, sf0001).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      .orderBy($"day")
      .select($"cents").as[Long].collect()
    val total = daily.map(BigInt(_)).sum
    var cum = BigInt(0)
    val deltas = daily.dropRight(1).zipWithIndex.map { case (c, i) =>
      cum += c
      val idx = i + 1
      math.abs(cum.toDouble / idx -
        (total - cum).toDouble / (daily.length - idx))
    }
    assert(math.abs(deltas.max - d) < 1e-9)
  }

  test("corpus_token_entropy is positive and bounded by log2(vocab)") {
    val rows = DriftQ.corpusTokenEntropy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = r.getDouble(r.fieldIndex("entropy_bits"))
      val vocab = r.getLong(r.fieldIndex("vocab"))
      assert(bits > 0.0 && bits <= math.log(vocab.toDouble) / math.log(2.0) + 1e-6)
    }
  }

  test("emb_quantize_int8 stays in [0,255] and hits both extremes per dim") {
    val df = DriftQ.embQuantizeInt8(spark, sf0001)
    assert(df.filter($"q" < 0 || $"q" > 255).count() == 0)
    val perDim = df.groupBy($"dim")
      .agg(min($"q").as("lo"), max($"q").as("hi")).collect()
    assert(perDim.nonEmpty)
    perDim.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 255L)
    }
  }
}
