package graft

import graft.queries.{AuditQ, DedupQ, LexQ, SegmentQ}
import org.apache.spark.sql.functions._

/** Round-6 wave 8 — corpus/engagement health reads. */
class HealthSpec extends GraftSuite {
  import spark.implicits._

  test("q_stickiness is a ratio in (0,1]") {
    val rows = SegmentQ.qStickiness(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(r.fieldIndex("stickiness"))
      assert(s > 0.0 && s <= 1.0)
      assert(r.getLong(r.fieldIndex("mau")) >=
        r.getLong(r.fieldIndex("dau_sum")) / r.getLong(r.fieldIndex("n_days")))
    }
  }

  test("q_purchase_intervals quartiles are ordered") {
    val r = SegmentQ.qPurchaseIntervals(spark, sf0001).collect()(0)
    val (p25, med, p75) = (r.getDouble(r.fieldIndex("p25")),
      r.getDouble(r.fieldIndex("median")), r.getDouble(r.fieldIndex("p75")))
    assert(p25 <= med && med <= p75)
    assert(r.getLong(r.fieldIndex("n_gaps")) > 0)
    assert(p75 <= r.getLong(r.fieldIndex("max_gap")))
  }

  test("corpus_dup_rate reconciles with a direct distinct count") {
    val df = DedupQ.corpusDupRate(spark, sf0001)
    assert(df.filter($"dup_rate" < 0 || $"dup_rate" > 1).count() == 0)
    val total = df.agg(sum($"n_unique")).as[Long].collect()(0)
    val direct = Tables(spark, sf0001).documents
      .select($"source", md5($"text").as("h")).distinct().count()
    assert(total == direct)
  }

  test("etl_encoding_audit counts bound by doc counts") {
    val rows = AuditQ.etlEncodingAudit(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      Seq("n_non_ascii", "n_control", "n_replacement").foreach { c =>
        val v = r.getLong(r.fieldIndex(c))
        assert(v >= 0 && v <= n, s"$c=$v out of [0,$n]")
      }
    }
  }

  test("text_zipf_fit slope is negative with a strong fit") {
    val r = LexQ.textZipfFit(spark, sf0001).collect()(0)
    // sf0.001's synthetic vocabulary is only ~31 tokens — the gate
    // caps at 1000 but takes what exists
    assert(r.getLong(r.fieldIndex("n_terms")) > 10)
    val slope = r.getDouble(r.fieldIndex("zipf_slope"))
    assert(slope < 0.0, s"zipf slope should be negative, got $slope")
    // the synthetic corpus is near-uniform, not Zipfian — r2 just
    // needs to be a valid coefficient; the sign check above is the
    // semantic assertion
    val r2 = r.getDouble(r.fieldIndex("r2"))
    assert(r2 >= 0.0 && r2 <= 1.0)
  }
}
