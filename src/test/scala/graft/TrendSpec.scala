package graft

import graft.queries.TrendQ
import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Round-7 wave N (queries/TrendQ.scala). */
class TrendSpec extends GraftSuite {
  import spark.implicits._

  test("PSI: shares sum to 1 per period, total is the term sum") {
    val rows = TrendQ.qPsiDrift(spark, sf0001).collect()
    assert(rows.length === 5)
    assert(math.abs(rows.map(_.getAs[Double]("p0")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("p1")).sum - 1.0) < 1e-4)
    val total = rows.head.getAs[Double]("psi_total")
    assert(rows.forall(_.getAs[Double]("psi_total") === total))
    assert(math.abs(rows.map(_.getAs[Long]("term_e9")).sum / 1e9 - total) < 1e-5)
    assert(total >= 0.0) // PSI is a divergence: non-negative up to quantization
  }

  test("quality bias: r_pb in [-1,1] and means bracket the pooled mean") {
    val r = TrendQ.corpusQualityBias(spark, sf0001).collect().head
    val rpb = r.getAs[Double]("r_pb")
    assert(rpb >= -1.0 && rpb <= 1.0)
    assert(r.getAs[Long]("n1") > 0L && r.getAs[Long]("n1") < r.getAs[Long]("n"))
    val mEn = r.getAs[Double]("mean_q_en"); val mOther = r.getAs[Double]("mean_q_other")
    assert(mEn > 0.0 && mEn <= 1.0 && mOther > 0.0 && mOther <= 1.0)
    // the sign of the correlation must agree with the mean gap
    assert((rpb >= 0) === (mEn >= mOther))
  }

  test("peak concurrency: bounded by sessions and matches a direct recount") {
    val r = TrendQ.qPeakConcurrency(spark, sf0001).collect().head
    val peak = r.getAs[Long]("peak_concurrent")
    val nSess = r.getAs[Long]("n_sessions")
    assert(peak >= 1L && peak <= nSess)
    // direct recount at the reported instant: sessions whose interval
    // covers peak_at_us (inclusive start, exclusive en = max+1)
    val at = r.getAs[Long]("peak_at_us")
    val sess = Sessionize(Tables(spark, sf0001).events,
        "user_id", "ts", "event_id", 30L * 60 * 1000000)
      .groupBy($"user_id", $"session_num")
      .agg(min(expr("unix_micros(ts)")).as("st"), (max(expr("unix_micros(ts)")) + 1).as("en"))
    val active = sess.filter($"st" <= at && $"en" > at).count()
    assert(active === peak, s"recount at peak instant: $active vs $peak")
  }

  test("entropy profile: 0 <= H <= ln(k) for every column") {
    val rows = TrendQ.etlEntropyProfile(spark, sf0001).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val hMax = r.getAs[Double]("max_entropy_nats")
      assert(h >= 0.0 && h <= hMax + 1e-6, r.getAs[String]("column_name"))
      val norm = r.getAs[Double]("normalized")
      assert(norm >= 0.0 && norm <= 1.0 + 1e-6)
      assert(r.getAs[Long]("n_distinct") >= 1L)
    }
  }

  test("open-orders timeline: conservation — opens minus closes nets to zero") {
    val rows = TrendQ.qOpenOrdersTimeline(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val opened = rows.map(_.getAs[Long]("opened")).sum
    val closed = rows.map(_.getAs[Long]("closed")).sum
    assert(opened === closed) // every order eventually ships
    assert(opened === Tables(spark, sf0001).orders
      .join(Tables(spark, sf0001).lineitem, $"o_orderkey" === $"l_orderkey", "left_semi")
      .count())
    // the running count never goes negative and ends at zero
    val last = rows.maxBy(_.getAs[Long]("day"))
    assert(last.getAs[Long]("open_orders") === 0L)
    assert(rows.forall(_.getAs[Long]("open_orders") >= 0L))
  }
}
