package graft

import graft.queries.{SegmentQ, StatsQ, TsQ}
import org.apache.spark.sql.functions._

/** Round-6 wave 9 — anonymization enforcement, Lorenz curve,
  * growth accounting.
  */
class GrowthSpec extends GraftSuite {
  import spark.implicits._

  test("etl_k_anonymize: no surviving non-ALL group below k, counts preserved") {
    val df = StatsQ.etlKAnonymize(spark, sf001)
    // the generalization must not lose or invent customers
    val total = df.agg(sum($"n")).as[Long].collect()(0)
    assert(total == Tables(spark, sf001).customer.count())
    // every surviving named-segment group is >= k; only ALL may stay
    // small (a nation can have fewer than k at-risk customers total)
    val bad = df.filter($"segment_out" =!= "ALL" && $"n" < 10).count()
    assert(bad == 0)
  }

  test("q_lorenz_curve is monotone, convex-ish, and ends at share 1") {
    val rows = TsQ.qLorenzCurve(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val shares = rows.map(r => r.getDouble(r.fieldIndex("cum_share")))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-12)
    // bottom decile holds less than a tenth on a long-tailed spend
    assert(shares.head < 0.1)
  }

  test("q_new_returning: first month is all new, totals reconcile with stickiness MAU") {
    val rows = SegmentQ.qNewReturning(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(first.fieldIndex("n_returning")) == 0L)
    val mau = SegmentQ.qStickiness(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("mau"))).toMap
    rows.foreach { r =>
      val m = r.getLong(0)
      assert(r.getLong(r.fieldIndex("n_new")) +
        r.getLong(r.fieldIndex("n_returning")) == mau(m))
    }
  }
}
