package graft

import graft.operators.PrefixSum
import graft.queries.{AuditQ, SegmentQ}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 10 — cohort LTV and the watermark-lateness audit
  * (PrefixSum.runningMax).
  */
class WatermarkSpec extends GraftSuite {
  import spark.implicits._

  test("PrefixSum.runningMax equals the naive global running max") {
    val df = spark.range(0, 2000)
      .select($"id".as("k"),
        (($"id" * 48271L) % 997L).as("v"))
    val fast = PrefixSum.runningMax(df, $"k", ($"k" / 100L).cast("long"),
      "v", $"v").select($"k", $"runmax_v")
    val naive = df.select($"k",
      max($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, 0)).as("runmax_v"))
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("etl_watermark_audit counts cover the stream and lateness is bounded") {
    val rows = AuditQ.etlWatermarkAudit(spark, sf0001).collect()
    // the jitter displaces by <= 1000 arrival slots, so some lateness
    // exists but the histogram must reconcile to the event count
    assert(rows.map(_.getLong(rows(0).fieldIndex("n"))).sum ==
      Tables(spark, sf0001).events.count())
    assert(rows.length >= 2, "jitter should produce late arrivals")
    rows.foreach(r => assert(r.getLong(r.fieldIndex("max_late_s")) >= 0))
  }

  test("q_cohort_ltv is monotone in offset per cohort") {
    val rows = SegmentQ.qCohortLtv(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ltvs = rs.sortBy(_.getLong(1)).map(r => r.getDouble(r.fieldIndex("ltv")))
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => a <= b })
    }
    // per-offset cents reconcile to total purchase revenue
    val total = rows.map(r => r.getLong(r.fieldIndex("cents"))).sum
    val direct = Tables(spark, sf0001).events
      .filter($"event_type" === "purchase")
      .agg(sum(round($"value" * 100).cast("long"))).as[Long].collect()(0)
    assert(total == direct)
  }
}
