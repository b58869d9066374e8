package graft

import org.apache.spark.sql.functions._
import graft.queries.StatsQ

/** Round-6 wave 3 statistical analytics (queries/StatsQ.scala):
  * OLS trend, Welch A/B statistic, k-anonymity, survival curve.
  */
class StatsSpec extends GraftSuite {
  import spark.implicits._

  test("right to forget: counts reconcile and the digest matches the purged table") {
    val r = StatsQ.etlRightToForget(spark, sf001).collect().head
    assert(r.getLong(1) === r.getLong(2) + r.getLong(3)) // before = deleted + after
    // the audit digest equals an independent digest of the purged rows
    val c = Tables(spark, sf001).customer
    val kept = c.filter(!($"c_acctbal" < 0))
    val expected = graft.etl.TableDigest.digest(kept, "customer_after", Seq(
      $"c_custkey", $"c_name", $"c_nationkey",
      round($"c_acctbal" * 100).cast("long"), $"c_mktsegment"))
      .collect().head
    assert(r.getLong(3) === expected.getLong(1))
    assert(r.getLong(4) === expected.getLong(2))
    // and differs from the pre-purge digest (the purge is observable)
    val before = graft.etl.TableDigest.digest(c, "customer", Seq(
      $"c_custkey", $"c_name", $"c_nationkey",
      round($"c_acctbal" * 100).cast("long"), $"c_mktsegment"))
      .collect().head
    assert(r.getLong(4) !== before.getLong(2))
  }

  test("temperature mix flattens the head and lifts the tail, summing to ~1") {
    val rows = StatsQ.corpusTemperatureMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length === 5)
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    assert(head._4 < head._3, "head language should be down-weighted")
    assert(tail._4 > tail._3, "tail language should be up-weighted")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // order preserved: more docs never means lower temperature share
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._4) }
  }

  test("linreg recovers an exact line from a synthetic series") {
    // y = 3x + 7 fitted exactly: slope 3, intercept 7, r2 1
    val fx = (0L to 20L).map(d => ("t", d, 3.0 * d + 7.0)).toDF("event_type", "d", "rev")
    val got = fx.groupBy($"event_type")
      .agg(round(expr("regr_slope(rev, d)"), 4).as("slope"),
        round(expr("regr_intercept(rev, d)"), 4).as("intercept"),
        round(expr("regr_r2(rev, d)"), 4).as("r2"))
      .collect().head
    assert(got.getDouble(1) === 3.0)
    assert(got.getDouble(2) === 7.0)
    assert(got.getDouble(3) === 1.0)
    // and the gate emits one fitted trend per event type
    val gate = StatsQ.qForecastLinreg(spark, sf001).collect()
    assert(gate.length === 5)
    gate.foreach(r => assert(r.getLong(1) >= 28)) // ~full day coverage per type
  }

  test("ab test: identical cohorts give t ~ 0, shifted cohorts move t") {
    val base = (1L to 400L).map(i => (i, (i % 7).toDouble)).toDF("user_id", "value")
    val t0 = base
      .agg(
        sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"user_id" % 2 =!= 0, 1L).otherwise(0L)).as("n_b"),
        round(avg(when($"user_id" % 2 === 0, $"value")), 4).as("mean_a"),
        round(avg(when($"user_id" % 2 =!= 0, $"value")), 4).as("mean_b"),
        round(var_samp(when($"user_id" % 2 === 0, $"value")), 4).as("var_a"),
        round(var_samp(when($"user_id" % 2 =!= 0, $"value")), 4).as("var_b"))
      .select(round(($"mean_a" - $"mean_b") /
        sqrt($"var_a" / $"n_a" + $"var_b" / $"n_b"), 4).as("t"))
      .collect().head.getDouble(0)
    // even/odd of i%7 over a full cycle: near-identical distributions
    assert(math.abs(t0) < 0.6)
    // the gate's statistic is finite and the cohorts are near-balanced
    val gate = StatsQ.qAbTest(spark, sf001).collect().head
    assert(math.abs(gate.getLong(0) - gate.getLong(1)) <
      (gate.getLong(0) + gate.getLong(1)) / 2)
    assert(!gate.getDouble(4).isNaN)
  }

  test("k-anonymity flags exactly the groups under k") {
    val rows = StatsQ.etlKAnonymity(spark, sf001).collect()
    rows.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) < 10)))
    // totals reconcile with the table
    assert(rows.map(_.getLong(2)).sum === Tables(spark, sf001).customer.count())
  }

  test("survival curve is monotonically non-increasing from 1.0") {
    val rows = StatsQ.qSurvivalCurve(spark, sf001).collect()
    assert(rows.length === 6)
    val s = rows.map(_.getDouble(3)).toSeq
    assert(s.head === 1.0) // everyone is active on their signup day
    assert(s === s.sorted.reverse)
    // n_active at each horizon recomputes from per-user day spans
    val e = Tables(spark, sf001).events
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "signup", $"day")).as("s"),
        max($"day").as("l"))
      .filter($"s".isNotNull)
      .select(($"l" - $"s").as("span")).collect().map(_.getLong(0))
    rows.foreach { r =>
      assert(r.getLong(2) === e.count(_ >= r.getLong(0)))
    }
  }
}
