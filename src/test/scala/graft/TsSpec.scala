package graft

import graft.operators.PrefixSum
import graft.queries.TsQ
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 4 — distribution/time-series gates and the PrefixSum
  * bucket-offset prefix-sum operator that keeps their global
  * orderings off the single-partition-window path.
  */
class TsSpec extends GraftSuite {
  import spark.implicits._

  test("PrefixSum.running equals the naive global-ordering window") {
    val df = spark.range(0, 1000)
      .select(((col("id") * 1103515245L + 12345L) % 997L).as("k"),
        (col("id") % 7L + 1L).as("v"))
      .groupBy($"k").agg(sum($"v").as("v"))
    val fast = PrefixSum.running(df, $"k", ($"k" / 100L).cast("long"),
      Seq("v" -> $"v"))
      .select($"k", $"cum_v")
    val naive = df.select($"k",
      sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, 0)).as("cum_v"))
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("PrefixSum window partitions by bucket, not a global ordering") {
    val df = spark.range(0, 100).select($"id".as("k"), lit(1L).as("v"))
    val plan = PrefixSum.running(df, $"k", ($"k" / 10L).cast("long"),
      Seq("v" -> $"v")).queryExecution.executedPlan.toString
    // The data-bearing window must carry a partition spec; the only
    // partition-free window runs over the per-bucket totals.
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("__bucket")), plan.take(2000))
  }

  test("q_gini lies in [0,1) and matches a driver-side recomputation") {
    val row = TsQ.qGini(spark, sf0001).collect()(0)
    val g = row.getDouble(row.fieldIndex("gini"))
    assert(g >= 0.0 && g < 1.0)
    val cents = Tables(spark, sf0001).orders
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"c").as[Long].collect().sorted
    val n = cents.length.toLong
    val sx = cents.map(BigInt(_)).sum
    val six = cents.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expect = (2.0 * six.toDouble - (n + 1.0) * sx.toDouble) /
      (n.toDouble * sx.toDouble)
    assert(math.abs(g - expect) < 1e-6)
  }

  test("q_ks_test D bounds and cohort counts") {
    val row = TsQ.qKsTest(spark, sf0001).collect()(0)
    val d = row.getDouble(row.fieldIndex("d_stat"))
    assert(d >= 0.0 && d <= 1.0)
    assert(row.getLong(row.fieldIndex("n_a")) > 0 &&
      row.getLong(row.fieldIndex("n_b")) > 0)
  }

  test("q_benford covers digits 1-9 and frequencies sum to ~1") {
    val rows = TsQ.qBenford(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val s = rows.map(r => r.getDouble(r.fieldIndex("freq"))).sum
    assert(math.abs(s - 1.0) < 0.01)
  }

  test("ts_acf yields one row per lag with |acf| <= 1") {
    val rows = TsQ.tsAcf(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    assert(rows.forall(r => math.abs(r.getDouble(r.fieldIndex("acf"))) <= 1.0))
  }

  test("ts_zscore_anomaly only emits full 7-day frames") {
    val df = TsQ.tsZscoreAnomaly(spark, sf0001)
    val perType = df.groupBy($"event_type").agg(min($"day").as("first"))
    val firstDays = Tables(spark, sf0001).events
      .groupBy($"event_type")
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("day0"))
    val joined = perType.join(firstDays, "event_type")
      .select(($"first" >= $"day0" + 6).as("ok")).as[Boolean].collect()
    assert(joined.nonEmpty && joined.forall(identity))
  }
}
