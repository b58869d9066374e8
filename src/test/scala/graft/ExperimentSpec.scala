package graft

import graft.queries.{ExperimentQ, InfraQ}
import org.apache.spark.sql.functions._

/** Round-7 waves T/U (ExperimentQ, InfraQ). */
class ExperimentSpec extends GraftSuite {
  import spark.implicits._

  test("cuped matches a direct sufficient-statistics recompute") {
    val ev = Tables(spark, sf0001).events
      .select($"user_id", $"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val Array(lo, hi) = ev.agg(min($"day"), max($"day")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val mid = (lo + hi + 1) / 2
    val pu = ev.groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase" && $"day" < mid, $"cents")
          .otherwise(0L)).as("pre"),
        sum(when($"event_type" === "purchase" && $"day" >= mid, $"cents")
          .otherwise(0L)).as("post"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = pu.length.toDouble
    val sx = pu.map(_._2).sum.toDouble; val sy = pu.map(_._3).sum.toDouble
    val sxx = pu.map(u => u._2 * u._2).sum.toDouble
    val syy = pu.map(u => u._3 * u._3).sum.toDouble
    val sxy = pu.map(u => u._2 * u._3).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val rho2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val r = ExperimentQ.qCuped(spark, sf0001).collect().head
    assert(r.getAs[Long]("n") === pu.length.toLong)
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-4)
    assert(math.abs(r.getAs[Double]("var_reduction_pct") - 100 * rho2) < 1e-2)
    assert(r.getAs[Double]("var_reduction_pct") >= 0.0)
    assert(r.getAs[Double]("var_reduction_pct") <= 100.0)
    // adjusted effect = raw effect - theta * covariate imbalance
    val t1 = pu.filter(_._1 % 2 == 1); val t0 = pu.filter(_._1 % 2 == 0)
    val raw = t1.map(_._3).sum.toDouble / t1.length - t0.map(_._3).sum.toDouble / t0.length
    val imb = t1.map(_._2).sum.toDouble / t1.length - t0.map(_._2).sum.toDouble / t0.length
    assert(math.abs(r.getAs[Double]("effect_raw") - raw / 100) < 1e-3)
    assert(math.abs(r.getAs[Double]("effect_cuped") - (raw - theta * imb) / 100) < 1e-3)
  }

  test("msprt p-values are monotone non-increasing and in (0,1]") {
    val rows = ExperimentQ.qMsprt(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Double]("p_always_valid"))
    assert(ps.forall(p => p > 0.0 && p <= 1.0))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-9 })
    rows.foreach { r =>
      assert(r.getAs[Double]("lambda") > 0.0)
      val n0 = r.getAs[Long]("cum_n0"); val n1 = r.getAs[Long]("cum_n1")
      assert(n0 > 0L && n1 > 0L)
    }
    // cumulative trials at the last day cover every click+purchase event
    val total = Tables(spark, sf0001).events
      .filter($"event_type".isin("click", "purchase")).count()
    assert(rows.last.getAs[Long]("cum_n0") + rows.last.getAs[Long]("cum_n1") === total)
  }

  test("theta sketch estimate replays from the 64 smallest hashes") {
    val d = Tables(spark, sf0001).events
      .select($"event_type", $"user_id").distinct()
      .withColumn("hv",
        conv(substring(md5($"user_id".cast("string")), 1, 13), 16, 10).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val rows = InfraQ.qThetaSketch(spark, sf0001).collect()
    rows.foreach { r =>
      val typ = r.getAs[String]("event_type")
      val hashes = d.filter(_._1 == typ).map(_._2).sorted
      val expected =
        if (hashes.length < 64) hashes.length.toLong
        else math.round(63 * 4.503599627370496e15 / hashes(63))
      assert(r.getAs[Long]("n_est") === expected, typ)
      assert(r.getAs[Long]("n_exact") === hashes.length.toLong)
      assert(r.getAs[Double]("rel_err_pct") < 50.0, s"$typ err out of family range")
    }
  }

  test("zone map partitions the table and prunes to the predicate months") {
    val rows = InfraQ.etlZoneMap(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum ===
      Tables(spark, sf0001).lineitem.count())
    val d0 = rows.map(_.getAs[Long]("day_min")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("day_min") <= r.getAs[Long]("day_max"))
      assert(r.getAs[Long]("cents_min") <= r.getAs[Long]("cents_max"))
      val expected = r.getAs[Long]("day_max") >= d0 + 180 &&
        r.getAs[Long]("day_min") < d0 + 360
      assert(r.getAs[Boolean]("would_scan") === expected)
    }
    val frac = rows.count(_.getAs[Boolean]("would_scan")).toDouble / rows.length
    assert(math.abs(rows.head.getAs[Double]("scan_fraction") - frac) < 1e-3)
    assert(frac < 1.0) // pruning must actually skip something
  }

  test("little law conserves total time-in-system across months") {
    val rows = InfraQ.qLittleLaw(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // sum of monthly WIP-days equals sum of per-order durations
    val wipDays = rows.map(r => r.getAs[Double]("l_avg") * 30).sum
    val durSum = rows.map(_.getAs[Long]("arrivals"))
      .zip(rows.map(_.getAs[Double]("w_days"))).map { case (a, w) =>
        if (a == 0) 0.0 else a * w }.sum
    assert(math.abs(wipDays - durSum) < durSum * 1e-3 + 1.0)
    val arrivals = rows.map(_.getAs[Long]("arrivals")).sum
    val span = Tables(spark, sf0001).orders
      .join(Tables(spark, sf0001).lineitem,
        $"o_orderkey" === $"l_orderkey", "left_semi").count()
    assert(arrivals === span)
  }
}
