package graft

import graft.queries.RigorQ
import org.apache.spark.sql.functions._

/** Round-7 wave W (queries/RigorQ.scala): Jarque–Bera, McNemar,
  * DP histogram.
  */
class RigorSpec extends GraftSuite {
  import spark.implicits._

  test("jarque_bera: moments recompute driver-side with BigInt") {
    val rows = RigorQ.qJarqueBera(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val raw = Tables(spark, sf0001).orders
      .select($"o_orderpriority",
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").as("d"))
      .as[(String, Long)].collect()
    rows.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      val xs = raw.filter(_._1 == p).map(_._2)
      assert(r.getAs[Long]("n") === xs.length)
      val mu = xs.sum / xs.length
      assert(r.getAs[Long]("mu_dollars") === mu)
      val m2 = xs.map(x => BigInt(x - mu).pow(2)).sum
      val m3 = xs.map(x => BigInt(x - mu).pow(3)).sum
      val m4 = xs.map(x => BigInt(x - mu).pow(4)).sum
      val n = xs.length.toDouble
      val sk = math.sqrt(n) * m3.toDouble / (m2.toDouble * math.sqrt(m2.toDouble))
      val ku = n * m4.toDouble / (m2.toDouble * m2.toDouble) - 3.0
      assert(math.abs(r.getAs[Double]("skewness") - sk) < 1e-5, p)
      assert(math.abs(r.getAs[Double]("ex_kurtosis") - ku) < 1e-5, p)
      val jb = n * (sk * sk / 6.0 + ku * ku / 24.0)
      assert(math.abs(r.getAs[Double]("jb") - jb) < 1e-3, p)
      assert(r.getAs[Boolean]("normal_rejected") === (r.getAs[Double]("jb") > 5.9915))
    }
  }

  test("mcnemar: off-diagonal cells reconcile with the kappa contingency") {
    val r = RigorQ.qMcnemar(spark, sf001).collect().head
    val n = r.getAs[Long]("n"); val b = r.getAs[Long]("b"); val c = r.getAs[Long]("c")
    assert(n === Tables(spark, sf001).documents.count())
    assert(b + c <= n && b >= 0 && c >= 0)
    if (b + c > 0) {
      val stat = math.pow(math.abs(b - c) - 1.0, 2) / (b + c)
      assert(math.abs(r.getAs[Double]("mcnemar_chi2") - stat) < 1e-5)
    }
  }

  test("dp histogram: released = true + rounded noise; determinism across runs") {
    val a = RigorQ.qDpHistogram(spark, sf0001).collect()
    val bRun = RigorQ.qDpHistogram(spark, sf0001).collect()
    assert(a.map(_.toSeq.toList).toList === bRun.map(_.toSeq.toList).toList)
    val trueCounts = Tables(spark, sf0001).events
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    a.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n") === trueCounts(t))
      val noise = math.round(r.getAs[Long]("lap_e6") / 1e6)
      assert(r.getAs[Long]("released_n") === r.getAs[Long]("n") + noise)
      assert(r.getAs[Long]("abs_err") === math.abs(noise))
    }
    // Laplace(2) noise should not be degenerate-zero for every cell
    assert(a.exists(_.getAs[Long]("lap_e6") != 0L))
  }

  test("mann-kendall: S and the tie-corrected variance recompute driver-side") {
    val r = RigorQ.tsMannKendall(spark, sf0001).collect().head
    val ys = Tables(spark, sf0001).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y")).orderBy($"day").as[(Long, Long)].collect().map(_._2)
    val n = ys.length.toLong
    var s = 0L
    for (i <- ys.indices; j <- i + 1 until ys.length)
      s += java.lang.Long.signum(ys(j) - ys(i))
    val tieTerm = ys.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    assert(r.getAs[Long]("n_days") === n)
    assert(r.getAs[Long]("s_stat") === s)
    assert(r.getAs[Long]("var_num") === n * (n - 1) * (2 * n + 5) - tieTerm)
    val z = r.getAs[Double]("z")
    assert(r.getAs[String]("trend") ===
      (if (z > 1.96) "increasing" else if (z < -1.96) "decreasing" else "none"))
  }

  test("weighted median: half the quantity-weighted mass sits on each side") {
    val rows = RigorQ.qWeightedMedian(spark, sf0001).collect()
    assert(rows.length === 3)
    val li = Tables(spark, sf0001).lineitem
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .as[(String, Long, Long)].collect()
    rows.foreach { r =>
      val flag = r.getAs[String]("flag"); val m = r.getAs[Long]("w_median_cents")
      val grp = li.filter(_._1 == flag)
      val tot = grp.map(_._3).sum
      assert(r.getAs[Long]("total_weight") === tot)
      val below = grp.filter(_._2 < m).map(_._3).sum
      val upTo = grp.filter(_._2 <= m).map(_._3).sum
      assert(2 * below < tot && 2 * upTo >= tot, s"$flag: $below/$upTo/$tot")
    }
  }
}
