package graft

import org.apache.spark.sql.functions._
import graft.queries.SegmentQ

/** Round-6 wave 4 segmentation analytics (queries/SegmentQ.scala). */
class SegmentSpec extends GraftSuite {
  import spark.implicits._

  test("decile bins hold ~10% of each type and partition every event") {
    val rows = SegmentQ.qDecileBins(spark, sf001).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length === 10, s"$t has ${rs.length} bins")
      val total = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        // deciles: each bin within ±30% of total/10 (ties distort a little)
        assert(math.abs(r.getLong(2) - total / 10.0) < total * 0.03 + 5,
          s"$t bin ${r.getLong(1)} holds ${r.getLong(2)} of $total")
      }
    }
    val n = rows.map(_.getLong(2)).sum
    assert(n === Tables(spark, sf001).events.count())
  }

  test("weekday seasonality shares sum to 1 over exactly 7 days") {
    val rows = SegmentQ.qWeekdaySeasonality(spark, sf001).collect()
    assert(rows.length === 7)
    assert(rows.map(_.getLong(0)).toSet === (0L to 6L).toSet)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // cents reconcile with a direct recomputation
    val direct = Tables(spark, sf001).events
      .filter($"event_type" === "purchase")
      .agg(sum(round($"value" * 100).cast("long"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === direct)
  }

  test("chi2: near-uniform cohorts give a small statistic, skewed cells a large one") {
    val gate = SegmentQ.qCrosstabChi2(spark, sf001).collect().head
    assert(gate.getLong(2) === 4L) // 5 event types -> dof 4
    assert(gate.getDouble(3) >= 0.0)
    // independent fixture: type and cohort uncorrelated -> chi2 ~ 0;
    // perfectly dependent fixture -> chi2 = n
    def chi2Of(rows: Seq[(String, Boolean)]): Double = {
      val observed = rows.toDF("event_type", "cohort_a")
        .groupBy($"event_type", $"cohort_a").agg(count(lit(1)).as("o"))
      // same empty-cell fill as the operator: zero cells carry evidence
      val cells = observed.select($"event_type").distinct()
        .crossJoin(observed.select($"cohort_a").distinct())
        .join(observed, Seq("event_type", "cohort_a"), "left")
        .withColumn("o", coalesce($"o", lit(0L)))
      import org.apache.spark.sql.expressions.Window
      val m = cells
        .withColumn("row_n", sum($"o").over(Window.partitionBy($"event_type")))
        .withColumn("col_n", sum($"o").over(Window.partitionBy($"cohort_a")))
        .crossJoin(cells.agg(sum($"o").as("total")))
        .withColumn("e", $"row_n" * $"col_n" / $"total")
      m.agg(sum(($"o" - $"e") * ($"o" - $"e") / $"e")).collect().head.getDouble(0)
    }
    val indep = for (i <- 0 until 100; t <- Seq("x", "y")) yield (t, i % 2 == 0)
    assert(math.abs(chi2Of(indep)) < 1e-9)
    val dep = (0 until 100).map(i => (if (i % 2 == 0) "x" else "y", i % 2 == 0))
    assert(math.abs(chi2Of(dep) - 100.0) < 1e-9)
  }

  test("trigram counts reconcile with the event stream") {
    val rows = SegmentQ.qSequenceTrigrams(spark, sf001).collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getLong(3)).toSeq
    assert(counts === counts.sorted.reverse)
    // total trigrams over ALL sequences = events - 2 * users(with >= 3 events);
    // check one specific cell against a direct recomputation
    val e = Tables(spark, sf001).events
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val direct = e.select($"user_id", $"event_id", $"event_type".as("e3"))
      .withColumn("e2", lag($"e3", 1).over(w))
      .withColumn("e1", lag($"e3", 2).over(w))
      .filter($"e1" === rows.head.getString(0) &&
        $"e2" === rows.head.getString(1) && $"e3" === rows.head.getString(2))
      .count()
    assert(direct === rows.head.getLong(3))
  }

  test("rfm: scores respect the fences and segments cover every user") {
    val rows = SegmentQ.qRfmSegments(spark, sf001).collect()
    val nBuyers = Tables(spark, sf001).events
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(rows.length.toLong === nBuyers)
    val segs = rows.map(_.getString(7)).toSet
    assert(segs.subsetOf(Set("champion", "loyal", "at_risk", "casual")))
    rows.foreach { r =>
      Seq(4, 5, 6).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 3))
    }
    // tercile scoring: each r_score class holds >= 1 user and scores
    // are monotone in recency (higher recency never scores higher)
    val byRec = rows.sortBy(_.getLong(1))
    byRec.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) >= b.getLong(4) || a.getLong(1) == b.getLong(1))
    }
  }
}
