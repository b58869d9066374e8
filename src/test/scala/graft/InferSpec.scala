package graft

import graft.queries.InferQ
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inference/concentration wave: the bucketed-join no-shuffle proof,
  * PrefixSum-vs-naive-window equality for the CUSUM curve, and the
  * mathematical invariants of the rank statistics.
  */
class InferSpec extends GraftSuite {
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange on either side") {
    // Broadcast off so the join must be sort-merge; bucketing on both
    // sides (same key, same 8 buckets) must satisfy the join's
    // distribution requirement with zero Exchange nodes.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = InferQ.etlBucketedJoin(spark, sf0001)
      val tag = InferQ.bucketedTag(spark, sf0001)
      val joined = spark.table(s"graft_buck.orders_$tag")
        .join(spark.table(s"graft_buck.lineitem_$tag"),
          col("o_orderkey") === col("l_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(df.count() == 5)
    }
  }

  test("cusum prefix-sum curve equals the naive single-partition window") {
    val fast = InferQ.tsCusum(spark, sf0001)
      .select($"day", $"cum_dev").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val daily = Tables(spark, sf0001).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 1e4).cast("long")).as("rev_e4"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"rev_e4").as("t"))
    val naive = daily.crossJoin(tot)
      .withColumn("dev", $"rev_e4" * $"n" - $"t")
      .withColumn("cum", sum($"dev").over(Window.orderBy($"day")))
      .select($"day", $"cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == naive)
    // CUSUM of deviations from the mean telescopes to ~0 at the end
    // (exactly 0 in rev·n − t units).
    assert(fast(fast.keys.max) == 0L)
  }

  test("spearman is bounded, symmetric-exact on a monotone nation") {
    val rows = InferQ.qSpearmanCorr(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val rho = r.getDouble(2)
        assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho out of range: $rho")
      }
    }
    // Perfectly monotone data → rho exactly 1 (tie-free integer path).
    val df = Seq((1, 10L, 100L), (1, 20L, 200L), (1, 30L, 300L), (1, 40L, 400L))
      .toDF("c_nationkey", "x", "y")
    val xr = lit(2L) * rank().over(Window.partitionBy($"c_nationkey").orderBy($"x")) +
      count(lit(1)).over(Window.partitionBy($"c_nationkey", $"x")) - 1
    val yr = lit(2L) * rank().over(Window.partitionBy($"c_nationkey").orderBy($"y")) +
      count(lit(1)).over(Window.partitionBy($"c_nationkey", $"y")) - 1
    val s = df.select($"c_nationkey", xr.as("xr"), yr.as("yr"))
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"), sum($"xr").as("sx"), sum($"yr").as("sy"),
        sum($"xr" * $"yr").as("sxy"), sum($"xr" * $"xr").as("sxx"),
        sum($"yr" * $"yr").as("syy"))
      .select((($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
        sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
          ($"n" * $"syy" - $"sy" * $"sy").cast("double"))).as("rho"))
    assert(s.collect().head.getDouble(0) == 1.0)
  }

  test("mann-whitney U is exact: u2_a + u2_b = 2 * n_a * n_b") {
    // U_a + U_b = n_a·n_b identically; recompute U_b by flipping the
    // cohort predicate and check the exact integer identity.
    val a = InferQ.qMannWhitney(spark, sf0001).collect().head
    val (na, nb, u2a) = (a.getLong(0), a.getLong(1), a.getLong(2))
    val per = Tables(spark, sf0001).events
      .filter($"event_type" === "purchase")
      .select(round($"value" * 100).cast("long").as("v"),
        ($"user_id" % 2 =!= 0).as("a"))
      .groupBy($"v")
      .agg(sum(when($"a", 1L).otherwise(0L)).as("na"), count(lit(1)).as("n"))
    val cum = graft.operators.PrefixSum.running(per, $"v", expr("v div 10000"), Seq(("n", $"n")))
    val b = cum.agg(
      sum($"na").as("n_a"),
      sum($"na" * (lit(2L) * ($"cum_n" - $"n") + $"n" + 1)).as("r2_a")).collect().head
    val u2b = b.getLong(1) - b.getLong(0) * (b.getLong(0) + 1)
    assert(b.getLong(0) == nb)
    assert(u2a + u2b == 2 * na * nb, s"u2a=$u2a u2b=$u2b na=$na nb=$nb")
  }

  test("bigram totals reconcile with the lengths-only corpus scan") {
    // The PMI denominator totals come from a no-explode lengths scan;
    // they must equal what the exploded pair/token tables sum to —
    // this pins the transform() pair construction exactly.
    val docs = Tables(spark, sf0001).documents
    val arr = graft.functions.TextFns.toks($"text")
    val nTokens = docs.select(explode(arr).as("t")).count()
    val nPairs = docs.select(arr.as("t")).filter(size($"t") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> element_at(t, i))")).as("x")).count()
    val totals = docs.select(size(arr).as("len"))
      .agg(sum($"len".cast("long")), sum(greatest($"len" - 1, lit(0)).cast("long")))
      .collect().head
    assert(totals.getLong(0) == nTokens)
    assert(totals.getLong(1) == nPairs)
  }

  test("js divergence is bounded by ln 2; ccf at lag 0 is the aligned corr") {
    graft.queries.TrainingQ.corpusJsDivergence(spark, sf0001).collect().foreach { r =>
      val js = r.getDouble(3)
      assert(js >= -1e-9 && js <= math.log(2) + 1e-9, s"js out of range: $js")
    }
    val ccf0 = graft.queries.TsQ.tsCcf(spark, sf0001)
      .filter($"lag" === 0).collect().head.getDouble(2)
    val daily = Tables(spark, sf0001).events
      .filter($"event_type".isin("purchase", "view"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when($"event_type" === "purchase", round($"value" * 100).cast("long"))
          .otherwise(0L)).as("p"),
        sum(when($"event_type" === "view", round($"value" * 100).cast("long"))
          .otherwise(0L)).as("v"))
    val direct = daily.agg(round(corr($"p", $"v"), 4)).collect().head.getDouble(0)
    assert(ccf0 == direct)
  }

  test("bootstrap CI brackets the point estimate and is deterministic") {
    val a = InferQ.qBootstrapCi(spark, sf0001).collect().head
    val b = InferQ.qBootstrapCi(spark, sf0001).collect().head
    assert(a == b)
    assert(a.getLong(0) == 200L)
    val (point, lo, hi) = (a.getLong(1), a.getLong(2), a.getLong(3))
    assert(lo <= hi)
    assert(lo <= point && point <= hi,
      s"point $point outside CI [$lo, $hi] — resampling is degenerate")
  }

  test("anova and runs-test stats reduce over metadata, not events") {
    // Both plans must aggregate events ONCE; every later stage runs
    // over group-cardinality metadata (a second scan of events would
    // show as a second events parquet leaf).
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "events\\.parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(scans(InferQ.qAnovaF(spark, sf0001)) == 1)
    assert(scans(InferQ.qRunsTest(spark, sf0001)) == 1)
    // HHI: per-supplier reduce happens before the nation fan-back —
    // lineitem is scanned exactly once.
    val hhi = InferQ.qHhi(spark, sf0001)
    val p = hhi.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1, s"lineitem rescanned:\n$p")
  }
}
