package graft

import graft.queries.{AssocQ, AuditQ}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-7 association/effect-size wave (queries/AssocQ.scala), the
  * k-means step operator, and the materialization gates.
  */
class AssocSpec extends GraftSuite {
  import spark.implicits._

  test("theil-sen distributed median equals the built-in percentile aggregate") {
    // the PrefixSum selection replaced percentile() for scale; this
    // pins value-equality of the two formulations on real data
    val daily = Tables(spark, sf0001).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
    val slopes = daily.select($"day".as("d1"), $"y".as("y1"))
      .join(daily.select($"day".as("d2"), $"y".as("y2")), $"d1" < $"d2")
      .select(expr("try_divide(cast(y2 - y1 as double), cast(d2 - d1 as double))").as("slope"))
    val builtin = slopes.agg(round(percentile($"slope", lit(0.5)), 6)).collect().head.getDouble(0)
    val got = AssocQ.tsTheilSen(spark, sf0001)
      .select($"theil_sen_slope").collect().head.getDouble(0)
    assert(got === builtin)
  }

  test("kendall tau-b is bounded and pair accounting is complete") {
    val r = AssocQ.qKendallTau(spark, sf0001).collect().head
    val nDays = r.getAs[Long]("n_days")
    val nPairs = r.getAs[Long]("n_pairs")
    assert(nPairs === nDays * (nDays - 1) / 2)
    // every pair is concordant, discordant, or tied on at least one side
    val c = r.getAs[Long]("concordant"); val d = r.getAs[Long]("discordant")
    assert(c + d <= nPairs)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("kmeans step conserves membership and moves centroids off their seeds") {
    val emb = Tables(spark, sf0001).embeddings
    val out = Similarity.kmeansStep(emb, "vec_id", "embedding", numCentroids = 8)
    val total = emb.count()
    // every dim of a cluster reports the same member count; cluster
    // counts sum to the corpus size
    val perCluster = out.groupBy($"cluster")
      .agg(countDistinct($"n_members").as("nc"), max($"n_members").as("n"))
      .collect()
    assert(perCluster.forall(_.getLong(1) == 1))
    assert(perCluster.map(_.getAs[Long]("n")).sum === total)
    assert(out.count() === 8L * 64)
  }

  test("kmeans fit improves the clustering objective over iterations") {
    import graft.functions.VecFns
    val emb = Tables(spark, sf0001).embeddings
    // objective: mean best-cosine to the centroid table
    def objective(cents: org.apache.spark.sql.DataFrame): Double = {
      val v = emb.select($"vec_id".as("id"), $"embedding".as("v"))
      v.crossJoin(broadcast(cents))
        .withColumn("c_cos", VecFns.cosine($"v", $"c_v"))
        .groupBy($"id").agg(max($"c_cos").as("best"))
        .agg(avg($"best")).collect().head.getDouble(0)
    }
    def centsOf(step: org.apache.spark.sql.DataFrame) =
      step.groupBy($"cluster")
        .agg(expr("transform(array_sort(collect_list(struct(dim, new_c))), s -> s.new_c)").as("c_v"))
        .select($"cluster".as("c_id"), $"c_v")
    val seed = emb.orderBy($"vec_id").limit(8)
      .select($"vec_id".as("c_id"), expr("transform(embedding, x -> cast(x as double))").as("c_v"))
    val one = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, iters = 1)
    val three = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, iters = 3)
    val oSeed = objective(seed)
    val o1 = objective(centsOf(one))
    val o3 = objective(centsOf(three))
    assert(o1 >= oSeed - 1e-9, s"one update worsened the objective: $oSeed -> $o1")
    assert(o3 >= o1 - 1e-9, s"more iterations worsened the objective: $o1 -> $o3")
    // fit(1) must equal the single exported step exactly
    val stepRows = Similarity.kmeansStep(emb, "vec_id", "embedding", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val fitRows = one
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(fitRows === stepRows)
  }

  test("ols_multi residuals are orthogonal to both regressors (normal equations hold)") {
    // b solves X'Xb = X'y exactly => X'(y - Xb) = 0; check via the
    // gate's own sufficient statistics re-derived here for one segment
    val t = Tables(spark, sf0001)
    val day0 = t.orders.agg(min(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")).as("d0"))
    val base = t.orders
      .join(t.customer.select($"c_custkey", $"c_mktsegment", round($"c_acctbal").cast("long").as("x1")),
        $"o_custkey" === $"c_custkey")
      .crossJoin(broadcast(day0))
      .filter($"c_mktsegment" === "BUILDING")
      .select($"x1",
        (expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000") - $"d0").as("x2"),
        round($"o_totalprice").cast("long").as("y"))
    val r = AssocQ.qOlsMulti(spark, sf0001)
      .filter($"c_mktsegment" === "BUILDING").collect().head
    val b1 = r.getAs[Double]("b_acctbal"); val b2 = r.getAs[Double]("b_day")
    val a = r.getAs[Double]("intercept")
    val res = base.select(
      sum(($"y" - (lit(a) + lit(b1) * $"x1" + lit(b2) * $"x2")) * $"x1").as("r1"),
      sum(($"y" - (lit(a) + lit(b1) * $"x1" + lit(b2) * $"x2")) * $"x2").as("r2"),
      sum($"y" * $"y").cast("double").as("scale")).collect().head
    // rounded coefficients leave small but nonzero residual moments;
    // they must be tiny relative to the response's own scale
    assert(math.abs(res.getDouble(0)) < 1e-3 * res.getDouble(2))
    assert(math.abs(res.getDouble(1)) < 1e-3 * res.getDouble(2))
  }

  test("ivm merged state+delta equals a direct full aggregate") {
    val direct = Tables(spark, sf0001).orders
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("rev_cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ivm = AuditQ.qIvmAgg(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ivm === direct)
  }

  test("theil-sen plan windows the pair set by bucket, never globally") {
    val plan = AssocQ.tsTheilSen(spark, sf0001).queryExecution.executedPlan.toString
    // every Window over the slope data must be partitioned by the
    // PrefixSum bucket; the only unpartitioned window allowed is the
    // serial pass over per-bucket TOTALS (operates on __t0, not cnt)
    val unpartitioned = plan.split("\n").filter(l =>
      l.contains("windowspecdefinition(") && !l.contains("windowspecdefinition(__bucket"))
    assert(unpartitioned.forall(_.contains("__t0")),
      s"unpartitioned window over row-level data:\n${unpartitioned.mkString("\n")}")
  }
}
