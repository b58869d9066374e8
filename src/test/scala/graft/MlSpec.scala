package graft

import graft.operators.Dbscan
import graft.queries.{MlQ, SimilarityQ}
import org.apache.spark.sql.functions._

/** Round-7 continuation: unsupervised-ML wave — DBSCAN, LOF,
  * covariance structure and PCA power iteration (queries/MlQ.scala,
  * operators/Dbscan.scala).
  */
class MlSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf001).embeddings

  test("dbscan role invariants hold against the pair graph") {
    val pairs = Dbscan.epsPairs(emb, "vec_id", "embedding", minCos = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val fit = MlQ.embDbscan(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val roleOf = fit.map(t => t._1 -> t._3).toMap
    fit.foreach { case (id, cluster, role) =>
      role match {
        case "core" =>
          assert(deg.getOrElse(id, 0) >= 3, s"core $id has degree ${deg.get(id)}")
          assert(cluster >= 0 && cluster <= id) // min-label component
        case "border" =>
          assert(deg.getOrElse(id, 0) < 3 || deg.getOrElse(id, 0) >= 0)
          val coreNbrs = pairs.collect {
            case (a, b) if a == id && roleOf(b) == "core" => b
            case (a, b) if b == id && roleOf(a) == "core" => a
          }
          assert(coreNbrs.nonEmpty, s"border $id has no core neighbor")
          assert(cluster >= 0)
        case "noise" =>
          val coreNbrs = pairs.collect {
            case (a, b) if a == id && roleOf(b) == "core" => b
            case (a, b) if b == id && roleOf(a) == "core" => a
          }
          assert(coreNbrs.isEmpty && cluster == -1L)
      }
    }
    // clusters are non-trivial at sf0.01: some of each role
    assert(fit.count(_._3 == "core") > 0 && fit.count(_._3 == "border") > 0 &&
      fit.count(_._3 == "noise") > 0)
  }

  test("dbscan core-core edges never bridge two clusters") {
    val fit = MlQ.embDbscan(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val pairs = Dbscan.epsPairs(emb, "vec_id", "embedding", minCos = 0.3).collect()
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      if (fit(a)._2 == "core" && fit(b)._2 == "core")
        assert(fit(a)._1 == fit(b)._1, s"core edge $a-$b crosses clusters")
    }
  }

  test("lof scores center on 1 and the top outlier exceeds the bulk") {
    val lof = SimilarityQ.annLofOutliers(spark, sf001).collect()
    assert(lof.length == 20)
    val scores = lof.map(_.getAs[Double]("lof"))
    assert(scores.forall(_ > 0))
    // published descending
    assert(scores.sameElements(scores.sortBy(-_)))
    // LOF of a density-consistent point is ~1; the top-20 outliers sit above it
    assert(scores.head > 1.0)
  }

  test("cov matrix diagonal correlates to exactly 1 and matches covar_pop up to quantization") {
    val m = MlQ.embCovMatrix(spark, sf001).collect()
    assert(m.length == 36)
    m.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getAs[Double]("corr") == 1.0))
    // cross-check one off-diagonal cell against Spark's covar_pop on the
    // same quantized values: cov_q = n² · covar_pop(q0, q1)
    val q = emb.select(
      floor(element_at($"embedding", 1).cast("double") * 1048576.0).as("q0"),
      floor(element_at($"embedding", 2).cast("double") * 1048576.0).as("q1"))
    val Row01 = m.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    val n = Row01.getAs[Long]("n_vecs")
    val builtin = q.agg(covar_pop($"q0", $"q1")).collect().head.getDouble(0)
    assert(math.abs(Row01.getAs[Long]("cov_q").toDouble - builtin * n * n) < math.abs(builtin) * n * 1e-6 + 1.0)
  }

  test("pca projection histogram buckets are consistent and cover the corpus") {
    val total = emb.count()
    val h = MlQ.embPcaProject(spark, sf001).collect()
    assert(h.map(_.getAs[Long]("n_vecs")).sum == total)
    h.foreach { r =>
      val b = r.getLong(0); val m = r.getAs[Double]("mean_score")
      // every bucket's mean lies inside the bucket's [0.25·b, 0.25·(b+1)) range
      assert(m >= b * 0.25 - 1e-6 && m < (b + 1) * 0.25 + 1e-6,
        s"bucket $b mean $m outside its range")
    }
  }

  test("silhouette covers the corpus and scores stay in [-1, 1]") {
    val total = emb.count()
    val s = MlQ.embSilhouette(spark, sf001).collect()
    assert(s.length == 10) // one row per seed centroid
    assert(s.map(_.getAs[Long]("n_members")).sum == total)
    s.foreach { r =>
      val m = r.getAs[Double]("mean_sil")
      assert(m >= -1.0 && m <= 1.0, s"cluster ${r.getLong(0)} mean_sil $m")
    }
  }

  test("pca power iteration converges to a dominant eigenpair of the corr matrix") {
    val out = MlQ.embPcaPower(spark, sf001).collect().sortBy(_.getLong(0))
    assert(out.length == 8)
    val lambda = out.head.getAs[Double]("lambda")
    val v = out.map(_.getAs[Long]("loading6").toDouble / 1e6)
    // trace of an 8-dim correlation matrix is 8 → top eigenvalue in [1, 8]
    assert(lambda >= 1.0 && lambda <= 8.0)
    // max-abs normalization: the largest |component| is exactly 1
    assert(math.abs(v.map(math.abs).max - 1.0) < 1e-9)
    // residual check: R·v ≈ λ·v on the exact corr matrix
    val corr = MlQ.embCovMatrix(spark, sf001).collect()
      .flatMap { r =>
        val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getAs[Double]("corr"))
        if (i == j) Seq(((i, j), c)) else Seq(((i, j), c), ((j, i), c))
      }.toMap
    val rv = Array.tabulate(8)(i => (0 until 8).map(k => corr((i, k)) * v(k)).sum)
    val res = (0 until 8).map(i => math.abs(rv(i) - lambda * v(i))).max
    assert(res < 0.05, s"power iteration residual $res too large")
  }

  test("logreg IRLS replays driver-side: same betas, likelihood, accuracy") {
    val r = graft.queries.MlQ.qLogregIrls(spark, sf0001).collect().head
    val users = Tables(spark, sf0001).events
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        when(sum(when($"event_type" === "purchase", 1L).otherwise(0L)) >= 14, 1.0)
          .otherwise(0.0).as("y"))
      .as[(Long, Long, Double)].collect().map(t => (t._2.toDouble, t._3))
    def sig(z: Double): Double = 1.0 / (1.0 + math.exp(-math.max(-30.0, math.min(30.0, z))))
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    var (a, b) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      var (s0, s1, s2, g0, g1) = (0L, 0L, 0L, 0L, 0L)
      users.foreach { case (x, y) =>
        val p = sig(a + b * x); val w = p * (1 - p)
        s0 += rnd(w * 1e9); s1 += rnd(w * x * 1e9); s2 += rnd(w * x * x * 1e9)
        g0 += rnd((y - p) * 1e9); g1 += rnd((y - p) * x * 1e9)
      }
      val det = s0.toDouble * s2 - s1.toDouble * s1
      val da = (g0.toDouble * s2 - g1.toDouble * s1) / det
      val db = (g1.toDouble * s0 - g0.toDouble * s1) / det
      a += da; b += db
    }
    assert(math.abs(r.getAs[Double]("beta0") - a) < 1e-5, s"beta0 $a")
    assert(math.abs(r.getAs[Double]("beta1") - b) < 1e-5, s"beta1 $b")
    val ll = users.map { case (x, y) =>
      val p = sig(a + b * x); rnd((y * math.log(p) + (1 - y) * math.log(1 - p)) * 1e6)
    }.sum / 1e6
    assert(math.abs(r.getAs[Double]("log_likelihood") - ll) < 1e-3)
    val correct = users.count { case (x, y) => (sig(a + b * x) >= 0.5) == (y == 1.0) }
    assert(r.getAs[Long]("n_correct") === correct.toLong)
  }

  test("poisson trend replays driver-side and nearly zeroes the score at the fit") {
    val r = graft.queries.MlQ.tsPoissonTrend(spark, sf0001).collect().head
    val daily = Tables(spark, sf0001).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y")).orderBy($"day").as[(Long, Long)].collect()
    val d0 = daily.map(_._1).min
    val pts = daily.map { case (day, y) => ((day - d0).toDouble, y.toDouble) }
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    var a = math.log(pts.map(_._2).sum / pts.length)
    var b = 0.0
    for (_ <- 1 to 3) {
      var (s0, s1, s2, g0, g1) = (0L, 0L, 0L, 0L, 0L)
      pts.foreach { case (t, y) =>
        val mu = math.exp(math.max(-30.0, math.min(30.0, a + b * t)))
        s0 += rnd(mu * 1e4); s1 += rnd(mu * t * 1e4); s2 += rnd(mu * t * t * 1e4)
        g0 += rnd((y - mu) * 1e4); g1 += rnd((y - mu) * t * 1e4)
      }
      val det = s0.toDouble * s2 - s1.toDouble * s1
      a += (g0.toDouble * s2 - g1.toDouble * s1) / det
      b += (g1.toDouble * s0 - g0.toDouble * s1) / det
    }
    assert(math.abs(r.getAs[Double]("beta0") - a) < 1e-5)
    assert(math.abs(r.getAs[Double]("beta1_daily") - b) < 1e-7)
    // score equations near zero at the optimum: Σ(y−μ) ≈ 0
    val resid = pts.map { case (t, y) => y - math.exp(a + b * t) }.sum
    assert(math.abs(resid) < 1.0, s"score residual $resid")
  }

  test("gmm EM replays driver-side: same components after 3 steps") {
    val r = graft.queries.MlQ.qGmmEm(spark, sf0001).collect().head
    val cents = Tables(spark, sf0001).orders
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[Long].collect().sorted
    val xs = cents.map(_ / 100000.0)
    def pct(q: Double): Double = {
      val pos = (xs.length - 1) * q
      val lo = pos.toInt
      xs(lo) + (pos - lo) * (xs(math.min(lo + 1, xs.length - 1)) - xs(lo))
    }
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val n = xs.length.toLong
    val sC = cents.sum
    val ssC = cents.map(c => BigInt(c) * BigInt(c)).sum
    val v0 = BigDecimal((ssC.toDouble / n - (sC.toDouble / n) * (sC.toDouble / n)) / 1e10)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var (m1, m2, v1, v2, w1) = (pct(0.25), pct(0.75), v0, v0, 0.5)
    for (_ <- 1 to 3) {
      var (s1, sx1, sxx1, sx2, sxx2) = (0L, 0L, 0L, 0L, 0L)
      xs.foreach { x =>
        def dens(m: Double, v: Double): Double =
          math.exp(math.max(-60.0, -((x - m) * (x - m)) / (2.0 * v))) / math.sqrt(v)
        val r1 = w1 * dens(m1, v1) / (w1 * dens(m1, v1) + (1 - w1) * dens(m2, v2) + 1e-300)
        s1 += rnd(r1 * 1e6); sx1 += rnd(r1 * x * 1e6); sxx1 += rnd(r1 * x * x * 1e6)
        sx2 += rnd((1 - r1) * x * 1e6); sxx2 += rnd((1 - r1) * x * x * 1e6)
      }
      val nm1 = sx1.toDouble / s1
      val nm2 = sx2.toDouble / (n.toDouble * 1e6 - s1)
      v1 = math.max(1e-4, sxx1.toDouble / s1 - nm1 * nm1)
      v2 = math.max(1e-4, sxx2.toDouble / (n.toDouble * 1e6 - s1) - nm2 * nm2)
      w1 = s1.toDouble / (n.toDouble * 1e6)
      m1 = nm1; m2 = nm2
    }
    assert(math.abs(r.getAs[Double]("mu1_kd") - m1) < 1e-3, s"mu1 $m1")
    assert(math.abs(r.getAs[Double]("mu2_kd") - m2) < 1e-3, s"mu2 $m2")
    assert(math.abs(r.getAs[Double]("sd1_kd") - math.sqrt(v1)) < 1e-3)
    assert(math.abs(r.getAs[Double]("weight1") - w1) < 1e-3)
    assert(m1 < m2, "components must stay ordered from the percentile seed")
  }

  test("huber IRLS shrugs off a planted outlier day that drags OLS") {
    import spark.implicits._
    // 60 days of counts 20 + j (true slope 1), day 30 bursts to 420
    val rows = (0 until 60).flatMap { j =>
      val n = if (j == 30) 420 else 20 + j
      Seq.fill(n)(java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(j)))
    }
    val dir = java.nio.file.Files.createTempDirectory("huber_lake").toString
    rows.toDF("o_orderdate").write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = MlQ.qHuberIrls(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 60L)
    assert(r.getAs[Long]("n_downweighted") >= 1L, "the burst day must be downweighted")
    val huber = r.getAs[Double]("beta1_daily")
    // OLS on the same frame for comparison
    val ols = spark.sql(
      s"""SELECT regr_slope(y, t) FROM (
         |  SELECT CAST(count(*) AS DOUBLE) AS y,
         |    CAST(datediff(o_orderdate, DATE'1995-01-01') AS DOUBLE) AS t
         |  FROM parquet.`$dir/orders.parquet` GROUP BY o_orderdate)""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(huber - 1.0) < math.abs(ols - 1.0),
      s"huber $huber must sit closer to the true slope 1 than OLS $ols")
    assert(math.abs(huber - 1.0) < 0.2, s"huber slope $huber drifted")
  }
}
