package graft

import graft.queries.{LearnQ, MineQ}
import org.apache.spark.sql.functions._

/** Round-7 learning/mining waves (queries/LearnQ.scala and
  * queries/MineQ.scala): decision stump, Welch t, permutation test,
  * JL projection, type inference, RAKE keywords, sequence regex,
  * Holt smoothing.
  */
class LearnSpec extends GraftSuite {
  import spark.implicits._

  test("tree stump partitions the fact table and never loses Gini") {
    val r = LearnQ.qTreeStump(spark, sf0001).collect().head
    val total = Tables(spark, sf0001).lineitem.count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") === total)
    assert(r.getAs[Long]("pos_left") <= r.getAs[Long]("n_left"))
    assert(r.getAs[Long]("pos_right") <= r.getAs[Long]("n_right"))
    // splitting can never increase impurity
    assert(r.getAs[Double]("gini_gain") >= 0.0)
  }

  test("welch df sits between the classical bounds") {
    val r = LearnQ.qWelchTtest(spark, sf0001).collect().head
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    val df = r.getAs[Double]("df_welch")
    // Welch–Satterthwaite df ∈ [min(n)-1, n_a+n_b-2]
    assert(df >= (na.min(nb) - 1).toDouble - 0.01)
    assert(df <= (na + nb - 2).toDouble + 0.01)
    assert(!r.getAs[Double]("t_stat").isNaN)
  }

  test("permutation test p-value is calibrated to the permutation count") {
    val r = LearnQ.qPermutationTest(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_perms") === 100L)
    val nGe = r.getAs[Long]("n_ge")
    assert(nGe >= 0 && nGe <= 100)
    val p = r.getAs[Double]("p_value")
    assert(p >= 1.0 / 101 - 1e-9 && p <= 1.0)
  }

  test("random projection emits 8 exact cells per vector, deterministically") {
    val out = LearnQ.embRandProj(spark, sf0001)
    val nVec = Tables(spark, sf0001).embeddings.count()
    assert(out.count() === nVec * 8)
    // signs are md5-derived: a second run is bit-identical
    val a = out.collect().map(_.toSeq)
    val b = LearnQ.embRandProj(spark, sf0001).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(out.agg(sum(abs($"y"))).collect().head.getLong(0) > 0)
  }

  test("projection recall is bounded and the sketch finds real neighbors") {
    val rows = LearnQ.embProjRecall(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 1 && n <= 10)
      assert(r.getAs[Double]("recall_at_10") === n / 10.0)
    }
    // 8 of 64 dims is a LOSSY sketch — the eval exists to measure
    // that; the bar is beating chance (10/500 per query), not fidelity
    assert(rows.map(_.getAs[Long]("n_overlap")).sum >= rows.length)
  }

  test("type inference recovers the orders schema from strings") {
    val m = MineQ.etlTypeInfer(spark, sf0001).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("inferred_type")).toMap
    assert(m("o_orderkey") === "bigint")
    assert(m("o_custkey") === "bigint")
    assert(m("o_orderstatus") === "string")
    assert(m("o_totalprice") === "double")
    assert(m("o_orderdate") === "timestamp")
    assert(m("o_orderpriority") === "string")
  }

  test("keywords are multiword phrases ranked by non-increasing score") {
    val rows = MineQ.textKeywords(spark, sf0001).orderBy($"rank").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(r => r.getAs[Long]("n_words") >= 2 && r.getAs[Long]("n_words") <= 4))
    val scores = rows.map(_.getAs[Long]("score_e6"))
    assert(scores.zip(scores.tail).forall { case (hi, lo) => hi >= lo })
    // phrases contain no stopwords (boundaries removed them)
    assert(rows.forall(r => !r.getAs[String]("phrase").split(" ").contains("the")))
  }

  test("clean conversions are a subset of signup-then-purchase") {
    val m = MineQ.qEventRegex(spark, sf0001).collect()
      .map(r => r.getAs[String]("pattern_name") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_matched"))).toMap
    assert(m("clean_conversion")._2 <= m("signup_then_purchase")._2)
    // every pattern scans the same user universe
    assert(m.values.map(_._1).toSet.size === 1)
  }

  test("holt smoothing seeds on the first day and forecasts level+trend") {
    val rows = MineQ.tsHolt(spark, sf0001).orderBy($"day").collect()
    val days = Tables(spark, sf0001).orders
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .distinct().count()
    assert(rows.length === days)
    val first = rows.head
    assert(first.getAs[Double]("level") === first.getAs[Long]("cents") / 100.0)
    assert(first.getAs[Double]("trend") === 0.0)
    rows.foreach { r =>
      val f = r.getAs[Double]("forecast_next")
      assert(math.abs(f - (r.getAs[Double]("level") + r.getAs[Double]("trend"))) <= 2e-4)
    }
  }

  test("holt-winters replays the seeded seasonal recurrence driver-side") {
    val rows = MineQ.tsHoltWinters(spark, sf0001).orderBy($"day").collect()
    val daily = Tables(spark, sf0001).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"day").as[(Long, Long)].collect()
    assert(rows.length === daily.length - 7)
    // replay the identical recurrence in plain Scala doubles
    val l0 = daily.take(7).map(_._2).sum.toDouble / 7.0
    var l = l0; var b = 0.0
    val sea = daily.take(7).map(_._2.toDouble - l0)
    rows.zipWithIndex.foreach { case (r, k) =>
      val i = k + 7
      val (day, cents) = daily(i)
      assert(r.getAs[Long]("day") === day)
      val slot = i % 7
      val sv = sea(slot)
      val fc = l + b + sv
      val lp = 0.5 * (cents.toDouble - sv) + 0.5 * (l + b)
      val bp = 0.5 * (lp - l) + 0.5 * b
      val sp = 0.5 * (cents.toDouble - lp) + 0.5 * sv
      assert(math.abs(r.getAs[Double]("level") - lp / 100) <= 1e-4, s"level@$day")
      assert(math.abs(r.getAs[Double]("trend") - bp / 100) <= 1e-4, s"trend@$day")
      assert(math.abs(r.getAs[Double]("seasonal") - sp / 100) <= 1e-4, s"seasonal@$day")
      assert(math.abs(r.getAs[Double]("fitted") - fc / 100) <= 1e-4, s"fitted@$day")
      l = lp; b = bp; sea(slot) = sp
    }
  }
}
