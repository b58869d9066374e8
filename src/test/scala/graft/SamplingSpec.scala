package graft

import graft.queries.SamplingQ
import org.apache.spark.sql.functions._

/** Round-7 wave V (queries/SamplingQ.scala) — survey sampling. */
class SamplingSpec extends GraftSuite {
  import spark.implicits._

  test("horvitz-thompson membership replays from the md5 hash; error bounded") {
    val o = Tables(spark, sf0001).orders
      .select($"o_orderkey", $"o_orderpriority",
        conv(substring(md5($"o_orderkey".cast("string")), 1, 13), 16, 10)
          .cast("long").as("hv"))
      .collect()
    val rows = SamplingQ.qHorvitzThompson(spark, sf0001).collect()
    rows.foreach { r =>
      val pri = r.getAs[String]("o_orderpriority")
      val p = pri.substring(0, 1).toLong
      val inStratum = o.filter(_.getAs[String]("o_orderpriority") == pri)
      val sampled = inStratum.count(_.getAs[Long]("hv") * 100 < (35 - 5 * p) * 4503599627370496L)
      assert(r.getAs[Long]("n_sampled") === sampled.toLong, pri)
      assert(r.getAs[Long]("n_total") === inStratum.length.toLong)
      // Bernoulli sampling at pi >= 0.10 on hundreds of orders: the
      // estimate lands within a loose relative band
      assert(math.abs(r.getAs[Double]("err_pct")) < 60.0, pri)
    }
  }

  test("neyman allocation spends the budget in proportion to N_h * S_h") {
    val rows = SamplingQ.qNeymanAllocation(spark, sf0001).collect()
    assert(rows.length === 3) // return flags A/N/R
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(math.abs(total - 1000L) <= rows.length) // rounding slack
    assert(math.abs(rows.map(_.getAs[Double]("alloc_pct")).sum - 100.0) < 0.01)
    rows.foreach(r => assert(r.getAs[Double]("sd_dollars") > 0.0))
  }

  test("importance weights rebalance to uniform language mass, mean weight 1") {
    val rows = SamplingQ.corpusImportanceWeights(spark, sf0001).collect()
    val n = rows.map(_.getAs[Long]("nl")).sum.toDouble
    val k = rows.length
    // every language carries equal reweighted mass n/k
    rows.foreach { r =>
      val mass = r.getAs[Long]("nl") * r.getAs[Double]("weight")
      assert(math.abs(mass - n / k) < n / k * 0.01, r.getAs[String]("lang"))
    }
    val ess = rows.head.getAs[Long]("ess")
    assert(ess > 0L && ess <= n.toLong)
    assert(rows.forall(_.getAs[Long]("ess") === ess))
    // uneven language mix must cost effective sample size
    assert(rows.head.getAs[Double]("ess_fraction") < 1.0)
  }

  test("cohens kappa recomputes from its own cells and stays below 1") {
    val r = SamplingQ.qCohensKappa(spark, sf0001).collect().head
    val (n, yy, yn, ny, nn) = (r.getAs[Long]("n"), r.getAs[Long]("yy"),
      r.getAs[Long]("yn"), r.getAs[Long]("ny"), r.getAs[Long]("nn"))
    assert(yy + yn + ny + nn === n)
    val po = (yy + nn).toDouble / n
    val pe = ((yy + yn).toDouble * (yy + ny) + (ny + nn).toDouble * (yn + nn)) / (n.toDouble * n)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-5)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-5)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-4)
    assert(r.getAs[Double]("kappa") <= 1.0)
  }

  test("weighted sample: exact k per stratum, long docs overrepresented") {
    import org.apache.spark.sql.functions._
    val rows = SamplingQ.qWeightedSample(spark, sf001).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val sizes = Tables(spark, sf001).documents.groupBy(col("source"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.length == math.min(10L, sizes(src)).toInt,
        s"$src drew ${rs.length} of ${sizes(src)}")
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // A-ES with weight = token count must favor long documents: the
    // sampled mean token count exceeds the corpus mean (drawing 10 of
    // each source's 25, proportionally to length)
    val sampleMean = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble / rows.length
    val corpusMean = Tables(spark, sf001).documents
      .agg(avg(graft.functions.TextFns.tokenCount(col("text")))).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted draw must skew long: sample $sampleMean vs corpus $corpusMean")
  }
}
