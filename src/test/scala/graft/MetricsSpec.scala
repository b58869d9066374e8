package graft

import graft.queries.MetricsQ
import org.apache.spark.sql.functions._

/** Round-7 wave O (queries/MetricsQ.scala) — model-evaluation metrics. */
class MetricsSpec extends GraftSuite {
  import spark.implicits._

  /** The gate's (score_e4, is_en) pairs, re-derived independently. */
  private def pairs(dir: String): Array[(Long, Boolean)] =
    Tables(spark, dir).documents
      .select(
        expr("CAST(round(10000.0 * size(filter(split(lower(trim(text)), '\\\\s+'), " +
          "t -> t IN ('the','a','and','of','to','in','is','it'))) / " +
          "size(split(lower(trim(text)), '\\\\s+'))) AS BIGINT)").as("s"),
        ($"lang" === "en").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))

  test("roc auc matches the all-pairs definition with tie credit") {
    val p = pairs(sf0001)
    val pos = p.filter(_._2).map(_._1); val neg = p.filterNot(_._2).map(_._1)
    val wins = (for (a <- pos; b <- neg)
      yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    val expected = wins / (pos.length.toDouble * neg.length)
    val r = MetricsQ.qRocAuc(spark, sf0001).collect().head
    assert(r.getAs[Long]("n1") === pos.length.toLong)
    assert(r.getAs[Long]("n0") === neg.length.toLong)
    assert(math.abs(r.getAs[Double]("auc") - expected) < 1e-6)
    assert(math.abs(r.getAs[Double]("gini") - (2 * expected - 1)) < 1e-6)
  }

  test("pr curve: tp monotone, final recall 1, f1 consistent, AP in (0,1]") {
    val rows = MetricsQ.qPrCurve(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // rows come back ordered by threshold descending: tp non-decreasing
    val tps = rows.map(_.getAs[Long]("tp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a <= b })
    assert(rows.last.getAs[Double]("rec") === 1.0) // lowest threshold recalls all
    rows.foreach { r =>
      val p = r.getAs[Double]("prec"); val rec = r.getAs[Double]("rec")
      val f1 = r.getAs[Double]("f1")
      if (r.getAs[Long]("tp") == 0L) assert(f1 === 0.0) // 2·0/(0+0+n1)
      else assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-4)
    }
    val ap = rows.head.getAs[Double]("avg_precision")
    assert(ap > 0.0 && ap <= 1.0)
    assert(rows.forall(_.getAs[Double]("avg_precision") === ap))
  }

  test("calibration: bins partition the corpus and conf sits inside its bin") {
    val rows = MetricsQ.qCalibration(spark, sf001).collect()
    val n = Tables(spark, sf001).documents.count()
    assert(rows.map(_.getAs[Long]("nb")).sum === n)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin"); val conf = r.getAs[Double]("conf")
      val hi = if (bin == 9) 1.0 else (bin + 1) * 0.1
      assert(conf >= bin * 0.1 - 1e-6 && conf <= hi + 1e-6, s"bin $bin conf $conf")
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
    }
    val ece = rows.head.getAs[Double]("ece")
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("confusion matrix cells partition the corpus; mcc in [-1,1]") {
    val r = MetricsQ.qConfusionMetrics(spark, sf001).collect().head
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val docs = Tables(spark, sf001).documents
    assert(tp + fp + fn + tn === docs.count())
    assert(tp + fn === docs.filter($"lang" === "en").count())
    assert(math.abs(r.getAs[Double]("acc") -
      (tp + tn).toDouble / (tp + fp + fn + tn)) < 1e-6)
    val mcc = r.getAs[Double]("mcc")
    assert(mcc >= -1.0 && mcc <= 1.0)
  }

  test("log loss and brier match a direct recomputation") {
    val p = pairs(sf0001)
    val eps = 1e-6
    val probs = p.map { case (s, y) =>
      (math.max(eps, math.min(1 - eps, s / 10000.0)), y) }
    val ll = probs.map { case (pr, y) =>
      math.round((if (y) -math.log(pr) else -math.log(1 - pr)) * 1e9) }.sum / 1e9 / p.length
    val br = probs.map { case (pr, y) =>
      math.round(math.pow(pr - (if (y) 1.0 else 0.0), 2) * 1e9) }.sum / 1e9 / p.length
    val r = MetricsQ.qLogLoss(spark, sf0001).collect().head
    assert(r.getAs[Long]("n") === p.length.toLong)
    assert(math.abs(r.getAs[Double]("log_loss") - ll) < 1e-5)
    assert(math.abs(r.getAs[Double]("brier") - br) < 1e-5)
  }
}
