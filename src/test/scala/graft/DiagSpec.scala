package graft

import graft.queries.DiagQ

/** Round-7 wave Q (queries/DiagQ.scala) — regression diagnostics. */
class DiagSpec extends GraftSuite {

  test("influence: 15 distinct days, leverage in (0,1), cook ordered desc") {
    val rows = DiagQ.qRegressionDiagnostics(spark, sf0001).collect()
    assert(rows.length === 15)
    assert(rows.map(_.getAs[Long]("day")).distinct.length === 15)
    rows.foreach { r =>
      val h = r.getAs[Double]("leverage")
      assert(h > 0.0 && h < 1.0)
      assert(r.getAs[Double]("cook_d") >= 0.0)
    }
    val cooks = rows.map(_.getAs[Double]("cook_d"))
    assert(cooks.zip(cooks.tail).forall { case (a, b) => a >= b })
  }

  test("durbin-watson lands in its [0,4] range") {
    val r = DiagQ.qDurbinWatson(spark, sf0001).collect().head
    val dw = r.getAs[Double]("dw")
    assert(dw >= 0.0 && dw <= 4.0)
    assert(r.getAs[Long]("n") > 100L)
  }

  test("breusch-pagan: r2 in [0,1], lm = n*r2 up to rounding, flag consistent") {
    val r = DiagQ.qBreuschPagan(spark, sf0001).collect().head
    val r2 = r.getAs[Double]("r2"); val lm = r.getAs[Double]("lm")
    val n = r.getAs[Long]("n")
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(lm - n * r2) < n * 1e-4 + 1e-3)
    assert(r.getAs[Boolean]("heteroscedastic") === (lm > 3.841))
  }
}
