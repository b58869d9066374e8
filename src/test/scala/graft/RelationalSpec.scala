package graft

import graft.queries.Relational

class RelationalSpec extends GraftSuite {

  test("q1 pricing summary: six groups, sane aggregates") {
    val rows = Relational.q1PricingSummary(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byKey.keys.forall { case (rf, ls) =>
      Set("A", "N", "R")(rf) && Set("O", "F")(ls)
    })
    rows.foreach { r =>
      assert(r.getDouble(2) > 0)            // sum_qty
      assert(r.getLong(9) > 0)              // count_order
      assert(r.getDouble(6) <= r.getDouble(3)) // avg_qty <= sum_base_price (trivially)
    }
  }

  test("q1 is map-side combinable (partial aggregate in plan)") {
    val plan = Relational.q1PricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
  }
}
