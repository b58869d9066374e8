package graft

import graft.queries.{GovQ, GraphQ}
import org.apache.spark.sql.functions._

/** Round-7 wave S (queries/GovQ.scala) + the HITS gate (GraphQ). */
class GovSpec extends GraftSuite {
  import spark.implicits._

  test("pseudonymize: token join preserves every nation's order count") {
    val rows = GovQ.etlPseudonymize(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders_raw") === r.getAs[Long]("n_orders_tok"),
        r.getAs[String]("n_name"))
      val tok = r.getAs[String]("sample_token")
      assert(tok.length === 16 && tok.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    }
    assert(rows.map(_.getAs[Long]("n_cust")).sum ===
      Tables(spark, sf0001).customer.count())
  }

  test("subject audit: three typed rows, consistent ranges and cascade counts") {
    val rows = GovQ.etlSubjectAudit(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("tbl")).toSeq === Seq("customer", "lineitem", "orders"))
    val byTbl = rows.map(r => r.getAs[String]("tbl") -> r).toMap
    assert(byTbl("customer").getAs[Long]("n_rows") === 1L)
    val o = byTbl("orders"); val l = byTbl("lineitem")
    if (o.getAs[Long]("n_rows") > 0) {
      assert(l.getAs[Long]("n_rows") >= o.getAs[Long]("n_rows")) // every order has lines
      assert(o.getAs[Long]("day_min") <= o.getAs[Long]("day_max"))
    } else {
      assert(o.getAs[Long]("day_min") === -1L && l.getAs[Long]("n_rows") === 0L)
    }
  }

  test("retention sweep: partitions each table; lineitem purges by cascade") {
    val rows = GovQ.etlRetentionSweep(spark, sf0001).collect()
    val byTbl = rows.map(r =>
      (r.getAs[String]("tbl"), (r.getAs[Long]("purged"), r.getAs[Long]("kept")))).toMap
    val t = Tables(spark, sf0001)
    assert(byTbl("orders")._1 + byTbl("orders")._2 === t.orders.count())
    assert(byTbl("lineitem")._1 + byTbl("lineitem")._2 === t.lineitem.count())
    assert(byTbl("customer")._1 + byTbl("customer")._2 === t.customer.count())
    // cascade recount: purged lines = lines whose parent order is purged
    val o = t.orders.select($"o_orderkey",
      expr("unix_micros(o_orderdate) div 86400000000").as("oday"))
    val Array(lo, hi) = o.agg(min($"oday"), max($"oday")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val cutoff = (lo + hi + 1) / 2
    val purgedLines = t.lineitem.join(o, $"l_orderkey" === $"o_orderkey")
      .filter($"oday" < cutoff).count()
    assert(byTbl("lineitem")._1 === purgedLines)
  }

  test("hits: normalized authorities, descending order, top score is 1.0") {
    val rows = GraphQ.qHits(spark, sf0001).collect()
    assert(rows.length === 20)
    assert(rows.head.getAs[Double]("auth") === 1.0) // max-normalization fixpoint
    val scores = rows.map(_.getAs[Long]("auth_e6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val e6 = r.getAs[Long]("auth_e6")
      assert(e6 >= 0L && e6 <= 1000000L)
      assert(math.abs(r.getAs[Double]("auth") - e6 / 1e6) < 1e-9)
    }
  }
}
