package graft

import graft.queries.EntityQ

/** Round-7 wave Y (queries/EntityQ.scala): golden-record resolution. */
class EntitySpec extends GraftSuite {
  import spark.implicits._

  test("golden record: originals survive, dirty copies fold back onto their source") {
    val rows = EntityQ.qGoldenRecord(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nCust = Tables(spark, sf0001).customer.count()
    rows.foreach { r =>
      // survivorship picks an ORIGINAL (ids < 10^7) as the golden record
      assert(r.getAs[Long]("golden_id") < 10000000L, s"cluster ${r.get(0)}")
      assert(r.getAs[Long]("n_members") >= 2L)
      // min-label clusters are labeled by their min member = the golden id
      assert(r.getAs[Long]("cluster") === r.getAs[Long]("golden_id"))
      assert(r.getAs[String]("golden_name").startsWith("Customer#"))
    }
    // the fixture plants one dirty copy per customer; the vast majority
    // must re-merge (some perturbed names can exceed distance 2 at the
    // trigram DF cap — the declared blocking contract)
    assert(rows.length >= (nCust * 0.8).toLong, s"${rows.length} of $nCust merged")
    // no chain-merging: balance agreement keeps clusters tight
    assert(rows.count(_.getAs[Long]("n_members") > 2L) <= (nCust * 0.02).toInt)
  }
}
