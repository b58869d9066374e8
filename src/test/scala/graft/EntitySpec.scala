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

  test("fellegi-sunter: true copies outscore chance collisions") {
    import org.apache.spark.sql.functions._
    val rows = EntityQ.qFellegiSunter(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val matches = rows.filter(_.getAs[Boolean]("is_match"))
    // every planted copy pair that survived blocking agrees on all
    // three scored attributes and clears the match threshold
    val copyPairs = rows.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 10000000L)
    assert(copyPairs.nonEmpty, "blocking must surface planted copies")
    copyPairs.foreach { r =>
      assert(r.getAs[Boolean]("cents_agree") && r.getAs[Boolean]("mkt_agree")
        && r.getAs[Boolean]("nat_agree"), s"copy pair disagrees: $r")
      assert(r.getAs[Boolean]("is_match"), s"copy pair below threshold: $r")
    }
    // the near-unique attribute carries the weight: every match
    // agrees on balance cents (segment/nation alone cannot clear 5)
    matches.foreach(r => assert(r.getAs[Boolean]("cents_agree"),
      s"match without the dominant evidence: $r"))
    // weights are calibrated log-odds: full agreement beats any
    // single disagreement
    val full = rows.filter(r => r.getAs[Boolean]("cents_agree")
      && r.getAs[Boolean]("mkt_agree") && r.getAs[Boolean]("nat_agree"))
      .map(_.getAs[Double]("weight"))
    val partial = rows.filterNot(r => r.getAs[Boolean]("cents_agree")
      && r.getAs[Boolean]("mkt_agree") && r.getAs[Boolean]("nat_agree"))
      .map(_.getAs[Double]("weight"))
    if (full.nonEmpty && partial.nonEmpty)
      assert(full.min > partial.max,
        s"log-odds ordering violated: full min ${full.min} <= partial max ${partial.max}")
  }
}
