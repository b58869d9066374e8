package graft

import graft.queries.Extra
import org.apache.spark.sql.functions._

class ApproxSpec extends GraftSuite {
  import spark.implicits._

  test("Misra-Gries heavy hitters contain the exact top tokens") {
    val mg = Extra.textHeavyHitters(spark, sf001).collect()
      .map(r => r.getString(0)).toSet
    val exact = Tables(spark, sf001).documents
      .select(explode(graft.functions.TextFns.toks($"text")).as("t"))
      .groupBy($"t").count().orderBy($"count".desc, $"t")
      .limit(10).collect().map(_.getString(0)).toSet
    assert(exact.subsetOf(mg), s"missing: ${exact -- mg}")
  }

  test("Misra-Gries counts are exact when capacity exceeds cardinality") {
    val df = Seq.fill(5)("a").map(Tuple1(_)) ++ Seq.fill(3)("b").map(Tuple1(_))
    val got = df.toDF("t")
      .agg(graft.functions.MisraGriesAgg.heavyHitters($"t", 10))
      .collect().head.getMap[String, Long](0)
    assert(got("a") == 5L && got("b") == 3L)
  }

  test("approx quantile within 2% of exact percentile") {
    // the gate emits the tolerance check in-plan; assert it holds, and
    // that the exact side matches an independent recomputation
    val rows = Extra.qApproxQuantile(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val exact = Tables(spark, sf001).lineitem
      .groupBy($"l_returnflag")
      .agg(round(percentile($"l_extendedprice", lit(0.5)), 4).as("p50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      val (gateExact, withinTol) = rows(k)
      assert(gateExact == e, s"$k: gate exact $gateExact vs recomputed $e")
      assert(withinTol, s"$k: GK estimate outside 2% of $e")
    }
  }
}
