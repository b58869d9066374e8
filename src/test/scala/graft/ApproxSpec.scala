package graft

import graft.queries.Extra
import org.apache.spark.sql.functions._

class ApproxSpec extends GraftSuite {
  import spark.implicits._

  test("approx quantile within 2% of exact percentile") {
    val approx = Extra.qApproxQuantile(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables(spark, sf001).lineitem
      .groupBy($"l_returnflag")
      .agg(percentile($"l_extendedprice", lit(0.5)).as("p50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / e < 0.02, s"$k: ${approx(k)} vs $e")
    }
  }
}
