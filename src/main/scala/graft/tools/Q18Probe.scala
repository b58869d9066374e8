package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-time probe for the flat-tier q18 adjudication (judge r14 ask
  * #3): decomposes q18_large_orders on a given lake into (a) the bare
  * lineitem (l_orderkey, l_quantity) scan, (b) the 6M-row
  * pre-aggregate `groupBy(l_orderkey).sum(l_quantity) having > 300`
  * — the stage the flat layout pays an exchange for and the bucketed
  * layout doesn't — and (c) the full gate, plus a join-strategy A/B
  * (merge vs shuffle_hash on the aggregated side) so the artifact
  * itself shows the join choice is not the flat gap. Usage:
  *   runMain graft.tools.Q18Probe <lakeDir> [iters]
  */
object Q18Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_sf1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("q18probe", s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(tag: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q18probe] $tag%-28s min=${ts.min}%6.3f s median=${ts.sorted.apply(ts.size / 2)}%6.3f s")
    }

    val t = graft.Tables(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("scan (key, qty)") {
      noop(t.lineitem.select($"l_orderkey", $"l_quantity"))
    }
    timed("pre-aggregate + having") {
      noop(t.lineitem.groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("qty")).filter($"qty" > 300.0))
    }
    def full(hintMerge: Boolean): org.apache.spark.sql.DataFrame = {
      val big = t.lineitem.groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("qty")).filter($"qty" > 300.0)
      val joined = if (hintMerge)
        t.orders.hint("merge").join(big, $"o_orderkey" === $"l_orderkey")
      else t.orders.join(big.hint("shuffle_hash"), $"o_orderkey" === $"l_orderkey")
      joined.join(t.customer, $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          round($"o_totalprice", 4).as("o_totalprice"),
          round($"qty", 4).as("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    }
    timed("full gate (merge)") { noop(full(hintMerge = true)) }
    timed("full gate (shuffle_hash)") { noop(full(hintMerge = false)) }
    spark.stop()
  }
}
