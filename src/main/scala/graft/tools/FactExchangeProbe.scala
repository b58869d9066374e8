package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-time probe for the flat-tier q3/q12/q21 adjudication (judge
  * r15 ask #5 — the Q18Probe template generalized): each of the three
  * over-2× flat headliners is a fact⋈fact join on the order key, so
  * the hypothesis from the q18 decomposition is that the flat gap is
  * the ORDER-KEY EXCHANGE of the fact sides — the stage the bucketed
  * layout removes — not a join/plan defect. Per query this probe
  * times, on a given lake:
  *
  *   - `li scan`   — the gate's filtered+projected lineitem side
  *   - `li exch`   — the same rows through one repartition(l_orderkey)
  *                   (the exchange the flat join must pay; bucketed
  *                   layouts read pre-partitioned and skip it)
  *   - `ord scan`  — the gate's filtered+projected orders side
  *   - `ord exch`  — ditto through repartition(o_orderkey)
  *   - `full gate` — SparkEntry.queries(name)
  *
  * Run it on BOTH lakes (flat /tmp/graft_bench_sf1 and bucketed
  * /tmp/graft_bench_sf1b): if flat(full) − bucketed(full) ≈ the flat
  * exchange cells, the gap is the declared fact-exchange floor and
  * the flat tier is adjudicated by measurement.
  *
  * Usage: runMain graft.tools.FactExchangeProbe <lakeDir> [iters]
  */
object FactExchangeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_sf1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("factexchprobe", s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[factexch] $tag%-24s min=${ts.min}%6.3f s median=${ts.sorted.apply(ts.size / 2)}%6.3f s")
    }

    val t = graft.Tables(spark, dir)
    // the gates' own fact-side filters/projections, kept in sync with
    // Relational.q3TopOrders / TpchMore.q12ShipMode / q21WaitingOrders
    val sides: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("q3_top_orders",
        t.lineitem.filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
          .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        t.orders.filter($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
          .select($"o_orderkey", $"o_custkey", $"o_orderdate")),
      ("q12_ship_mode",
        t.lineitem
          .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
          .select($"l_orderkey", $"l_shipdate", $"l_linestatus"),
        t.orders.filter($"o_orderdate" < "1996-11-02")
          .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")),
      ("q21_waiting_orders",
        t.lineitem.select($"l_orderkey", $"l_suppkey", $"l_shipdate"),
        t.orders.filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate")))

    sides.foreach { case (name, li, ord) =>
      println(s"[factexch] === $name @ $dir ===")
      timed("li scan") { noop(li) }
      timed("li exch(orderkey)") { noop(li.repartition($"l_orderkey")) }
      timed("ord scan") { noop(ord) }
      timed("ord exch(orderkey)") { noop(ord.repartition($"o_orderkey")) }
      timed("full gate") { noop(graft.SparkEntry.queries(name)(spark, dir)) }
    }
    spark.stop()
  }
}
