package graft

import graft.operators.SaltedJoin
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Scale-mechanism proofs (SURVEY.md §5): salting, partition pruning,
  * bucketed co-located joins.
  */
class ScaleSpec extends GraftSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    val skewed = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (5L, "mild")).toDF("k", "name")
    val plain = skewed.join(dim, "k").select($"k", $"v", $"name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = SaltedJoin.inner(skewed, dim, "k", saltFactor = 8)
      .select($"k", $"v", $"name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_part").toString + "/events"
    Tables(spark, sf0001).events
      .write.partitionBy("event_type").parquet(out)
    val back = spark.read.parquet(out).filter($"event_type" === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"),
      s"no partition pruning in:\n$plan")
    val expected = Tables(spark, sf0001).events
      .filter($"event_type" === "click").count()
    assert(back.count() == expected)
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact at runtime") {
    // the 100 TB pattern: facts partitioned on the join key's proxy,
    // dimension filtered at runtime — static pruning can't see the
    // dim filter, DPP injects it into the fact scan as a runtime
    // subquery so unneeded partitions are never read
    val base = Files.createTempDirectory("graft_dpp").toString
    Tables(spark, sf0001).events
      .write.partitionBy("event_type").parquet(s"$base/events")
    val fact = spark.read.parquet(s"$base/events")
    // the dim must be a real scan: a local relation's filter constant-
    // folds away at optimize time and DPP never sees a selective
    // predicate (exactly how a lake dim behaves is what's under test)
    Seq(("purchase", "rev"), ("refund", "rev"), ("click", "traffic"),
        ("view", "traffic"), ("signup", "acq"))
      .toDF("event_type", "category").write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val q = fact.join(dim, "event_type").filter($"category" === "rev")
      .groupBy($"event_type").agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"event_type", $"n".as("count"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$p")
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables(spark, sf0001).events
      .filter($"event_type".isin("purchase", "refund"))
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected && got.nonEmpty)
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previous JVM's managed-table location survives the in-memory
    // catalog; remove it or CTAS refuses to reuse the path
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables(spark, sf0001).orders
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, sf0001).lineitem
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // force the sort-merge path (broadcast would bypass bucketing on
    // tables this small — at scale the fact-fact join is never
    // broadcastable, which is the case bucketing exists for)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"bucketing unused:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skew decision table: plain vs AQE skew-split vs salted join agree; timings recorded") {
    // the q_skew_profile → remedy decision, demonstrated: one hot key
    // carries half of a 2M-row fact. All three strategies must agree
    // exactly; the measured times (info below + SURVEY §5) record WHEN
    // each wins — plain sort-merge strands one reducer with the hot
    // key, AQE splits that reducer's input at runtime with zero query
    // changes (the default remedy), explicit salting rewrites the plan
    // and wins when the skew is known ahead of time and AQE's
    // post-shuffle split granularity is too coarse.
    val fact = spark.range(2000000)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 0 ELSE id END AS k", "id AS v")
    val dim = spark.range(1000000).selectExpr("id AS k", "CAST(id AS STRING) AS name")
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.selectExpr("count(*) AS n", "sum(k) AS sk", "sum(v) AS sv").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val (plain, tPlain) = withSQLConf(noBroadcast :+
        ("spark.sql.adaptive.enabled" -> "false"): _*) {
      timed(fingerprint(fact.join(dim, "k")))
    }
    val (aqe, tAqe) = withSQLConf(noBroadcast ++ Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB"): _*) {
      timed(fingerprint(fact.join(dim, "k")))
    }
    val (salted, tSalted) = withSQLConf(noBroadcast :+
        ("spark.sql.adaptive.enabled" -> "false"): _*) {
      timed(fingerprint(graft.operators.SaltedJoin.inner(fact, dim, "k", saltFactor = 16)))
    }
    assert(plain == aqe && aqe == salted, s"strategies disagree: $plain $aqe $salted")
    assert(plain._1 == 1500000L)
    info(f"skewed 2M-row join: plain=$tPlain%.2fs aqe-split=$tAqe%.2fs salted=$tSalted%.2fs")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // one hot key carrying half the fact rows — the shape that strands
    // a single reducer without AQE's skew-join splitting
    val fact = spark.range(200000)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 0 ELSE id END AS k", "id AS v")
    val dim = spark.range(100000).selectExpr("id AS k", "CAST(id AS STRING) AS name")
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val joined = fact.join(dim, "k")
      // collect() executes THIS plan (count() would plan a separate
      // aggregate query and leave this one un-finalized)
      // 100k hot-key rows + the 50k odd keys under the dim's 100k range
      assert(joined.collect().length === 150000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
    }
  }
}
