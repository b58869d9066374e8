package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnostic for q_golden_record's ×100 superlinearity
  * (r11 judge ask #2: 22.9 s ×10 → 239.3 s ×100 = 10.46× per 10×, the
  * only undiagnosed superlinear SCALE cell). Re-derives the gate's
  * pipeline with the same recipe at one lake tier and counts every
  * stage: fixture rows, exploded gram rows, DF-cap survivors, the
  * (gram, cents) BLOCK-SIZE distribution (max block and Σ C(cnt,2) —
  * the closed-form raw-pair count), raw blocked pairs, distinct
  * candidates, post-Levenshtein edges, and clusters. The suspected
  * driver: `cents` is near-unique at sf0.1 (~1.1M possible values vs
  * 30k rows) but COLLIDES at ×100 (3M rows), so random same-cents
  * pairs inside mid-frequency digit-gram blocks grow ~quadratically
  * once n passes the value-space size — the probe's sum_sq column
  * makes that visible directly.
  */
object EntityProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[entity] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // the gate's own fixture + blocking recipe (queries/EntityQ.scala)
    val c = graft.Tables(spark, dir).customer.select(
      $"c_custkey".cast("long").as("id"), $"c_name".as("name"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    val dirty = c
      .withColumn("p",
        (conv(substring(md5(concat(lit("gr:"), $"name")), 1, 13), 16, 10).cast("long")
          % (length($"name") - 2) + 1).cast("int"))
      .select(($"id" + 10000000L).as("id"),
        expr("concat(substr(name, 1, p), substr(name, p + 2))").as("name"),
        $"cents")
    val all = c.unionByName(dirty).transform(graft.operators.CacheLedger.persist)
    val nAllRows = timed("fixture rows")(all.count())
    val nCents = timed("distinct cents")(all.select($"cents").distinct().count())
    val g = all.select($"id", $"name", $"cents",
      explode(expr(
        "array_distinct(transform(sequence(1, length(name) - 2), i -> substring(name, i, 3)))"))
        .as("gram"))
      .transform(graft.operators.CacheLedger.persist)
    val nGramRows = timed("gram rows")(g.count())
    val cap = math.max(200L, nAllRows / 100)
    val admitted = g.groupBy($"gram").agg(count(lit(1)).as("df_"))
      .filter($"df_" <= cap).select($"gram")
      .transform(graft.operators.CacheLedger.persist)
    val nAdmitted = timed(s"admitted grams (df<=$cap)")(admitted.count())
    val rare = g.join(admitted, "gram")
      .transform(graft.operators.CacheLedger.persist)
    val nRareRows = timed("admitted gram rows")(rare.count())
    // block-size distribution over the ACTUAL blocking key (gram, cents):
    // rawPairs == Σ_blocks C(cnt, 2) in closed form — the number the
    // self-join below must materialize
    val blocks = rare.groupBy($"gram", $"cents").agg(count(lit(1)).as("cnt"))
      .transform(graft.operators.CacheLedger.persist)
    val blockStats = timed("block stats")(
      blocks.agg(count(lit(1)).as("n_blocks"), max($"cnt").as("max_block"),
        sum(expr("cnt * (cnt - 1) div 2")).as("pair_mass")).head())
    val rawPairs = timed("raw blocked pairs (join count)")(
      rare.as("a").join(rare.as("b"), Seq("gram", "cents"))
        .filter(col("a.id") < col("b.id")).count())
    // the gate's r12 order: lev runs MAP-SIDE on the raw join output,
    // distinct shuffles only surviving integer id pairs (the r11
    // distinct-first order shuffled every blocked pair with both name
    // strings — 264 s of the ×100 gate)
    val surv = rare.as("a").join(rare.as("b"), Seq("gram", "cents"))
      .filter(col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .transform(graft.operators.CacheLedger.persist)
    val nSurv = timed("lev survivors (raw)")(surv.count())
    val edges = surv.distinct()
      .transform(graft.operators.CacheLedger.persist)
    val nEdges = timed("distinct edges")(edges.count())
    val nClusters = timed("connected components")(
      graft.operators.ClusterDedup.connectedComponents(edges)
        .select($"cluster").distinct().count())
    graft.operators.CacheLedger.release()
    val full = timed("FULL gate (cold ledger)")(
      graft.queries.EntityQ.qGoldenRecord(spark, dir).count())
    println(s"""{"metric":"entity_probe","dir":"$dir","rows":$nAllRows,""" +
      s""""distinct_cents":$nCents,"gram_rows":$nGramRows,"df_cap":$cap,""" +
      s""""admitted_grams":$nAdmitted,"admitted_gram_rows":$nRareRows,""" +
      s""""blocks":${blockStats.getLong(0)},"max_block":${blockStats.getLong(1)},""" +
      s""""pair_mass":${blockStats.getLong(2)},""" +
      s""""raw_pairs":$rawPairs,"lev_survivors_raw":$nSurv,"edges":$nEdges,""" +
      s""""clusters":$nClusters,"full_gate_rows":$full}""")
    spark.stop()
  }
}
