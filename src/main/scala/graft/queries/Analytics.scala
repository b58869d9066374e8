package graft.queries

import graft.Tables
import graft.operators.BloomJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 analytics/pipeline additions: Bloom-pruned joins, CDC
  * snapshot diff, fixed-width histograms, grouped correlation
  * statistics, and per-label embedding feature scaling — each with an
  * exact DuckDB oracle (the Bloom gate replays the md5 double-hash
  * position set in SQL).
  */
object Analytics {

  private val BloomBits = 1 << 16
  private val BloomK = 3

  /** Bloom-pruned join: orders filtered by a broadcast 64 Kbit bitmap
    * of one market segment's customer keys, then exactly joined —
    * reporting per priority how many rows passed the bitmap vs how
    * many truly match. false negatives are impossible, so
    * bloom_pass >= true_match always; the gap IS the false-positive
    * set, deterministic on both engines because positions derive from
    * md5. Scale: the probe side is filtered during its scan — no
    * shuffle until after pruning.
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val building = t.customer.filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val passed = BloomJoin.prune(t.orders, building,
      "o_custkey", "c_custkey", BloomBits, BloomK)
    passed
      .join(broadcast(building.select($"c_custkey".as("ck"))),
        $"o_custkey" === $"ck", "left")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("bloom_pass"), count($"ck").as("true_match"))
      .orderBy($"o_orderpriority")
  }

  private val qBloomJoinSql =
    s"""WITH bkeys AS (
       |  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS ks
       |  FROM customer WHERE c_mktsegment = 'BUILDING'),
       |bh AS (
       |  SELECT CAST(('0x' || substr(md5(ks), 1, 15))::UBIGINT % $BloomBits AS BIGINT) AS h1,
       |         CAST(('0x' || substr(md5(ks), 17, 15))::UBIGINT % ${BloomBits - 1} + 1 AS BIGINT) AS step
       |  FROM bkeys),
       |bits AS (SELECT DISTINCT (h1 + i * step) % $BloomBits AS pos
       |         FROM bh, range(0, $BloomK) t(i)),
       |oh AS (
       |  SELECT o_orderkey, o_custkey, o_orderpriority,
       |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::UBIGINT % $BloomBits AS BIGINT) AS h1,
       |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 17, 15))::UBIGINT % ${BloomBits - 1} + 1 AS BIGINT) AS step
       |  FROM orders),
       |opos AS (SELECT o_orderkey, o_custkey, o_orderpriority,
       |           (h1 + i * step) % $BloomBits AS pos
       |         FROM oh, range(0, $BloomK) t(i)),
       |pass AS (SELECT o_orderkey, any_value(o_custkey) AS o_custkey,
       |           any_value(o_orderpriority) AS o_orderpriority
       |         FROM opos JOIN bits USING (pos)
       |         GROUP BY o_orderkey HAVING count(*) = $BloomK)
       |SELECT o_orderpriority, count(*) AS bloom_pass,
       |  CAST(count(c.c_custkey) AS BIGINT) AS true_match
       |FROM pass LEFT JOIN (SELECT c_custkey FROM customer
       |                     WHERE c_mktsegment = 'BUILDING') c
       |  ON pass.o_custkey = c.c_custkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** CDC snapshot diff: the current snapshot is a deterministic
    * mutation of the base (keys ≡0 mod 97 deleted, balances ≡0 mod 7
    * bumped, keys ≡0 mod 13 re-inserted shifted), and the diff is ONE
    * full-outer join on (key, row digest) — the join carries 40-byte
    * rows however wide the table is. Gate returns the non-unchanged
    * rows.
    */
  def etlSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables(spark, dir).customer
    val mutated = base
      .filter($"c_custkey" % 97 =!= 0)
      .withColumn("c_acctbal",
        when($"c_custkey" % 7 === 0, $"c_acctbal" + 100.0).otherwise($"c_acctbal"))
    val inserted = base.filter($"c_custkey" % 13 === 0)
      .withColumn("c_custkey", $"c_custkey" + 10000000L)
    val current = mutated.unionByName(inserted)
    graft.etl.SnapshotDiff.diff(base, current, "c_custkey",
      Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .filter($"status" =!= "unchanged")
      .orderBy($"status", $"c_custkey")
  }

  private val etlSnapshotDiffSql =
    """WITH cur AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 97 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 13 = 0),
      |d AS (
      |  SELECT coalesce(b.c_custkey, cur.c_custkey) AS c_custkey,
      |    CASE WHEN b.c_custkey IS NULL THEN 'inserted'
      |         WHEN cur.c_custkey IS NULL THEN 'deleted'
      |         WHEN (b.c_name IS DISTINCT FROM cur.c_name)
      |           OR (b.c_nationkey IS DISTINCT FROM cur.c_nationkey)
      |           OR (b.c_acctbal IS DISTINCT FROM cur.c_acctbal)
      |           OR (b.c_mktsegment IS DISTINCT FROM cur.c_mktsegment)
      |           THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM customer b FULL OUTER JOIN cur ON b.c_custkey = cur.c_custkey)
      |SELECT c_custkey, status FROM d WHERE status <> 'unchanged'
      |ORDER BY status, c_custkey""".stripMargin

  /** Fixed-width histogram of a measure — the profiling primitive:
    * bucket index is integer arithmetic on the scan (codegen'd, no
    * UDF), one narrow aggregate shuffle of at most #buckets groups.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .select((floor($"l_extendedprice" / 5000.0)).cast("long").as("bucket"),
        $"l_extendedprice")
      .groupBy($"bucket")
      // exact-cents bucket sums: ~20 buckets over the whole fact table
      // (see QueryDef.cents / q1PricingSummary)
      .agg(count(lit(1)).as("cnt"),
        round(QueryDef.exactSum(QueryDef.cents($"l_extendedprice")) / 100.0, 4)
          .as("bucket_sum"))
      .orderBy($"bucket")
  }

  private val qHistogramSql =
    """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
      |  count(*) AS cnt,
      |  round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0, 4)
      |    AS bucket_sum
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Grouped correlation statistics — Pearson corr, population
    * covariance and stddevs per group in ONE aggregate pass (all
    * co-moment accumulators, map-side combinable).
    */
  def qCorrStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("qty_price_corr"),
        round(covar_pop($"l_quantity", $"l_extendedprice"), 4).as("qty_price_covar"),
        round(stddev_pop($"l_quantity"), 4).as("qty_stddev"),
        round(stddev_pop($"l_extendedprice"), 4).as("price_stddev"))
      .orderBy($"l_returnflag")
  }

  private val qCorrStatsSql =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
      |  round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
      |  round(stddev_pop(l_quantity), 4) AS qty_stddev,
      |  round(stddev_pop(l_extendedprice), 4) AS price_stddev
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Per-label feature scaling (z-score) of the leading embedding
    * dimensions: per-(label, dim) moments from one aggregate over the
    * exploded slice, broadcast back onto the vectors. The stats table
    * is labels × dims — broadcastable at any corpus size; the explode
    * is bounded to the audited dims, not all 64.
    */
  def embFeatureScale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
      .select($"vec_id", $"label", posexplode(slice($"embedding", 1, 4)))
      .select($"vec_id", $"label", ($"pos" + 1).cast("long").as("dim"),
        $"col".cast("double").as("x"))
    val stats = e.groupBy($"label", $"dim")
      .agg(avg($"x").as("m"), stddev_pop($"x").as("s"))
    e.join(broadcast(stats), Seq("label", "dim"))
      .select($"vec_id", $"dim", round(($"x" - $"m") / $"s", 4).as("z"))
      .orderBy($"vec_id", $"dim")
  }

  private val embFeatureScaleSql =
    """WITH e AS (
      |  SELECT vec_id, label, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings, range(1, 5) t(i)),
      |stats AS (
      |  SELECT label, dim, avg(x) AS m, stddev_pop(x) AS s
      |  FROM e GROUP BY 1, 2)
      |SELECT vec_id, dim, round((x - m) / s, 4) AS z
      |FROM e JOIN stats USING (label, dim)
      |ORDER BY vec_id, dim""".stripMargin

  /** PageRank over the supplier→customer trade graph (who supplies
    * whom, observed from shipped lines), 5 power iterations at
    * damping 0.85 through [[graft.operators.PageRank]]. The oracle
    * unrolls the identical iterations in SQL — pinning the iterative
    * join+aggregate loop end to end. Output: every node's rank.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val edges = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .select(concat(lit("s"), $"l_suppkey").as("src"),
        concat(lit("c"), $"o_custkey").as("dst"))
      .distinct()
    // gate emits the N-RELATIVE rank (r·N ≈ O(1)): same 1e-4 rounding
    // granularity vs ~1e-13 summation noise as every other summing
    // gate — round(raw rank, 8) would sit only ~1e-7 above the noise
    graft.operators.PageRank.run(edges, iters = 5, damping = 0.85)
      .select($"node", round($"r" * $"n", 4).as("r_rel"))
      .orderBy($"node")
  }

  private val qPagerankSql = {
    def contrib(prev: String, k: Int) =
      s"""c$k AS (SELECT dst, sum(r / deg) AS contrib
         |  FROM edges JOIN deg USING (src) JOIN $prev ON $prev.node = edges.src
         |  GROUP BY dst),
         |r$k AS (SELECT nodes.node AS node,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
         |      + 0.85 * coalesce(contrib, 0.0) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.node = c$k.dst)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
       |                  'c' || CAST(o_custkey AS VARCHAR) AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),
       |${(1 to 5).map(k => contrib(s"r${k - 1}", k)).mkString(",\n")}
       |SELECT node, round(r * n, 4) AS r_rel FROM r5 CROSS JOIN nn ORDER BY node""".stripMargin
  }

  /** Cohort retention over the event stream: users bucketed by their
    * first-activity week, activity weeks diffed against the cohort —
    * the product-analytics staple. Two aggregates (first-touch per
    * user, then the cohort×offset matrix), both map-side combinable;
    * week arithmetic is integer epoch math, identical in any engine.
    */
  def qRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val week = 604800000000L // microseconds
    val ev = Tables(spark, dir).events
    val firstWeek = ev.groupBy($"user_id")
      .agg(floor(unix_micros(min($"ts")) / week).as("cohort_week"))
    val activeWeeks = ev
      .select($"user_id", floor(unix_micros($"ts") / week).as("w"))
      .distinct()
    activeWeeks.join(firstWeek, "user_id")
      .groupBy($"cohort_week", ($"w" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  private val qRetentionCohortSql =
    """WITH fw AS (
      |  SELECT user_id,
      |    CAST(floor(epoch_us(min(ts)) / 604800000000) AS BIGINT) AS cohort_week
      |  FROM events GROUP BY user_id),
      |aw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS w
      |  FROM events)
      |SELECT cohort_week, w - cohort_week AS week_offset, count(*) AS active_users
      |FROM aw JOIN fw USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Unpivot / melt — the inverse of `q_pivot`: wide measure columns
    * to (measure, value) rows through the native Unpivot node (an
    * Expand — rows × measures emitted scan-side, no shuffle at all
    * before the caller's aggregate).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .filter($"l_orderkey" <= 100)
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount"),
        "measure", "value")
      .select($"l_orderkey", $"l_linenumber", $"measure", round($"value", 4).as("value"))
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }

  private val qUnpivotSql =
    """SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value
      |FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
      |  FROM lineitem WHERE l_orderkey <= 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      |  FROM lineitem WHERE l_orderkey <= 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey <= 100)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** Schema evolution: two parquet batches written with different
    * column sets (v2 adds a column, drops another) read back as ONE
    * table via mergeSchema — the lake-format reality every long-lived
    * pipeline hits. The oracle reconstructs the same union with NULL
    * padding from the source table.
    */
  // The two-batch evolution fixture is deterministic per source dir;
  // write it once per JVM so repeated invocations (bench iterations)
  // time the mergeSchema READ, not the fixture setup.
  private val evolveWritten = scala.collection.mutable.Set.empty[String]

  def etlMergeSchema(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = Tables(spark, dir).nation
    val out = s"/tmp/graft_evolve_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    evolveWritten.synchronized {
      if (!evolveWritten.contains(out)) {
        n.select($"n_nationkey", $"n_name")
          .write.mode("overwrite").parquet(s"$out/batch=1")
        n.select($"n_nationkey", $"n_regionkey")
          .write.mode("overwrite").parquet(s"$out/batch=2")
        evolveWritten += out
      }
    }
    spark.read.option("mergeSchema", "true").parquet(out)
      .select($"n_nationkey", $"n_name", $"n_regionkey", $"batch".cast("long").as("batch"))
      .orderBy($"batch", $"n_nationkey")
  }

  private val etlMergeSchemaSql =
    """SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey,
      |  CAST(1 AS BIGINT) AS batch FROM nation
      |UNION ALL
      |SELECT n_nationkey, CAST(NULL AS VARCHAR), n_regionkey, CAST(2 AS BIGINT) FROM nation
      |ORDER BY batch, n_nationkey""".stripMargin

  /** Unigram language-model scoring (the CCNet-style perplexity proxy
    * used for corpus quality filtering): p(tok) from corpus counts,
    * each document scored by its mean token log-probability. The LM
    * table aggregates to VOCABULARY cardinality — unbounded on web
    * text — so the join back carries no broadcast hint: AQE
    * broadcasts when the measured size is small, else sort-merge
    * (skew-split on hot tokens). Only the 1-row grand total is
    * hint-broadcast. PlanSpec pins both shapes.
    */
  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // single corpus pass: per-(doc, token) counts feed BOTH the LM
    // build (vocabulary sums) and the per-doc weighted mean — the
    // token instances are never exploded twice
    val tf = Tables(spark, dir).documents
      .select($"doc_id", explode(graft.functions.TextFns.toks($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val lm = tf.groupBy($"tok").agg(sum($"tf").as("c"))
    val total = lm.agg(sum($"c").cast("double").as("n"))
    tf
      .join(lm, "tok")
      .crossJoin(broadcast(total))
      .groupBy($"doc_id")
      .agg(round(sum($"tf" * log($"c" / $"n")) / sum($"tf"), 4).as("lm_score"))
      .orderBy($"doc_id")
  }

  private val textLmScoreSql =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(${QueryDef.toksSql()}) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
      |lm AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY tok),
      |total AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM lm)
      |SELECT doc_id, round(sum(tf * ln(c / n)) / sum(tf), 4) AS lm_score
      |FROM tf JOIN lm USING (tok) CROSS JOIN total
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Deterministic corpus shuffle + first-batch take: order by a
    * seeded md5 of the id and keep the first N — how a training run
    * draws a reproducible shuffled batch. Plans as
    * TakeOrderedAndProject (per-partition heaps), NEVER a global
    * sort; the full shuffle-ordered write would repartitionByRange on
    * the same key.
    */
  def etlShuffleBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id", md5(concat(lit("shuffle42:"), $"doc_id")).as("shuffle_key"))
      .orderBy($"shuffle_key")
      .limit(100)
  }

  private val etlShuffleBatchSql =
    """SELECT doc_id, md5('shuffle42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |FROM documents
      |ORDER BY shuffle_key
      |LIMIT 100""".stripMargin

  /** Array higher-order functions over the embedding column — the
    * codegen-adjacent lambda surface (transform/filter/aggregate):
    * L2 norm via an in-order fold (both engines fold left-to-right,
    * so the doubles agree bit for bit), positive-component count,
    * component max. Pure projection: scales with the scan, no
    * shuffle, no explode.
    */
  def qArrayOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).embeddings
      .select($"vec_id",
        round(sqrt(expr(
          "aggregate(embedding, 0.0D, (acc, x) -> acc + cast(x as double) * cast(x as double))")), 4)
          .as("l2_norm"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        round(expr("cast(array_max(embedding) as double)"), 4).as("max_val"))
      .orderBy($"vec_id")
  }

  private val qArrayOpsSql =
    """SELECT vec_id,
      |  round(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
      |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
      |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** Triangle count over the bulk co-purchase graph (parts sharing an
    * order's l_quantity >= 40 lines are adjacent): per-order part
    * pairs are bounded by the ~7 lines/order, the distinct edge set
    * is one shuffle, and the wedge/closing joins run on the
    * degree-ORIENTED edge list (see [[graft.operators.Triangles]]) so
    * no hub vertex can square the join. The quantity slice keeps the
    * GATE's graph at gate scale (the synthetic lake reuses one part
    * dimension, so unfiltered replication densifies the graph itself
    * — a measurement artifact, not an operator property; real
    * corpora grow the vertex set with the data). Pure integer
    * output — exact at any SF by construction.
    */
  private def bulkCoPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .filter($"l_quantity" >= 40)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p"))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
  }

  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Triangles.count(bulkCoPurchaseEdges(spark, dir), "u", "v")

  /** Per-node triangle participation over the same graph: n_tri and
    * the integer wedge denominator d(d−1)/2 — the local clustering
    * coefficient without a single FP operation, so the top-20 ranking
    * (n_tri desc, node) is exact on any engine.
    */
  def qClusteringCoef(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Triangles.perNode(bulkCoPurchaseEdges(spark, dir), "u", "v")
      .orderBy($"n_tri".desc, $"node")
      .limit(20)
  }

  private val qClusteringCoefSql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |deg AS (SELECT x, count(*) AS d FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
      |o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.u ELSE e.v END AS s,
      |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.v ELSE e.u END AS t
      |      FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
      |w AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c FROM o e1 JOIN o e2 ON e1.t = e2.s),
      |tri AS (SELECT a, b, c FROM w JOIN o e3 ON w.a = e3.s AND w.c = e3.t),
      |cr AS (SELECT x, count(*) AS n_tri FROM (
      |         SELECT a AS x FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
      |       GROUP BY x)
      |SELECT deg.x AS node, coalesce(cr.n_tri, 0) AS n_tri,
      |  CAST(deg.d * (deg.d - 1) // 2 AS BIGINT) AS n_wedges
      |FROM deg LEFT JOIN cr ON cr.x = deg.x
      |ORDER BY n_tri DESC, node LIMIT 20""".stripMargin

  /** Degree assortativity of the co-purchase graph — the one-number
    * answer to "do hubs link to hubs?" (positive: social-like;
    * negative: hub-and-spoke), next to the local view q_clustering_coef
    * gives per node. Pearson's r over the (deg(u), deg(v)) pairs of
    * every edge endpoint, BOTH directions (the standard undirected
    * convention). Degrees are exact integers, the five co-moment sums
    * are map-side-combinable longs, and r's final-mile arithmetic
    * runs on exact longs cast to double — the q_ols_multi recipe on a
    * graph. Scale: one groupBy for degrees, one join edge→degree per
    * side, one global aggregate; no step exceeds O(edges).
    */
  def qAssortativity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = bulkCoPurchaseEdges(spark, dir)
    val both = e.select($"u".as("src"), $"v".as("dst"))
      .unionByName(e.select($"v".as("src"), $"u".as("dst")))
    val deg = both.groupBy($"src".as("x")).agg(count(lit(1)).as("d"))
    val pairs = both
      .join(deg.select($"x".as("src"), $"d".as("dx")), "src")
      .join(deg.select($"x".as("dst"), $"d".as("dy")), "dst")
    pairs.agg(count(lit(1)).as("m2"),
        sum($"dx").as("sx"), sum($"dx" * $"dy").as("sxy"),
        sum($"dx" * $"dx").as("sxx"))
      .select(($"m2" / 2).cast("long").as("n_edges"),
        round((($"m2" * $"sxy" - $"sx" * $"sx").cast("double") /
          ($"m2" * $"sxx" - $"sx" * $"sx").cast("double")), 6).as("assortativity"))
  }

  private val qAssortativitySql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |both_dir AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
      |deg AS (SELECT src AS x, count(*) AS d FROM both_dir GROUP BY 1),
      |p AS (
      |  SELECT du.d AS dx, dv.d AS dy
      |  FROM both_dir JOIN deg du ON du.x = both_dir.src
      |  JOIN deg dv ON dv.x = both_dir.dst),
      |s AS (SELECT count(*) AS m2, CAST(sum(dx) AS BIGINT) AS sx,
      |  CAST(sum(dx * dy) AS BIGINT) AS sxy, CAST(sum(dx * dx) AS BIGINT) AS sxx FROM p)
      |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
      |  round(CAST(m2 * sxy - sx * sx AS DOUBLE) / CAST(m2 * sxx - sx * sx AS DOUBLE), 6) AS assortativity
      |FROM s""".stripMargin

  /** Multi-source BFS hop distances over the same co-purchase graph
    * (r6, [[graft.operators.Bfs]]): the 3 lowest-id nodes seed at
    * distance 0, four frontier-expansion rounds settle everything
    * within 4 hops. Work per round is O(edges incident to the
    * frontier) — a node expands exactly once — and each frontier is
    * lazily localCheckpointed (the ClusterDedup lineage rule). The
    * DuckDB oracle unrolls the identical 4 rounds in SQL, so the
    * iterative loop is exactly hash-matched like q_pagerank's.
    */
  def qShortestPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = bulkCoPurchaseEdges(spark, dir)
    val sources = e.select($"u".as("node"))
      .unionByName(e.select($"v".as("node")))
      .distinct().orderBy($"node").limit(3)
    graft.operators.Bfs.distances(e, sources, rounds = 4)
      .orderBy($"dist", $"node")
  }

  private val qShortestPathsSql = {
    val rounds = 4
    val head =
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |src AS (SELECT x AS node FROM (SELECT u AS x FROM e UNION SELECT v AS x FROM e) ORDER BY x LIMIT 3),
        |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM src)""".stripMargin
    val iters = (1 to rounds).map { r =>
      s"""d$r AS (SELECT * FROM d${r - 1} UNION ALL
         |  SELECT n.node, CAST($r AS BIGINT) AS dist FROM (
         |    SELECT DISTINCT s.v AS node FROM sym s
         |    JOIN d${r - 1} f ON f.node = s.u AND f.dist = ${r - 1}) n
         |  WHERE NOT EXISTS (SELECT 1 FROM d${r - 1} x WHERE x.node = n.node))""".stripMargin
    }
    head + iters.mkString(",\n", ",\n", "") +
      s"\nSELECT node, dist FROM d$rounds ORDER BY dist, node"
  }

  /** Double-sweep eccentricity / diameter lower bound (r7 s5): the
    * standard diameter estimator — BFS from an arbitrary node (the
    * min id), then BFS again from the farthest node found; the second
    * eccentricity is a tight diameter lower bound on most real
    * graphs, at the cost of exactly TWO BFS runs however large the
    * graph (each O(edges·rounds), the [[graft.operators.Bfs]]
    * frontier contract; hop budget 4 declared, like
    * q_shortest_paths). The peak-node argmax between sweeps stays
    * in-plan (orderBy+limit — never a driver collect); ties break by
    * min node so the whole composition is deterministic and the
    * oracle unrolls both sweeps.
    */
  def qGraphEcc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached across the TWO sweeps: each Bfs run symmetrizes its own
    // copy, but the underlying co-purchase self-join computes once
    val e = graft.operators.CacheLedger.persist(bulkCoPurchaseEdges(spark, dir))
    val start = e.select($"u".as("node"))
      .unionByName(e.select($"v".as("node")))
      .agg(min($"node").as("node"))
    val d1 = graft.operators.Bfs.distances(e, start, rounds = 4)
    val peak1 = d1.orderBy($"dist".desc, $"node").limit(1)
    val d2 = graft.operators.Bfs.distances(e,
      peak1.select($"node"), rounds = 4)
    val peak2 = d2.orderBy($"dist".desc, $"node").limit(1)
    start.select($"node".as("start_node"))
      .crossJoin(peak1.select($"node".as("peak1"), $"dist".as("ecc1")))
      .crossJoin(peak2.select($"node".as("peak2"), $"dist".as("diameter_lb")))
  }

  private val qGraphEccSql = {
    // AS MATERIALIZED is load-bearing: DuckDB re-evaluates plain CTEs
    // per reference, and the doubly-chained sweeps would re-open the
    // parquet scan exponentially ("too many open files")
    val head =
      """WITH li AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
        |e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        |sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)""".stripMargin
    def sweep(tag: String, srcCte: String): String = {
      val d0 = s"""${tag}0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS dist FROM $srcCte)"""
      val iters = (1 to 4).map { r =>
        s"""$tag$r AS MATERIALIZED (SELECT * FROM $tag${r - 1} UNION ALL
           |  SELECT n.node, CAST($r AS BIGINT) AS dist FROM (
           |    SELECT DISTINCT s.v AS node FROM sym s
           |    JOIN $tag${r - 1} f ON f.node = s.u AND f.dist = ${r - 1}) n
           |  WHERE NOT EXISTS (SELECT 1 FROM $tag${r - 1} x WHERE x.node = n.node))""".stripMargin
      }
      (d0 +: iters).mkString(",\n")
    }
    head + ",\n" +
      "src1 AS (SELECT min(x) AS node FROM (SELECT u AS x FROM e UNION SELECT v FROM e)),\n" +
      sweep("a", "src1") + ",\n" +
      "p1 AS (SELECT node, dist FROM a4 ORDER BY dist DESC, node LIMIT 1),\n" +
      "src2 AS (SELECT node FROM p1),\n" +
      sweep("b", "src2") + ",\n" +
      "p2 AS (SELECT node, dist FROM b4 ORDER BY dist DESC, node LIMIT 1)\n" +
      """SELECT src1.node AS start_node, p1.node AS peak1, p1.dist AS ecc1,
        |  p2.node AS peak2, p2.dist AS diameter_lb
        |FROM src1, p1, p2""".stripMargin
  }

  /** k-core peeling over the co-purchase graph (r6,
    * [[graft.operators.KCore]]): 3 rounds of drop-degree-<4 — the
    * dense-subgraph seed every community/spam-cluster pipeline
    * starts from. The edge list only shrinks, so round cost is
    * monotonically decreasing; the DuckDB oracle unrolls the
    * identical 3 rounds (the q_pagerank/q_shortest_paths pattern).
    */
  def qKcore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.KCore.peel(bulkCoPurchaseEdges(spark, dir), k = 4, rounds = 3)
      .orderBy($"node")
  }

  private val qKcoreSql = {
    val (k, rounds) = (4, 3)
    val head =
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
        |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p)""".stripMargin
    val iters = (1 to rounds).map { r =>
      s"""k$r AS (SELECT x FROM (
         |    SELECT x, count(*) AS d FROM (
         |      SELECT u AS x FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1})
         |    GROUP BY x) WHERE d >= $k),
         |e$r AS (SELECT u, v FROM e${r - 1}
         |        WHERE u IN (SELECT x FROM k$r) AND v IN (SELECT x FROM k$r))""".stripMargin
    }
    head + iters.mkString(",\n", ",\n", "") +
      s"""
         |SELECT x AS node, count(*) AS deg FROM (
         |  SELECT u AS x FROM e$rounds UNION ALL SELECT v FROM e$rounds)
         |GROUP BY x ORDER BY node""".stripMargin
  }

  private val qTrianglesSql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |deg AS (SELECT x, count(*) AS d FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
      |o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.u ELSE e.v END AS s,
      |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.v ELSE e.u END AS t
      |      FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
      |w AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c FROM o e1 JOIN o e2 ON e1.t = e2.s)
      |SELECT count(*) AS n_triangles FROM w JOIN o e3 ON w.a = e3.s AND w.c = e3.t""".stripMargin

  /** Top-50 most-similar part pairs by neighbor-set Jaccard over the
    * co-purchase graph ([[graft.operators.NeighborJaccard]]) — the
    * link-prediction primitive next to `q_triangles`. Wedge
    * generation is keyed on the middle vertex with a degree cap
    * (declared semantics, replayed by the oracle — the ngram DF-cap
    * rule), so per-key fan-out is bounded at cap² and no hub can
    * square the join. Jaccard divides two exact integers; the
    * ranking tiebreaks on (u, v).
    */
  def qJaccardNeighbors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.NeighborJaccard
      .pairs(bulkCoPurchaseEdges(spark, dir), "u", "v",
        minCommon = 3, maxMiddleDegree = 64)
      .orderBy($"jaccard".desc, $"u", $"v")
      .limit(50)
  }

  private val qJaccardNeighborsSql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem WHERE l_quantity >= 40),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |adj AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v AS w, u AS n FROM e),
      |deg AS (SELECT n AS x, count(*) AS d FROM adj GROUP BY n),
      |mid AS (SELECT a.w, a.n FROM adj a JOIN deg dw ON dw.x = a.w AND dw.d <= 64),
      |common AS (
      |  SELECT a.n AS u, b.n AS v, count(*) AS common
      |  FROM mid a JOIN mid b ON a.w = b.w AND a.n < b.n
      |  GROUP BY a.n, b.n HAVING count(*) >= 3)
      |SELECT c.u, c.v, c.common, du.d AS du, dv.d AS dv,
      |  round(c.common / (du.d + dv.d - c.common), 4) AS jaccard
      |FROM common c JOIN deg du ON du.x = c.u JOIN deg dv ON dv.x = c.v
      |ORDER BY jaccard DESC, c.u, c.v LIMIT 50""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_triangles", qTriangles _, qTrianglesSql),
    QueryDef.sql("q_jaccard_neighbors", qJaccardNeighbors _, qJaccardNeighborsSql),
    QueryDef.sql("q_clustering_coef", qClusteringCoef _, qClusteringCoefSql),
    QueryDef.sql("q_shortest_paths", qShortestPaths _, qShortestPathsSql),
    QueryDef.sql("q_graph_ecc", qGraphEcc _, qGraphEccSql),
    QueryDef.sql("q_kcore", qKcore _, qKcoreSql),
    QueryDef.sql("q_assortativity", qAssortativity _, qAssortativitySql),
    QueryDef.sql("q_array_ops", qArrayOps _, qArrayOpsSql),
    QueryDef.sql("q_unpivot", qUnpivot _, qUnpivotSql),
    QueryDef.sql("etl_merge_schema", etlMergeSchema _, etlMergeSchemaSql),
    QueryDef.sql("text_lm_score", textLmScore _, textLmScoreSql),
    QueryDef.sql("etl_shuffle_batch", etlShuffleBatch _, etlShuffleBatchSql),
    QueryDef.sql("q_pagerank", qPagerank _, qPagerankSql),
    QueryDef.sql("q_retention_cohort", qRetentionCohort _, qRetentionCohortSql),
    QueryDef.sql("q_bloom_join", qBloomJoin _, qBloomJoinSql),
    QueryDef.sql("etl_snapshot_diff", etlSnapshotDiff _, etlSnapshotDiffSql),
    QueryDef.sql("q_histogram", qHistogram _, qHistogramSql),
    QueryDef.sql("q_corr_stats", qCorrStats _, qCorrStatsSql),
    QueryDef.sql("emb_feature_scale", embFeatureScale _, embFeatureScaleSql))
}
