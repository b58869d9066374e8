package graft.queries

import graft.Tables
import graft.functions.{TextFns, VecFns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave M — training-ops and evaluation: the REAL BPE
  * training loop (count → argmax → merge, three genuine rounds, not
  * just the pair-count step), k-means cluster purity against the
  * corpus labels, an A/B power analysis from integer sufficient
  * statistics, a cross-table freshness SLA audit, and a weekday-
  * seasonality variance decomposition. The iterative gates unroll
  * their rounds in the oracle (the q_pagerank/q_label_prop pattern);
  * every double reduction quantizes per-term first.
  */
object EvalQ {

  // --------------------------------------------------------- text_bpe_train
  /** Three rounds of real byte-pair-encoding TRAINING: count adjacent
    * symbol pairs over the frequency-weighted vocabulary, merge the
    * argmax pair (ties to the lexicographically smaller — fully
    * deterministic), re-count, repeat. This is the tokenizer-training
    * loop itself — text_bpe_pairs is only its first half. Each round
    * emits the learned merge and the corpus symbol count after
    * applying it (monotonically decreasing — pinned in EvalSpec).
    * Merge application is a plain space-bounded string replace,
    * identical left-to-right non-overlapping semantics in both
    * engines. Scale shape: ALL state is the vocabulary table — the
    * corpus is touched once to build it; each round is one explode +
    * argmax over vocab-cardinality rows, the same saturation story as
    * text_bpe_pairs (2× corpus → ~1× work).
    */
  def textBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v0 = Tables(spark, dir).documents
      .select(explode(TextFns.toks($"text")).as("t"))
      .select(regexp_replace($"t", "[^a-z0-9]", "").as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"freq", expr("concat(regexp_replace(w, '(.)', '$1 '), '#')").as("sym"))
    var cur = v0
    val rounds = (1 to 3).map { r =>
      val pairs = cur
        .select($"freq", explode(expr(
          "transform(sequence(1, size(split(sym, ' ')) - 1), i -> concat(element_at(split(sym, ' '), i), ' ', element_at(split(sym, ' '), i + 1)))")).as("pair"))
        .groupBy($"pair").agg(sum($"freq").as("n"))
      val m = pairs.orderBy($"n".desc, $"pair").limit(1)
        .select($"pair", $"n", regexp_replace($"pair", " ", "").as("merged"))
      cur = cur.crossJoin(broadcast(m))
        .select($"freq", expr(
          "trim(replace(concat(' ', sym, ' '), concat(' ', pair, ' '), concat(' ', merged, ' ')))").as("sym"))
      val tot = cur.agg(sum($"freq" * size(split($"sym", " "))).as("total_symbols"))
      m.crossJoin(tot)
        .select(lit(r.toLong).as("round"), $"pair", $"merged", $"n", $"total_symbols")
    }
    rounds.reduce(_ unionByName _).orderBy($"round")
  }

  private val textBpeTrainSql = {
    def round(k: Int) =
      s"""p$k AS (
         |  SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
         |    SELECT freq, unnest([a[i] || ' ' || a[i + 1] for i in range(1, len(a))]) AS pair
         |    FROM (SELECT freq, string_split(sym, ' ') AS a FROM v${k - 1}))
         |  GROUP BY pair),
         |m$k AS (
         |  SELECT pair, n, replace(pair, ' ', '') AS merged
         |  FROM p$k ORDER BY n DESC, pair LIMIT 1),
         |v$k AS (
         |  SELECT freq, trim(replace(' ' || sym || ' ',
         |    ' ' || (SELECT pair FROM m$k) || ' ',
         |    ' ' || (SELECT merged FROM m$k) || ' ')) AS sym
         |  FROM v${k - 1}),
         |t$k AS (
         |  SELECT CAST(sum(freq * len(string_split(sym, ' '))) AS BIGINT) AS total_symbols
         |  FROM v$k)""".stripMargin
    s"""WITH v0 AS (
       |  SELECT freq, regexp_replace(w, '(.)', '\\1 ', 'g') || '#' AS sym FROM (
       |    SELECT w, count(*) AS freq FROM (
       |      SELECT regexp_replace(unnest(${QueryDef.toksSql()}), '[^a-z0-9]', '', 'g') AS w
       |      FROM documents)
       |    WHERE w <> '' GROUP BY w)),
       |${(1 to 3).map(round).mkString(",\n")}
       |SELECT CAST(1 AS BIGINT) AS round, pair, merged, n, total_symbols FROM m1, t1
       |UNION ALL SELECT 2, pair, merged, n, total_symbols FROM m2, t2
       |UNION ALL SELECT 3, pair, merged, n, total_symbols FROM m3, t3
       |ORDER BY round""".stripMargin
  }

  // ----------------------------------------------------- emb_cluster_purity
  /** Cluster purity of the seed-centroid assignment against the
    * corpus labels — the external-validity check for every centroid
    * index here (IVF lists, PQ codebooks, SemDeDup clusters): per
    * cluster the majority label and its share, plus the global purity
    * Σ majority / N. Assignment replays the exact emb_kmeans_step
    * rule (max cosine, ties to the smaller centroid id). Shape: the
    * 8-centroid table broadcasts, assignment is map-side, and
    * everything after is a (cluster × label)-bounded metadata table.
    */
  def embClusterPurity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
    val cents = e.orderBy($"vec_id").limit(8)
      .select($"vec_id".as("c_id"), $"embedding".as("c_v"))
    val assigned = e.select($"vec_id", $"embedding".as("v"), $"label")
      .crossJoin(broadcast(cents))
      .withColumn("c_cos", VecFns.cosine($"v", $"c_v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"c_cos".desc, $"c_id")))
      .filter($"rn" === 1)
    val cl = assigned.groupBy($"c_id".as("cluster"), $"label")
      .agg(count(lit(1)).as("c"))
    val top = cl.withColumn("r", row_number().over(
        Window.partitionBy($"cluster").orderBy($"c".desc, $"label")))
      .filter($"r" === 1)
      .select($"cluster", $"label".as("top_label"), $"c".as("top_n"))
    val nper = cl.groupBy($"cluster").agg(sum($"c").as("n"))
    val per = top.join(nper, "cluster")
    val glob = per.agg(sum($"top_n").as("sum_top"), sum($"n").as("sum_n"))
    per.crossJoin(broadcast(glob))
      .select($"cluster", $"n", $"top_label", $"top_n",
        round($"top_n".cast("double") / $"n", 4).as("top_share"),
        round($"sum_top".cast("double") / $"sum_n", 4).as("purity"))
      .orderBy($"cluster")
  }

  private val embClusterPuritySql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
      |cents AS (SELECT vec_id AS c_id, e AS ce FROM v ORDER BY vec_id LIMIT 8),
      |ac AS (
      |  SELECT vec_id, c_id,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY
      |      list_dot_product(e, ce) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(ce, ce))) DESC, c_id) AS rn
      |  FROM v, cents),
      |assigned AS (
      |  SELECT v.vec_id, c_id AS cluster, v.label
      |  FROM v JOIN ac ON v.vec_id = ac.vec_id WHERE rn = 1),
      |cl AS (SELECT cluster, label, count(*) AS c FROM assigned GROUP BY 1, 2),
      |top AS (
      |  SELECT cluster, label AS top_label, c AS top_n FROM (
      |    SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY c DESC, label) AS r
      |    FROM cl) WHERE r = 1),
      |nper AS (SELECT cluster, CAST(sum(c) AS BIGINT) AS n FROM cl GROUP BY 1),
      |per AS (SELECT t.cluster, n, top_label, top_n FROM top t JOIN nper p ON t.cluster = p.cluster),
      |gl AS (
      |  SELECT CAST(sum(top_n) AS BIGINT) AS sum_top, CAST(sum(n) AS BIGINT) AS sum_n
      |  FROM per)
      |SELECT cluster, n, top_label, top_n,
      |  round(CAST(top_n AS DOUBLE) / n, 4) AS top_share,
      |  round(CAST(sum_top AS DOUBLE) / sum_n, 4) AS purity
      |FROM per, gl ORDER BY cluster""".stripMargin

  // ------------------------------------------------------ q_power_analysis
  /** A/B power analysis from integer sufficient statistics: per-user
    * purchase totals under the even/odd split, pooled variance from
    * (n, Σx, Σx²) in exact cents, minimum detectable effect at 5% of
    * the mean, and the required per-arm sample size
    * (z₀.₀₂₅ + z₀.₂)²·2σ²/δ² — the pre-experiment guardrail next to
    * the post-hoc q_srm_check. Everything after the integer sums is
    * +,−,×,÷ on doubles (IEEE-identical in both engines); z constants
    * are literals, squared by explicit multiplication, never libm
    * pow. One map-side-combinable aggregate.
    */
  def qPowerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("x"))
      .agg(count(lit(1)).as("n"),
        sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"user_id" % 2 =!= 0, 1L).otherwise(0L)).as("n_b"),
        sum($"x").as("sx"), sum($"x" * $"x").as("sxx"))
      .withColumn("mean_c", expr("CAST(sx AS DOUBLE) / n"))
      .withColumn("var_c", expr(
        "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))"))
      .withColumn("mde_c", expr("0.05 * (CAST(sx AS DOUBLE) / n)"))
      .withColumn("required_per_arm", expr(
        "CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416) * 2.0 * ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))) / ((0.05 * (CAST(sx AS DOUBLE) / n)) * (0.05 * (CAST(sx AS DOUBLE) / n)))) AS BIGINT)"))
      .select($"n".as("n_users"), $"n_a", $"n_b",
        round($"mean_c", 2).as("mean_cents"),
        round($"var_c", 2).as("var_cents2"),
        round($"mde_c", 2).as("mde_cents"),
        $"required_per_arm",
        (least($"n_a", $"n_b") >= $"required_per_arm").as("powered"))
  }

  private val qPowerAnalysisSql =
    """WITH u AS (
      |  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM u)
      |SELECT n AS n_users, n_a, n_b,
      |  round(CAST(sx AS DOUBLE) / n, 2) AS mean_cents,
      |  round((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
      |    / (CAST(n AS DOUBLE) * (n - 1)), 2) AS var_cents2,
      |  round(0.05 * (CAST(sx AS DOUBLE) / n), 2) AS mde_cents,
      |  CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416) * 2.0 *
      |    ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1)))
      |    / ((0.05 * (CAST(sx AS DOUBLE) / n)) * (0.05 * (CAST(sx AS DOUBLE) / n)))) AS BIGINT)
      |    AS required_per_arm,
      |  least(n_a, n_b) >= CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416) * 2.0 *
      |    ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1)))
      |    / ((0.05 * (CAST(sx AS DOUBLE) / n)) * (0.05 * (CAST(sx AS DOUBLE) / n)))) AS BIGINT)
      |    AS powered
      |FROM m""".stripMargin

  // --------------------------------------------------- etl_freshness_audit
  /** Cross-table freshness SLA audit: the latest event day per fact
    * table (orders by order date, lineitem by ship date, events by
    * timestamp), each table's staleness versus the freshest table,
    * and a >30-day SLA flag — the first dashboard every data-platform
    * team builds. Three scan-bound max() aggregates unioned into a
    * 3-row metadata table; the global max rides along as a one-row
    * cross join.
    */
  def etlFreshnessAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    def one(df: DataFrame, name: String, dateCol: String) =
      df.agg(max(expr(s"unix_micros($dateCol) div 86400000000")).as("max_day"))
        .select(lit(name).as("table_name"), $"max_day")
    val per = one(t.orders, "orders", "o_orderdate")
      .unionByName(one(t.lineitem, "lineitem", "l_shipdate"))
      .unionByName(one(t.events, "events", "ts"))
    val glob = per.agg(max($"max_day").as("freshest"))
    per.crossJoin(glob)
      .select($"table_name", $"max_day",
        ($"freshest" - $"max_day").as("days_behind"),
        ($"freshest" - $"max_day" > 30).as("stale"))
      .orderBy($"table_name")
  }

  private val etlFreshnessAuditSql =
    """WITH per AS (
      |  SELECT 'orders' AS table_name,
      |    max(epoch_us(o_orderdate) // 86400000000) AS max_day FROM orders
      |  UNION ALL SELECT 'lineitem', max(epoch_us(l_shipdate) // 86400000000) FROM lineitem
      |  UNION ALL SELECT 'events', max(epoch_us(ts) // 86400000000) FROM events),
      |g AS (SELECT max(max_day) AS freshest FROM per)
      |SELECT table_name, max_day, freshest - max_day AS days_behind,
      |  freshest - max_day > 30 AS stale
      |FROM per, g ORDER BY table_name""".stripMargin

  // ---------------------------------------------- q_seasonality_strength
  /** Weekday-seasonality strength of daily purchase revenue: the
    * share of day-to-day variance explained by the day-of-week
    * (an ANOVA R² over the 7 weekday groups), plus the peak weekday.
    * Cross-multiplied exactness: n·SST = n·Σy² − (Σy)² is an exact
    * long; the per-weekday n·(Σ_g)²/n_g terms quantize to integers
    * before the 7-term sum (the mutual-info rule), and the final R²
    * is one division of longs. The whole computation is
    * day-cardinality-bounded state.
    */
  def qSeasonalityStrength(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("y"))
      .withColumn("wd", $"day" % 7)
    val tot = daily.agg(count(lit(1)).as("n"), sum($"y").as("sy"),
      sum($"y" * $"y").as("syy"))
    val grp = daily.groupBy($"wd")
      .agg(count(lit(1)).as("ng"), sum($"y").as("sg"))
    val ssb = grp.crossJoin(tot)
      .select($"wd", $"ng", $"sg", $"n", $"sy", $"syy",
        expr("CAST(round(n * (CAST(sg AS DOUBLE) * sg) / ng) AS BIGINT)").as("tg"))
    val peak = ssb.orderBy((expr("CAST(sg AS DOUBLE) / ng")).desc, $"wd").limit(1)
      .select($"wd".as("peak_weekday"),
        round(expr("CAST(sg AS DOUBLE) / ng"), 2).as("peak_mean_cents"))
    ssb.agg(max($"n").as("n_days"),
        (sum($"tg") - max($"sy") * max($"sy")).as("n_ssb"),
        (max($"n") * max($"syy") - max($"sy") * max($"sy")).as("n_sst"))
      .crossJoin(peak)
      .select($"n_days", round(expr("CAST(n_ssb AS DOUBLE) / n_sst"), 6).as("r2_weekday"),
        $"peak_weekday", $"peak_mean_cents")
  }

  private val qSeasonalityStrengthSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |d2 AS (SELECT day, y, day % 7 AS wd FROM daily),
      |tot AS (
      |  SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM d2),
      |grp AS (SELECT wd, count(*) AS ng, CAST(sum(y) AS BIGINT) AS sg FROM d2 GROUP BY wd),
      |ssb AS (
      |  SELECT wd, ng, sg, n, sy, syy,
      |    CAST(round(n * (CAST(sg AS DOUBLE) * sg) / ng) AS BIGINT) AS tg
      |  FROM grp, tot),
      |peak AS (
      |  SELECT wd AS peak_weekday, round(CAST(sg AS DOUBLE) / ng, 2) AS peak_mean_cents
      |  FROM ssb ORDER BY CAST(sg AS DOUBLE) / ng DESC, wd LIMIT 1),
      |fin AS (
      |  SELECT max(n) AS n_days,
      |    CAST(sum(tg) AS BIGINT) - max(sy) * max(sy) AS n_ssb,
      |    max(n) * max(syy) - max(sy) * max(sy) AS n_sst
      |  FROM ssb)
      |SELECT n_days, round(CAST(n_ssb AS DOUBLE) / n_sst, 6) AS r2_weekday,
      |  peak_weekday, peak_mean_cents
      |FROM fin, peak""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("text_bpe_train", textBpeTrain _, textBpeTrainSql),
    QueryDef.sql("emb_cluster_purity", embClusterPurity _, embClusterPuritySql),
    QueryDef.sql("q_power_analysis", qPowerAnalysis _, qPowerAnalysisSql),
    QueryDef.sql("etl_freshness_audit", etlFreshnessAudit _, etlFreshnessAuditSql),
    QueryDef.sql("q_seasonality_strength", qSeasonalityStrength _, qSeasonalityStrengthSql))
}
