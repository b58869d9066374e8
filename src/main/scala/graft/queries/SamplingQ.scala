package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave V — survey-sampling statistics: the Horvitz–Thompson
  * estimator over the library's md5-deterministic stratified sample
  * (proof that content-addressed sampling yields calibrated totals),
  * Neyman optimal allocation, importance reweighting to a target
  * language mix with effective sample size, and Cohen's kappa between
  * two deterministic raters.
  *
  * Scale design: sampling membership is a pure map-side integer
  * comparison on an md5-derived 52-bit hash (retry-stable, no RNG
  * state, exactly replayable by the oracle — the etl_stratified_sample
  * machinery); every estimator reduces to stratum-cardinality
  * sufficient statistics.
  */
object SamplingQ {

  // --------------------------------------------------- q_horvitz_thompson
  /** Stratified Bernoulli sample of orders (inclusion probability
    * π = (35−5p)/100 by priority number p) and the Horvitz–Thompson
    * total Σ y/π per stratum vs the true total. Membership is
    * hv·100 < (35−5p)·2⁵² — all longs; the per-stratum π divides a
    * single summed numerator, so the estimate is one double division.
    */
  def qHorvitzThompson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
      .select($"o_orderpriority",
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("p"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        conv(substring(md5($"o_orderkey".cast("string")), 1, 13), 16, 10)
          .cast("long").as("hv"))
      .withColumn("sampled",
        $"hv" * 100 < ($"p" * -5 + 35) * lit(4503599627370496L))
    o.groupBy($"o_orderpriority", $"p")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"sampled", 1L).otherwise(0L)).as("n_sampled"),
        sum($"cents").as("true_cents"),
        sum(when($"sampled", $"cents").otherwise(0L)).as("sampled_cents"))
      .select($"o_orderpriority", $"n_total", $"n_sampled", $"true_cents",
        expr("CAST(round(CAST(sampled_cents AS DOUBLE) * 100 / (35 - 5 * p)) AS BIGINT)")
          .as("ht_cents"),
        expr("""round(100 * (CAST(round(CAST(sampled_cents AS DOUBLE) * 100 / (35 - 5 * p)) AS BIGINT)
          |- true_cents) / CAST(true_cents AS DOUBLE), 2)"""
          .stripMargin.replace("\n", " ")).as("err_pct"))
      .orderBy($"o_orderpriority")
  }

  private val qHorvitzThompsonSql =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS p,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
      |  FROM orders),
      |f AS (SELECT *, hv * 100 < (35 - 5 * p) * 4503599627370496 AS sampled FROM o),
      |g AS (
      |  SELECT o_orderpriority, p, count(*) AS n_total,
      |    CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |    CAST(sum(cents) AS BIGINT) AS true_cents,
      |    CAST(sum(CASE WHEN sampled THEN cents ELSE 0 END) AS BIGINT) AS sampled_cents
      |  FROM f GROUP BY 1, 2)
      |SELECT o_orderpriority, n_total, n_sampled, true_cents,
      |  CAST(round(CAST(sampled_cents AS DOUBLE) * 100 / (35 - 5 * p)) AS BIGINT) AS ht_cents,
      |  round(100 * (CAST(round(CAST(sampled_cents AS DOUBLE) * 100 / (35 - 5 * p)) AS BIGINT) - true_cents) / CAST(true_cents AS DOUBLE), 2) AS err_pct
      |FROM g ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------- q_neyman_allocation
  /** Neyman allocation of a 1000-row sample budget across return-flag
    * strata: n_h = round(1000·N_h·S_h / Σ N·S). Stratum deviations
    * reduce as exact dollar-quantized longs; only the final allocation
    * is double arithmetic (identical expression both engines).
    */
  def qNeymanAllocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100").as("d"))
    val strata = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("nh"), sum($"d").as("s"), sum($"d" * $"d").as("ss"))
      .withColumn("sd", expr(
        "sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / nh) / (nh - 1))"))
      .withColumn("ns", expr("nh * sd"))
    val tot = strata.agg(sum($"ns").as("tns"))
    strata.crossJoin(broadcast(tot))
      .select($"l_returnflag", $"nh",
        expr("round(sd, 4)").as("sd_dollars"),
        expr("CAST(round(1000 * ns / tns) AS BIGINT)").as("alloc"),
        expr("round(100 * ns / tns, 4)").as("alloc_pct"))
      .orderBy($"l_returnflag")
  }

  private val qNeymanAllocationSql =
    """WITH li AS (
      |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS d
      |  FROM lineitem),
      |st AS (
      |  SELECT l_returnflag, count(*) AS nh, CAST(sum(d) AS BIGINT) AS s,
      |    CAST(sum(d * d) AS BIGINT) AS ss
      |  FROM li GROUP BY 1),
      |sd AS (
      |  SELECT *, sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / nh) / (nh - 1)) AS sd
      |  FROM st),
      |ns AS (SELECT *, nh * sd AS ns FROM sd),
      |t AS (SELECT sum(ns) AS tns FROM ns)
      |SELECT l_returnflag, nh, round(sd, 4) AS sd_dollars,
      |  CAST(round(1000 * ns / tns) AS BIGINT) AS alloc,
      |  round(100 * ns / tns, 4) AS alloc_pct
      |FROM ns, t ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------- corpus_importance_weights
  /** Importance weights that rebalance the corpus to a uniform
    * language mix: w_ℓ = (n/n_ℓ)/k, e6-quantized, with the effective
    * sample size ESS = (Σw)²/Σw² — the number that says how much the
    * reweighting actually costs. Language-cardinality state only.
    */
  def corpusImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).documents
      .groupBy($"lang").agg(count(lit(1)).as("nl"))
    val tot = per.agg(sum($"nl").as("n"), count(lit(1)).as("k"))
    val w = per.crossJoin(broadcast(tot))
      .withColumn("w_e6", expr(
        "CAST(round(1e6 * CAST(n AS DOUBLE) / nl / k) AS BIGINT)"))
    val ess = w.agg(
      sum($"nl" * $"w_e6").as("sw"),
      sum($"nl" * $"w_e6" * $"w_e6").as("sww"))
    w.crossJoin(broadcast(ess))
      .select($"lang", $"nl",
        expr("round(w_e6 / 1e6, 6)").as("weight"),
        expr("CAST(round(CAST(sw AS DOUBLE) * sw / sww) AS BIGINT)").as("ess"),
        expr("round(CAST(sw AS DOUBLE) * sw / sww / n, 4)").as("ess_fraction"))
      .orderBy($"lang")
  }

  private val corpusImportanceWeightsSql =
    """WITH per AS (SELECT lang, count(*) AS nl FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(nl) AS BIGINT) AS n, count(*) AS k FROM per),
      |w AS (
      |  SELECT lang, nl,
      |    CAST(round(1e6 * CAST(n AS DOUBLE) / nl / k) AS BIGINT) AS w_e6, n
      |  FROM per, tot),
      |e AS (
      |  SELECT CAST(sum(nl * w_e6) AS BIGINT) AS sw,
      |    CAST(sum(nl * w_e6 * w_e6) AS BIGINT) AS sww
      |  FROM w)
      |SELECT lang, nl, round(w_e6 / 1e6, 6) AS weight,
      |  CAST(round(CAST(sw AS DOUBLE) * sw / sww) AS BIGINT) AS ess,
      |  round(CAST(sw AS DOUBLE) * sw / sww / n, 4) AS ess_fraction
      |FROM w, e ORDER BY lang""".stripMargin

  // --------------------------------------------------------- q_cohens_kappa
  /** Cohen's kappa between two deterministic English raters — the
    * stopword-hit classifier (the q_confusion_metrics operating
    * point) and an ASCII-letter-fraction rater. Chance agreement
    * from the marginals; one aggregate row of exact cells.
    */
  def qCohensKappa(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = TextFns.toks($"text")
    val stops = Seq("the", "a", "and", "of", "to", "in", "is", "it")
    val d = Tables(spark, dir).documents.select(
      (size(filter(toks, t => t.isin(stops: _*))) * 10000 >= size(toks) * 1500)
        .as("ra"),
      (expr("length(regexp_replace(text, '[^A-Za-z]', ''))") * 100 >=
        expr("length(text)") * 55).as("rb"))
    d.agg(count(lit(1)).as("n"),
        sum(when($"ra" && $"rb", 1L).otherwise(0L)).as("yy"),
        sum(when($"ra" && !$"rb", 1L).otherwise(0L)).as("yn"),
        sum(when(!$"ra" && $"rb", 1L).otherwise(0L)).as("ny"),
        sum(when(!$"ra" && !$"rb", 1L).otherwise(0L)).as("nn"))
      .select($"n", $"yy", $"yn", $"ny", $"nn",
        expr("round(CAST(yy + nn AS DOUBLE) / n, 6)").as("po"),
        expr("""round((CAST(yy + yn AS DOUBLE) * (yy + ny) + CAST(ny + nn AS DOUBLE) * (yn + nn))
          |/ (CAST(n AS DOUBLE) * n), 6)"""
          .stripMargin.replace("\n", " ")).as("pe"),
        expr("""round((CAST(yy + nn AS DOUBLE) / n -
          |(CAST(yy + yn AS DOUBLE) * (yy + ny) + CAST(ny + nn AS DOUBLE) * (yn + nn)) / (CAST(n AS DOUBLE) * n)) /
          |(1.0 - (CAST(yy + yn AS DOUBLE) * (yy + ny) + CAST(ny + nn AS DOUBLE) * (yn + nn)) / (CAST(n AS DOUBLE) * n)), 6)"""
          .stripMargin.replace("\n", " ")).as("kappa"))
  }

  private val qCohensKappaSql = {
    val t = QueryDef.toksSql()
    s"""WITH d AS (
       |  SELECT
       |    len(list_filter($t, t -> t IN ('the','a','and','of','to','in','is','it'))) * 10000
       |      >= len($t) * 1500 AS ra,
       |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100 >= length(text) * 55 AS rb
       |  FROM documents),
       |m AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS yy,
       |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS yn,
       |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS ny,
       |    CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM d)
       |SELECT n, yy, yn, ny, nn,
       |  round(CAST(yy + nn AS DOUBLE) / n, 6) AS po,
       |  round((CAST(yy + yn AS DOUBLE) * (yy + ny) + CAST(ny + nn AS DOUBLE) * (yn + nn)) / (CAST(n AS DOUBLE) * n), 6) AS pe,
       |  round((CAST(yy + nn AS DOUBLE) / n - (CAST(yy + yn AS DOUBLE) * (yy + ny) + CAST(ny + nn AS DOUBLE) * (yn + nn)) / (CAST(n AS DOUBLE) * n)) / (1.0 - (CAST(yy + yn AS DOUBLE) * (yy + ny) + CAST(ny + nn AS DOUBLE) * (yn + nn)) / (CAST(n AS DOUBLE) * n)), 6) AS kappa
       |FROM m""".stripMargin
  }

  // ------------------------------------------------------ q_weighted_sample
  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Spirakis A-ES one-pass reservoir: each doc draws a
    * priority ln(u)/w (u an md5-derived uniform, w its token count),
    * and the k LARGEST priorities per source are exactly a
    * probability-∝-weight draw without replacement. Unlike the
    * Bernoulli samplers ([[graft.operators.Sample]]) this yields an
    * EXACT sample size — the contract a training-mixture budget needs
    * ("10 documents per source, long docs favored"). One scan, no
    * shuffle before the per-source bounded heap: the priority is a
    * map-side expression and the top-k runs through the native
    * GroupTopK operator, never a per-source sort — the 100 TB plan.
    * Priorities are nano-quantized (round·1e9 → BIGINT) so both
    * engines rank the same integers; u = (h+0.5)/2³² keeps ln away
    * from ln(0).
    */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
      .select($"doc_id", $"source",
        greatest(TextFns.tokenCount($"text"), lit(1L)).as("n_tokens"),
        conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .withColumn("prio_e9",
        expr("CAST(round(1e9 * ln((h + 0.5) / 4294967296.0) / n_tokens) AS BIGINT)"))
    graft.operators.TopK.native(d, Seq($"source"),
        Seq($"prio_e9".desc, $"doc_id".asc), k = 10)
      .select($"source", $"doc_id", $"n_tokens", $"rk".cast("long").as("rk"))
      .orderBy($"source", $"rk")
  }

  private val qWeightedSampleSql =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    greatest(len(${QueryDef.toksSql()}), 1) AS w,
       |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, w,
       |    CAST(round(1e9 * ln((h + 0.5) / 4294967296.0) / w) AS BIGINT) AS prio_e9
       |  FROM d),
       |r AS (
       |  SELECT doc_id, source, w,
       |    row_number() OVER (PARTITION BY source ORDER BY prio_e9 DESC, doc_id) AS rk
       |  FROM p)
       |SELECT source, doc_id, CAST(w AS BIGINT) AS n_tokens, CAST(rk AS BIGINT) AS rk
       |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_horvitz_thompson", qHorvitzThompson _, qHorvitzThompsonSql),
    QueryDef.sql("q_neyman_allocation", qNeymanAllocation _, qNeymanAllocationSql),
    QueryDef.sql("corpus_importance_weights", corpusImportanceWeights _, corpusImportanceWeightsSql),
    QueryDef.sql("q_cohens_kappa", qCohensKappa _, qCohensKappaSql),
    QueryDef.sql("q_weighted_sample", qWeightedSample _, qWeightedSampleSql))
}
