package graft.queries

import graft.Tables
import graft.functions.UrlFns
import graft.operators.DomainOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain/URL-aware corpus curation gates (SURVEY.md §2.5 extension):
  * host extraction, per-domain caps, and domain-level mixing — the
  * per-SITE controls a web-scale training pipeline applies before any
  * per-document filter. Documents get a deterministic synthetic URL
  * (scheme/www/port/path/query shapes all varied by doc_id), so the
  * DuckDB oracle can reconstruct every parsed field from ground truth
  * — the parser must exactly invert the synthesis.
  */
object CorpusQ {

  /** CASE lang → TLD, the ground truth the host parser must recover. */
  private def tldExpr(lang: org.apache.spark.sql.Column) =
    when(lang === "en", lit("com")).when(lang === "de", lit("org"))
      .when(lang === "fr", lit("net")).when(lang === "es", lit("io"))
      .otherwise(lit("cn"))

  private val tldSql =
    "CASE lang WHEN 'en' THEN 'com' WHEN 'de' THEN 'org' WHEN 'fr' THEN 'net' " +
      "WHEN 'es' THEN 'io' ELSE 'cn' END"

  /** Deterministic URL per document, shape-varied by doc_id so every
    * parser branch is exercised: http/https, www or bare, explicit
    * port, deep paths, query strings.
    */
  private def withUrl(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.withColumn("url", concat(
      when(pmod($"doc_id", lit(3)) === 0, lit("http")).otherwise(lit("https")),
      lit("://"),
      when(pmod($"doc_id", lit(2)) === 0, lit("www.")).otherwise(lit("")),
      $"source", lit(".example."), tldExpr($"lang"),
      when(pmod($"doc_id", lit(5)) === 0, lit(":8080")).otherwise(lit("")),
      lit("/"), $"lang", lit("/p"), pmod($"doc_id", lit(7)).cast("string"),
      when(pmod($"doc_id", lit(6)) === 0, lit("/deep")).otherwise(lit("")),
      lit("/"), $"doc_id".cast("string"), lit(".html"),
      when(pmod($"doc_id", lit(4)) === 0, lit("?ref=rss")).otherwise(lit(""))))
  }

  private val urlSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END || '://'
      | || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
      | || source || '.example.' || TLD
      | || CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END
      | || '/' || lang || '/p' || CAST(doc_id % 7 AS VARCHAR)
      | || CASE WHEN doc_id % 6 = 0 THEN '/deep' ELSE '' END
      | || '/' || CAST(doc_id AS VARCHAR) || '.html'
      | || CASE WHEN doc_id % 4 = 0 THEN '?ref=rss' ELSE '' END""".stripMargin
      .replace("TLD", tldSql).replaceAll("\n", "")

  /** URL parsing: every component extracted with built-in regexes
    * ([[UrlFns]] — codegen'd, shuffle-free). The oracle reconstructs
    * each field from the synthesis inputs, so the regexes must invert
    * the construction exactly (www/port stripping, TLD split, depth).
    */
  def corpusUrlParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = withUrl(Tables(spark, dir).documents)
    val host = UrlFns.host($"url")
    u.select($"doc_id", $"url",
        UrlFns.scheme($"url").as("scheme"),
        host.as("host"),
        UrlFns.registeredDomain(host).as("reg_domain"),
        UrlFns.tld(host).as("tld"),
        UrlFns.port($"url").as("port"),
        UrlFns.pathDepth($"url").as("path_depth"),
        UrlFns.hasQuery($"url").as("has_query"))
      .orderBy($"doc_id")
  }

  private val corpusUrlParseSql =
    s"""SELECT doc_id, $urlSql AS url,
       |  CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END AS scheme,
       |  source || '.example.' || $tldSql AS host,
       |  'example.' || $tldSql AS reg_domain,
       |  $tldSql AS tld,
       |  CASE WHEN doc_id % 5 = 0 THEN '8080' ELSE '' END AS port,
       |  CAST(CASE WHEN doc_id % 6 = 0 THEN 4 ELSE 3 END AS BIGINT) AS path_depth,
       |  doc_id % 4 = 0 AS has_query
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-domain cap: at most 3 documents per host, drawn
    * deterministically-at-random (md5 rank) through the native
    * GroupTopK operator — bounded heaps, never a full per-host sort.
    * The oracle states the same draw as a SQL window.
    */
  def corpusDomainCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = withUrl(Tables(spark, dir).documents)
      .select($"doc_id", UrlFns.host($"url").as("host"))
    DomainOps.capPerDomain(docs, $"host", $"doc_id", cap = 3)
      .select($"doc_id", $"host", $"rk".cast("long").as("rk"))
      .orderBy($"host", $"rk")
  }

  private val corpusDomainCapSql =
    s"""WITH p AS (
       |  SELECT doc_id, source || '.example.' || $tldSql AS host FROM documents),
       |r AS (
       |  SELECT doc_id, host, row_number() OVER (
       |    PARTITION BY host
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM p)
       |SELECT doc_id, host, CAST(rk AS BIGINT) AS rk FROM r
       |WHERE rk <= 3 ORDER BY host, rk""".stripMargin

  /** Domain-level mixing: thin over-represented TLD groups to a
    * uniform share via content-addressed sampling (keep-rate
    * min(1, target/n) per group, md5-thresholded). The skewed lang
    * distribution makes this real work: the `com` group holds ~44%
    * of the corpus and gets thinned to the uniform 20% target while
    * small groups pass through whole.
    */
  def corpusDomainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = withUrl(Tables(spark, dir).documents)
      .select($"doc_id", UrlFns.tld(UrlFns.host($"url")).as("tld"))
    DomainOps.rebalanceToUniform(docs, $"tld", $"doc_id")
      .select($"doc_id", $"tld", $"n_before")
      .orderBy($"doc_id")
  }

  private val corpusDomainMixSql =
    s"""WITH p AS (SELECT doc_id, $tldSql AS tld FROM documents),
       |b AS (SELECT tld, count(*) AS n_before FROM p GROUP BY 1),
       |t AS (SELECT CAST(sum(n_before) AS DOUBLE) AS total, count(*) AS ngroups FROM b),
       |r AS (SELECT tld, n_before,
       |        CAST(floor(least(1.0, (total / ngroups) / n_before) * 1000000) AS BIGINT) AS cutoff
       |      FROM b, t)
       |SELECT p.doc_id, p.tld, r.n_before FROM p JOIN r USING (tld)
       |WHERE CAST(('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
       |      < r.cutoff
       |ORDER BY doc_id""".stripMargin

  /** Domain-level quality blocklist (the C4/RefinedWeb curation
    * step): mean per-doc quality score per host — ONE map-side-
    * combinable aggregate over host-cardinality output — flagging
    * hosts whose mean falls under the cut. The per-doc score is the
    * SAME [[Text.qualityScore]] formula the text_quality gate
    * oracles; a downstream filter drops documents from blocked hosts
    * (CorpusSpec asserts the composition).
    */
  /** Cross-engine-stable 4-decimal mean of already-4-decimal scores:
    * rows become exact integer ten-thousandths, the mean is ONE
    * correctly-rounded IEEE division of exact integers, and both
    * engines then round the identical double. round(avg(q), 4)
    * instead inherits sum-order last-bit noise that can flip the 4th
    * decimal on half-way means (observed at sf0.001).
    */
  private def meanQ4(q: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(round(q * 10000).cast("long")).cast("double") / count(lit(1))) / 10000.0

  private val meanQ4Sql =
    "round(CAST(sum(CAST(round(q * 10000) AS BIGINT)) AS DOUBLE) / count(*)) / 10000"

  def corpusDomainQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withUrl(Tables(spark, dir).documents)
      .select(UrlFns.host($"url").as("host"), Text.qualityScore($"text").as("q"))
      .groupBy($"host")
      .agg(count(lit(1)).as("n_docs"), meanQ4($"q").as("mean_q"))
      .withColumn("blocked", $"mean_q" < 0.72)
      .orderBy($"host")
  }

  private val corpusDomainQualitySql =
    s"""WITH d AS (
       |  SELECT source || '.example.' || $tldSql AS host,
       |    length(text) AS n_chars,
       |    len(${QueryDef.toksSql()}) AS n_tokens,
       |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
       |    len(list_filter(${QueryDef.toksSql()},
       |      t -> t IN ('the','a','and','of','to','in','is','it'))) AS n_stop
       |  FROM documents),
       |q AS (SELECT host, round(
       |    least(1.0, n_chars / 500.0) * 0.25 + (n_alpha / n_chars) * 0.25 +
       |    (1.0 - n_stop / n_tokens) * 0.25 +
       |    least(1.0, ((n_chars - (n_tokens - 1)) / n_tokens) / 8.0) * 0.25, 4) AS q
       |  FROM d)
       |SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
       |  $meanQ4Sql AS mean_q, $meanQ4Sql < 0.72 AS blocked
       |FROM q GROUP BY host ORDER BY host""".stripMargin

  /** URL-level dedup after canonicalization (the crawl-dump reality:
    * one page arrives under www/no-www, http/https-default-port,
    * trailing-slash, tracking-param and fragment variants). The
    * synthesis deliberately dresses a SMALL canonical space (host ×
    * 25 pages × optional id param) in all of those disguises; the
    * canonicalizer must strip every one, and the oracle reconstructs
    * the canonical form from the arithmetic ground truth — not from
    * the messy string — so any canonicalization miss shows up as a
    * key mismatch. Dedup itself is one groupBy on the canonical key:
    * keeper = min(doc_id), map-side combinable.
    */
  def corpusUrlDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val messy = Tables(spark, dir).documents.withColumn("url", concat(
      when(pmod($"doc_id", lit(3)) === 0, lit("http")).otherwise(lit("https")),
      lit("://"),
      when(pmod($"doc_id", lit(2)) === 0, lit("www.")).otherwise(lit("")),
      $"source", lit(".example."), tldExpr($"lang"),
      when(pmod($"doc_id", lit(7)) === 0, lit(":443")).otherwise(lit("")),
      lit("/page"), pmod($"doc_id", lit(25)).cast("string"),
      when(pmod($"doc_id", lit(6)) === 0, lit("/")).otherwise(lit("")),
      when(pmod($"doc_id", lit(4)) === 0,
        concat(lit("?ref=rss&utm_source=x&id="), pmod($"doc_id", lit(5)).cast("string")))
        .when(pmod($"doc_id", lit(5)) === 0,
          concat(lit("?id="), pmod($"doc_id", lit(5)).cast("string")))
        .when(pmod($"doc_id", lit(11)) === 0, lit("?utm_campaign=c"))
        .otherwise(lit("")),
      when(pmod($"doc_id", lit(9)) === 0, lit("#sec?note")).otherwise(lit(""))))
    messy.select($"doc_id", UrlFns.canonicalize($"url").as("canonical"))
      .groupBy($"canonical")
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_dupes"))
      .orderBy($"canonical")
  }

  private val corpusUrlDedupSql =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END || '://'
       |    || source || '.example.' || $tldSql
       |    || CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN ':443' ELSE '' END
       |    || '/page' || CAST(doc_id % 25 AS VARCHAR)
       |    || CASE WHEN doc_id % 4 = 0 OR doc_id % 5 = 0
       |            THEN '?id=' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END
       |    AS canonical
       |  FROM documents)
       |SELECT canonical, CAST(min(doc_id) AS BIGINT) AS keeper,
       |  CAST(count(*) AS BIGINT) AS n_dupes
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  /** The composed web-curation pipeline as ONE plan — the C4-style
    * sequence a crawl actually runs: URL-canonicalize and dedup
    * (keeper = min id) → drop documents from quality-blocked hosts
    * (mean score < cut over the SURVIVORS) → cap each host at K docs
    * (deterministic md5 draw through native GroupTopK). Every stage
    * is an already-gated operator; this gate pins their composition
    * end to end. Scale shape: one groupBy on canonical key, one
    * host-cardinality aggregate joined back (no broadcast hint —
    * AQE decides), one bounded-heap cap — no stage is quadratic and
    * nothing collects.
    */
  def pipelineWeb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val messy = docs.withColumn("url", concat(
      when(pmod($"doc_id", lit(3)) === 0, lit("http")).otherwise(lit("https")),
      lit("://"),
      when(pmod($"doc_id", lit(2)) === 0, lit("www.")).otherwise(lit("")),
      $"source", lit(".example."), tldExpr($"lang"),
      lit("/page"), pmod($"doc_id", lit(25)).cast("string"),
      when(pmod($"doc_id", lit(6)) === 0, lit("/")).otherwise(lit("")),
      when(pmod($"doc_id", lit(4)) === 0, lit("?ref=rss")).otherwise(lit(""))))
    val keepers = messy
      .select($"doc_id", UrlFns.canonicalize($"url").as("canonical"))
      .groupBy($"canonical").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val survivors = docs.join(keepers, "doc_id")
      .select($"doc_id", $"text",
        concat($"source", lit(".example."), tldExpr($"lang")).as("host"))
    val scored = survivors.select($"doc_id", $"host", Text.qualityScore($"text").as("q"))
    val hostStats = scored.groupBy($"host".as("__h"))
      .agg(meanQ4($"q").as("mean_q"))
    val unblocked = scored
      .join(hostStats, $"host" === $"__h")
      .filter($"mean_q" >= 0.72)
      .select($"doc_id", $"host")
    DomainOps.capPerDomain(unblocked, $"host", $"doc_id", cap = 3)
      .select($"doc_id", $"host", $"rk".cast("long").as("rk"))
      .orderBy($"doc_id")
  }

  private val pipelineWebSql =
    s"""WITH p AS (
       |  SELECT doc_id, text,
       |    source || '.example.' || $tldSql AS host,
       |    CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END || '://'
       |      || source || '.example.' || $tldSql
       |      || '/page' || CAST(doc_id % 25 AS VARCHAR) AS canonical
       |  FROM documents),
       |s AS (SELECT doc_id, text, host FROM p
       |      WHERE doc_id IN (SELECT min(doc_id) FROM p GROUP BY canonical)),
       |q AS (
       |  SELECT doc_id, host, round(
       |    least(1.0, length(text) / 500.0) * 0.25
       |    + (len(regexp_extract_all(text, '[A-Za-z]')) / length(text)) * 0.25
       |    + (1.0 - len(list_filter(${QueryDef.toksSql()},
       |         t -> t IN ('the','a','and','of','to','in','is','it')))
       |         / len(${QueryDef.toksSql()})) * 0.25
       |    + least(1.0, ((length(text) - (len(${QueryDef.toksSql()}) - 1))
       |         / len(${QueryDef.toksSql()})) / 8.0) * 0.25, 4) AS q
       |  FROM s),
       |u AS (
       |  SELECT doc_id, host FROM q
       |  WHERE host IN (SELECT host FROM q GROUP BY host HAVING $meanQ4Sql >= 0.72)),
       |r AS (
       |  SELECT doc_id, host, row_number() OVER (
       |    PARTITION BY host ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM u)
       |SELECT doc_id, host, CAST(rk AS BIGINT) AS rk FROM r
       |WHERE rk <= 3 ORDER BY doc_id""".stripMargin

  /** Token-budget accounting per source — the data-mixture card every
    * training run publishes: documents, whitespace tokens, each
    * source's share of the corpus and the cumulative share in
    * contribution order. Token totals aggregate map-side to a
    * source-cardinality table; the share window runs over that
    * METADATA table (the binpack planner shape). Shares divide exact
    * integer token counts — cumulative sums stay integer until the
    * single division, so both engines agree bit-for-bit.
    */
  def corpusTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).documents
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFns.tokenCount($"text")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"n_tokens".desc, $"source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per.crossJoin(broadcast(per.agg(sum($"n_tokens").as("total"))))
      .select($"source", $"n_docs", $"n_tokens",
        round($"n_tokens" / $"total", 6).as("share"),
        round(sum($"n_tokens").over(w) / $"total", 6).as("cum_share"))
      .orderBy($"n_tokens".desc, $"source")
  }

  private val corpusTokenBudgetSql =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(${QueryDef.toksSql()})) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per)
       |SELECT source, n_docs, n_tokens,
       |  round(n_tokens / total, 6) AS share,
       |  round(CAST(sum(n_tokens) OVER (
       |    ORDER BY n_tokens DESC, source
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    / total, 6) AS cum_share
       |FROM per, tot ORDER BY n_tokens DESC, source""".stripMargin

  /** Within-source dedup savings report: what exact dedup would
    * reclaim, BEFORE running it — the sizing read that decides
    * whether a dedup pass is worth scheduling. One aggregate per
    * (source, content digest); the survivor is min_by(doc_id) (the
    * OHLC min_by precedent — a DeclarativeAggregate in both
    * engines), chars_saved is the group's total minus the survivor's,
    * and everything stays integer until the final share division.
    */
  def corpusDedupSavings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dg = md5(graft.functions.TextFns.normalized($"text"))
    Tables(spark, dir).documents
      .select($"source", dg.as("digest"), $"doc_id", $"n_chars")
      .groupBy($"source", $"digest")
      .agg(count(lit(1)).as("copies"), sum($"n_chars").as("sum_chars"),
        expr("min_by(n_chars, doc_id)").as("survivor_chars"))
      .groupBy($"source")
      .agg(sum($"copies").as("n_docs"), count(lit(1)).as("n_unique"),
        sum($"sum_chars" - $"survivor_chars").as("chars_saved"),
        sum($"sum_chars").as("total_chars"))
      .select($"source", $"n_docs", $"n_unique",
        ($"n_docs" - $"n_unique").as("n_dup"),
        $"chars_saved",
        round($"chars_saved" / $"total_chars".cast("double"), 6).as("savings_share"))
      .orderBy($"source")
  }

  private val corpusDedupSavingsSql =
    """WITH g AS (
      |  SELECT source, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g'))) AS digest,
      |    count(*) AS copies, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST(min_by(n_chars, doc_id) AS BIGINT) AS survivor_chars
      |  FROM documents GROUP BY 1, 2),
      |s AS (
      |  SELECT source, CAST(sum(copies) AS BIGINT) AS n_docs, count(*) AS n_unique,
      |    CAST(sum(sum_chars - survivor_chars) AS BIGINT) AS chars_saved,
      |    CAST(sum(sum_chars) AS BIGINT) AS total_chars
      |  FROM g GROUP BY 1)
      |SELECT source, n_docs, n_unique, n_docs - n_unique AS n_dup, chars_saved,
      |  round(chars_saved / CAST(total_chars AS DOUBLE), 6) AS savings_share
      |FROM s ORDER BY source""".stripMargin

  // --------------------------------------------------------- corpus_budget_mix
  /** Token-budget mixture planning: fill 60% of the corpus's token
    * budget taking best-mean-quality sources first, partial take of
    * the marginal source — the greedy knapsack every data-mixture
    * recipe starts from (quality ranking is the same shared
    * `Text.qualityScore`; the budget is 3·total div 5, so the plan is
    * scale-invariant). Per-source sufficient statistics map-side,
    * then the rank/cumulative windows run over source-cardinality
    * METADATA (the binpack shape); take arithmetic is exact integers
    * until the final fraction.
    */
  def corpusBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).documents
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFns.tokenCount($"text")).as("n_tokens"),
        sum(round(Text.qualityScore($"text") * 10000).cast("long")).as("q_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(expr("CAST(q_e4 AS DOUBLE) / n_docs").desc, $"source")
    val wc = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per.crossJoin(broadcast(per.agg(expr("3 * sum(n_tokens) div 5").as("budget"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum($"n_tokens").over(wc))
      .select($"rank", $"source", $"n_docs", $"n_tokens",
        expr("round(CAST(q_e4 AS DOUBLE) / n_docs / 1e4, 4)").as("mean_quality"),
        expr("""CASE WHEN cum_tokens <= budget THEN n_tokens
          |WHEN cum_tokens - n_tokens >= budget THEN CAST(0 AS BIGINT)
          |ELSE budget - (cum_tokens - n_tokens) END"""
          .stripMargin.replace("\n", " ")).as("taken_tokens"),
        $"cum_tokens", $"budget")
      .withColumn("frac_taken", expr("round(CAST(taken_tokens AS DOUBLE) / n_tokens, 4)"))
      .orderBy($"rank")
  }

  private val corpusBudgetMixSql =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(${QueryDef.toksSql()})) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(round(
       |      least(1.0, length(text) / 500.0) * 0.25 +
       |      (len(regexp_extract_all(text, '[A-Za-z]')) / length(text)) * 0.25 +
       |      (1.0 - len(list_filter(${QueryDef.toksSql()},
       |        t -> t IN ('the','a','and','of','to','in','is','it'))) / len(${QueryDef.toksSql()})) * 0.25 +
       |      least(1.0, ((length(text) - (len(${QueryDef.toksSql()}) - 1)) / len(${QueryDef.toksSql()})) / 8.0) * 0.25,
       |    4) * 10000 AS BIGINT)) AS BIGINT) AS q_e4
       |  FROM documents GROUP BY source),
       |b AS (SELECT 3 * CAST(sum(n_tokens) AS BIGINT) // 5 AS budget FROM per),
       |r AS (
       |  SELECT *, CAST(row_number() OVER w AS BIGINT) AS rank,
       |    CAST(sum(n_tokens) OVER (
       |      ORDER BY CAST(q_e4 AS DOUBLE) / n_docs DESC, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM per, b
       |  WINDOW w AS (ORDER BY CAST(q_e4 AS DOUBLE) / n_docs DESC, source))
       |SELECT rank, source, n_docs, n_tokens,
       |  round(CAST(q_e4 AS DOUBLE) / n_docs / 1e4, 4) AS mean_quality,
       |  CASE WHEN cum_tokens <= budget THEN n_tokens
       |    WHEN cum_tokens - n_tokens >= budget THEN CAST(0 AS BIGINT)
       |    ELSE budget - (cum_tokens - n_tokens) END AS taken_tokens,
       |  cum_tokens, budget,
       |  round(CAST(CASE WHEN cum_tokens <= budget THEN n_tokens
       |    WHEN cum_tokens - n_tokens >= budget THEN 0
       |    ELSE budget - (cum_tokens - n_tokens) END AS DOUBLE) / n_tokens, 4) AS frac_taken
       |FROM r ORDER BY rank""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sql("corpus_budget_mix", corpusBudgetMix _, corpusBudgetMixSql),
    QueryDef.sql("corpus_dedup_savings", corpusDedupSavings _, corpusDedupSavingsSql),
    QueryDef.sql("corpus_token_budget", corpusTokenBudget _, corpusTokenBudgetSql),
    QueryDef.sql("corpus_url_parse", corpusUrlParse _, corpusUrlParseSql),
    QueryDef.sql("corpus_domain_cap", corpusDomainCap _, corpusDomainCapSql),
    QueryDef.sql("corpus_domain_mix", corpusDomainMix _, corpusDomainMixSql),
    QueryDef.sql("corpus_domain_quality", corpusDomainQuality _, corpusDomainQualitySql),
    QueryDef.sql("corpus_url_dedup", corpusUrlDedup _, corpusUrlDedupSql),
    QueryDef.sql("pipeline_web", pipelineWeb _, pipelineWebSql))
}
