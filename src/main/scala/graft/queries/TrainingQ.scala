package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.{SaltedJoin, Sample}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data assembly queries (SURVEY.md §2 extensions): mixture
  * sampling, sequence packing, and the skew-safe join — each with an
  * exact DuckDB oracle.
  */
object TrainingQ {

  /** Deterministic mixture sampling over `documents` by source:
    * different keep-rates per stratum, md5-content-addressed so the
    * oracle reproduces the exact row set.
    */
  def etlStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sample.stratified(Tables(spark, dir).documents, "doc_id", "source",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), defaultRate = 0.1)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  private val etlStratifiedSampleSql =
    """SELECT doc_id, source FROM (
      |  SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS bucket,
      |    CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000 WHEN 'src2' THEN 250000
      |         ELSE 100000 END AS cutoff
      |  FROM documents)
      |WHERE bucket < cutoff
      |ORDER BY doc_id""".stripMargin

  /** Quality-weighted corpus sampling (r6, [[Sample.weighted]]): each
    * document survives with probability quality², so the sampler
    * preferentially keeps high-quality text instead of hard-dropping
    * at a threshold — the soft variant of the C4-style quality floor
    * (a hard cutoff throws away ALL borderline data; importance
    * sampling keeps a calibrated fraction of it). Deterministic md5
    * addressing: same survivors under any partitioning/retry, and the
    * oracle replays the exact row set. The score is the same
    * [[Text.qualityScore]] every quality gate shares.
    */
  def corpusQualitySample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
      .withColumn("quality_score", Text.qualityScore($"text"))
    Sample.weighted(d, "doc_id", $"quality_score" * $"quality_score")
      .select($"doc_id", $"source", $"quality_score")
      .orderBy($"doc_id")
  }

  private val corpusQualitySampleSql =
    s"""WITH d AS (
       |  SELECT doc_id, source, length(text) AS n_chars,
       |    len(${QueryDef.toksSql()}) AS n_tokens,
       |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
       |    len(list_filter(${QueryDef.toksSql()},
       |      t -> t IN ('the','a','and','of','to','in','is','it'))) AS n_stop
       |  FROM documents),
       |q AS (SELECT doc_id, source, round(
       |    least(1.0, n_chars / 500.0) * 0.25 + (n_alpha / n_chars) * 0.25 +
       |    (1.0 - n_stop / n_tokens) * 0.25 +
       |    least(1.0, ((n_chars - (n_tokens - 1)) / n_tokens) / 8.0) * 0.25, 4) AS quality_score
       |  FROM d)
       |SELECT doc_id, source, quality_score FROM q
       |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
       |  < floor(quality_score * quality_score * 1000000.0)
       |ORDER BY doc_id""".stripMargin

  /** Mixture diagnostics: total-variation distance between each
    * source's token distribution and the corpus-wide distribution,
    * over the shared top-30 vocabulary (r6) — "which slice of my
    * mixture is drifting?" without shipping a vocabulary anywhere
    * (the comparison set is a FIXED top-K, broadcast at 30 rows).
    * TV = ½·Σ|p_src − p_global| is deliberately log-free: KL needs
    * ln(), whose last-ulp behavior differs across engines, while TV
    * is pure +,−,×,÷ — and the per-term |diff| is floor-quantized to
    * 2⁻²⁰ before the sum (the PQ trick) so the reduction is
    * order-independent and the oracle hash-matches bit for bit.
    * Shuffles: token count, per-source count, two bounded joins.
    */
  def corpusSourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select($"source", explode(TextFns.toks($"text")).as("tok"))
    val top = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok").limit(30).select($"tok")
    val f = toks.join(broadcast(top), "tok")
      .groupBy($"source", $"tok").agg(count(lit(1)).as("sc"))
    val st = f.groupBy($"source").agg(sum($"sc").as("st"))
    val g = f.groupBy($"tok").agg(sum($"sc").as("gc"))
    val gt = g.agg(sum($"gc").as("gt"))
    // full source × top-K grid: a source's MISSING token still
    // contributes |0 − p_global|; the multiplier is the fixed K
    val grid = st.crossJoin(broadcast(top))
    grid.join(f, Seq("source", "tok"), "left")
      .join(broadcast(g), "tok")
      .crossJoin(broadcast(gt))
      .select($"source", $"st",
        floor(abs(coalesce($"sc", lit(0L)).cast("double") / $"st".cast("double")
          - $"gc".cast("double") / $"gt".cast("double")) * lit(1048576.0))
          .cast("long").as("q"))
      .groupBy($"source")
      .agg(first($"st").as("n_top_tokens"),
        (sum($"q").cast("double") / lit(2097152.0)).as("tv_dist"))
      .orderBy($"source")
  }

  private val corpusSourceDivergenceSql =
    s"""WITH tk AS (SELECT source, unnest(${QueryDef.toksSql()}) AS tok FROM documents),
       |top AS (SELECT tok FROM (
       |  SELECT tok, count(*) AS c FROM tk GROUP BY tok
       |  ORDER BY c DESC, tok LIMIT 30)),
       |f AS (SELECT source, tok, count(*) AS sc
       |      FROM tk JOIN top USING (tok) GROUP BY source, tok),
       |st AS (SELECT source, sum(sc) AS st FROM f GROUP BY source),
       |g AS (SELECT tok, sum(sc) AS gc FROM f GROUP BY tok),
       |gt AS (SELECT sum(gc) AS gt FROM g),
       |grid AS (SELECT st.source, st.st, top.tok FROM st, top),
       |terms AS (
       |  SELECT grid.source, grid.st,
       |    CAST(floor(abs(CAST(coalesce(f.sc, 0) AS DOUBLE) / CAST(grid.st AS DOUBLE)
       |      - CAST(g.gc AS DOUBLE) / CAST(gt.gt AS DOUBLE)) * 1048576.0) AS BIGINT) AS q
       |  FROM grid
       |  LEFT JOIN f ON f.source = grid.source AND f.tok = grid.tok
       |  JOIN g ON g.tok = grid.tok CROSS JOIN gt)
       |SELECT source, CAST(any_value(st) AS BIGINT) AS n_top_tokens,
       |  CAST(sum(q) AS DOUBLE) / 2097152.0 AS tv_dist
       |FROM terms GROUP BY source ORDER BY source""".stripMargin

  /** Greedy per-source sequence packing into 512-token budgets —
    * window running-sum, fully SQL-expressible.
    */
  def textPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sample.packByGroup(Tables(spark, dir).documents, "doc_id", "source",
        TextFns.tokenCount($"text"), budget = 512)
      .orderBy($"doc_id")
  }

  private val textPackSql =
    s"""SELECT doc_id, source,
      |  CAST(len(${QueryDef.toksSql()}) AS BIGINT) AS n_tokens,
      |  CAST(floor(coalesce(SUM(len(${QueryDef.toksSql()}))
      |    OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS seq_id
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Skew-safe salted join, gated on result parity: events (user_id is
    * the potentially-hot key) joined to customer through
    * [[SaltedJoin.inner]], aggregated per segment — the oracle is the
    * PLAIN join, which the salted plan must reproduce exactly.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    SaltedJoin.inner(
        t.events.select($"user_id".as("c_custkey"), $"value"),
        t.customer.select($"c_custkey", $"c_mktsegment"),
        "c_custkey", saltFactor = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .orderBy($"c_mktsegment")
  }

  private val qSaltedJoinSql =
    """SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** The whole training-corpus assembly as ONE composed Catalyst
    * plan — exact dedup (keep min id per content hash) → quality
    * floor (≥ 30 tokens) → deterministic mixture sampling → per-source
    * sequence packing. Every stage is individually oracled elsewhere;
    * this gate proves the COMPOSITION stays exact end to end (and
    * that the optimizer handles the stacked windows/aggregations —
    * one content-hash shuffle, one pack window per source, narrow
    * everything else).
    */
  /** Per-stage funnel report over the curation chain — the
    * observability table every production pipeline publishes next to
    * its output: how many documents survive each filter, with the
    * running retention. Stage predicates reuse the gated operators'
    * exact semantics (C4 scalar rules → Gopher stopword floor →
    * exact-dedup keepers → md5 quality sampling), composed as
    * CUMULATIVE filters; the scalar stages fold into ONE conditional
    * aggregate over one scan, the dedup stage adds its one
    * content-hash shuffle. Retention divides exact integers.
    */
  def pipelineFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val enriched = docs
      .withColumn("lt", lower($"text"))
      .withColumn("ts", TextFns.toks($"text"))
      .withColumn("c4_keep",
        !($"lt".contains("{") || $"lt".contains("}")) &&
          !$"lt".contains("lorem ipsum") &&
          !array_contains($"ts", "javascript") &&
          size($"ts") >= 5 &&
          array_max(transform($"ts", t => length(t))) <= 100)
      .withColumn("stop_hits",
        size(filter($"ts", t => t.isin("the", "a", "and", "of", "to", "in", "is", "it"))))
      .withColumn("gopher_keep", $"c4_keep" && $"stop_hits" >= 2)
      .withColumn("keeper",
        $"doc_id" === min($"doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
      .withColumn("dedup_keep", $"gopher_keep" && $"keeper")
      .withColumn("sample_keep", $"dedup_keep" &&
        Sample.md5Bucket($"doc_id") < 800000)
    val agg = enriched.agg(
      count(lit(1)).as("raw"),
      sum(when($"c4_keep", 1L).otherwise(0L)).as("c4"),
      sum(when($"gopher_keep", 1L).otherwise(0L)).as("gopher"),
      sum(when($"dedup_keep", 1L).otherwise(0L)).as("dedup"),
      sum(when($"sample_keep", 1L).otherwise(0L)).as("sampled"))
    agg.select(explode(array(
        struct(lit(1L).as("stage_no"), lit("raw").as("stage"), $"raw".as("n_docs"), $"raw".as("base")),
        struct(lit(2L).as("stage_no"), lit("c4_rules").as("stage"), $"c4".as("n_docs"), $"raw".as("base")),
        struct(lit(3L).as("stage_no"), lit("gopher_stopwords").as("stage"), $"gopher".as("n_docs"), $"raw".as("base")),
        struct(lit(4L).as("stage_no"), lit("exact_dedup").as("stage"), $"dedup".as("n_docs"), $"raw".as("base")),
        struct(lit(5L).as("stage_no"), lit("quality_sample").as("stage"), $"sampled".as("n_docs"), $"raw".as("base"))
      )).as("s"))
      .select($"s.stage_no", $"s.stage", $"s.n_docs",
        round($"s.n_docs" / $"s.base", 4).as("retention"))
      .orderBy($"stage_no")
  }

  private val pipelineFunnelSql =
    s"""WITH e AS (
       |  SELECT doc_id, text, lower(text) AS lt, ${QueryDef.toksSql()} AS ts
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, text,
       |    (NOT (lt LIKE '%{%' OR lt LIKE '%}%') AND NOT lt LIKE '%lorem ipsum%'
       |      AND NOT list_contains(ts, 'javascript') AND len(ts) >= 5
       |      AND list_max(list_transform(ts, x -> length(x))) <= 100) AS c4_keep,
       |    len(list_filter(ts, x -> list_contains(
       |      ['the','a','and','of','to','in','is','it'], x))) AS stop_hits,
       |    doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |  FROM e),
       |g AS (
       |  SELECT *, c4_keep AND stop_hits >= 2 AS gopher_keep FROM f),
       |h AS (
       |  SELECT *, gopher_keep AND keeper AS dedup_keep,
       |    gopher_keep AND keeper AND
       |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |        % 1000000 < 800000 AS sample_keep
       |  FROM g),
       |agg AS (
       |  SELECT count(*) AS raw,
       |    CAST(sum(CASE WHEN c4_keep THEN 1 ELSE 0 END) AS BIGINT) AS c4,
       |    CAST(sum(CASE WHEN gopher_keep THEN 1 ELSE 0 END) AS BIGINT) AS gopher,
       |    CAST(sum(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT) AS dedup,
       |    CAST(sum(CASE WHEN sample_keep THEN 1 ELSE 0 END) AS BIGINT) AS sampled
       |  FROM h)
       |SELECT stage_no, stage, n_docs, round(n_docs / base, 4) AS retention
       |FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage_no, 'raw' AS stage, raw AS n_docs, raw AS base FROM agg
       |  UNION ALL SELECT 2, 'c4_rules', c4, raw FROM agg
       |  UNION ALL SELECT 3, 'gopher_stopwords', gopher, raw FROM agg
       |  UNION ALL SELECT 4, 'exact_dedup', dedup, raw FROM agg
       |  UNION ALL SELECT 5, 'quality_sample', sampled, raw FROM agg)
       |ORDER BY stage_no""".stripMargin

  def pipelineCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val survivors = docs.groupBy(md5($"text").as("__h"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val kept = docs.join(survivors, "doc_id")
      .withColumn("n_tokens", TextFns.tokenCount($"text"))
      .filter($"n_tokens" >= 30)
    val sampled = Sample.stratified(kept, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.8)
    Sample.packByGroup(sampled, "doc_id", "source", $"n_tokens", budget = 512)
      .orderBy($"doc_id")
  }

  private val pipelineCorpusSql =
    s"""WITH survivors AS (
      |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |kept AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(len(${QueryDef.toksSql("d.text")}) AS BIGINT) AS n_tokens
      |  FROM documents d JOIN survivors s ON d.doc_id = s.doc_id
      |  WHERE len(${QueryDef.toksSql("d.text")}) >= 30),
      |sampled AS (
      |  SELECT doc_id, source, n_tokens FROM (
      |    SELECT *,
      |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS bucket,
      |      CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000 ELSE 800000 END AS cutoff
      |    FROM kept)
      |  WHERE bucket < cutoff)
      |SELECT doc_id, source, n_tokens,
      |  CAST(floor(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS seq_id
      |FROM sampled ORDER BY doc_id""".stripMargin

  /** Jensen-Shannon divergence of each source's top-token
    * distribution from the corpus-wide one — the bounded (≤ ln 2),
    * symmetric companion to `corpus_source_divergence`'s TV distance
    * (JS weights the same gaps by information content, so a source
    * missing a rare token scores differently than one missing "the").
    * Same source × top-30 grid; each p·ln(p/m) + q·ln(q/m) cell
    * nano-quantizes to a long BEFORE the cross-token sum (the
    * corpus_token_entropy ln recipe), so the reduction is
    * order-independent and bit-exact.
    */
  def corpusJsDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toksDf = Tables(spark, dir).documents
      .select($"source", explode(TextFns.toks($"text")).as("tok"))
    val top = toksDf.groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok").limit(30).select($"tok")
    val f = toksDf.join(broadcast(top), "tok")
      .groupBy($"source", $"tok").agg(count(lit(1)).as("sc"))
    val st = f.groupBy($"source").agg(sum($"sc").as("st"))
    val g = f.groupBy($"tok").agg(sum($"sc").as("gc"))
    val gt = g.agg(sum($"gc").as("gt"))
    val grid = st.crossJoin(broadcast(top))
    grid.join(f, Seq("source", "tok"), "left")
      .join(broadcast(g), "tok")
      .crossJoin(broadcast(gt))
      .withColumn("p", coalesce($"sc", lit(0L)).cast("double") / $"st".cast("double"))
      .withColumn("q", $"gc".cast("double") / $"gt".cast("double"))
      .withColumn("m", ($"p" + $"q") / 2.0)
      .withColumn("cell",
        when($"p" > 0, $"p" * log($"p" / $"m")).otherwise(lit(0.0)) +
          $"q" * log($"q" / $"m"))
      .withColumn("cq", round($"cell" * 1e9).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_top_tokens"), sum($"cq").as("js_2e9"),
        round(sum($"cq").cast("double") / 2e9, 6).as("js_div"))
      .orderBy($"source")
  }

  private val corpusJsDivergenceSql =
    s"""WITH tk AS (SELECT source, unnest(${QueryDef.toksSql()}) AS tok FROM documents),
       |top AS (SELECT tok FROM (
       |  SELECT tok, count(*) AS c FROM tk GROUP BY tok
       |  ORDER BY c DESC, tok LIMIT 30)),
       |f AS (SELECT source, tok, count(*) AS sc
       |      FROM tk JOIN top USING (tok) GROUP BY source, tok),
       |st AS (SELECT source, CAST(sum(sc) AS BIGINT) AS st FROM f GROUP BY source),
       |g AS (SELECT tok, CAST(sum(sc) AS BIGINT) AS gc FROM f GROUP BY tok),
       |gt AS (SELECT CAST(sum(gc) AS BIGINT) AS gt FROM g),
       |grid AS (SELECT st.source, st.st, top.tok FROM st CROSS JOIN top),
       |cells AS (
       |  SELECT grid.source,
       |    CAST(coalesce(f.sc, 0) AS DOUBLE) / CAST(grid.st AS DOUBLE) AS p,
       |    CAST(g.gc AS DOUBLE) / CAST(gt.gt AS DOUBLE) AS q
       |  FROM grid
       |  LEFT JOIN f ON f.source = grid.source AND f.tok = grid.tok
       |  JOIN g ON g.tok = grid.tok CROSS JOIN gt),
       |terms AS (
       |  SELECT source,
       |    CAST(round((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
       |      + q * ln(q / ((p + q) / 2.0))) * 1e9) AS BIGINT) AS cq
       |  FROM cells)
       |SELECT source, count(*) AS n_top_tokens, CAST(sum(cq) AS BIGINT) AS js_2e9,
       |  round(CAST(sum(cq) AS DOUBLE) / 2e9, 6) AS js_div
       |FROM terms GROUP BY source ORDER BY source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("corpus_js_divergence", corpusJsDivergence _, corpusJsDivergenceSql),
    QueryDef.sql("etl_stratified_sample", etlStratifiedSample _, etlStratifiedSampleSql),
    QueryDef.sql("corpus_quality_sample", corpusQualitySample _, corpusQualitySampleSql),
    QueryDef.sql("corpus_source_divergence", corpusSourceDivergence _, corpusSourceDivergenceSql),
    QueryDef.sql("text_pack", textPack _, textPackSql),
    QueryDef.sql("q_salted_join", qSaltedJoin _, qSaltedJoinSql),
    QueryDef.sql("pipeline_corpus", pipelineCorpus _, pipelineCorpusSql),
    QueryDef.sql("pipeline_funnel", pipelineFunnel _, pipelineFunnelSql))
}
