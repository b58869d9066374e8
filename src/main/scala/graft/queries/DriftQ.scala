package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 6 — drift and representation gates: a split-scan
  * changepoint detector, per-source token entropy, and int8 scalar
  * quantization of embeddings. Parity rules carried forward: exact
  * integers until the last step, nano-quantized terms before any
  * cross-group double sum, UNROUNDED final doubles (round()'s
  * half-case rule is the one cross-engine divergence — the
  * text_readability lesson), and integer rounding only (identical
  * half-away-from-zero in both engines).
  */
object DriftQ {

  /** Best single changepoint in daily purchase revenue: the split
    * day maximizing |mean(before) − mean(after)| — offline CUSUM's
    * closed-form sibling, the "did the metric shift?" primitive. The
    * daily series is aggregated metadata (one row per day), so the
    * prefix scan is a window over a tiny frame; means divide exact
    * integer cents by exact counts (deterministic IEEE), and the
    * argmax orders by (delta DESC, day ASC) on bit-identical doubles.
    */
  def tsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.orderBy($"day")
    val n = daily.agg(count(lit(1)).as("n_days"), sum($"cents").as("total"))
    daily
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"cents").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(n))
      .filter($"idx" < $"n_days")
      .select($"day".as("change_day"), $"n_days",
        ($"cum".cast("double") / $"idx").as("mean_before"),
        (($"total" - $"cum").cast("double") / ($"n_days" - $"idx")).as("mean_after"))
      .withColumn("delta", abs($"mean_before" - $"mean_after"))
      .orderBy($"delta".desc, $"change_day")
      .limit(1)
  }

  private val tsChangepointSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |n AS (SELECT count(*) AS n_days, CAST(sum(cents) AS BIGINT) AS total FROM daily),
      |scan AS (
      |  SELECT day AS change_day, n_days,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx,
      |    CAST(sum(cents) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    total
      |  FROM daily, n)
      |SELECT change_day, n_days,
      |  CAST(cum AS DOUBLE) / idx AS mean_before,
      |  CAST(total - cum AS DOUBLE) / (n_days - idx) AS mean_after,
      |  abs(CAST(cum AS DOUBLE) / idx -
      |      CAST(total - cum AS DOUBLE) / (n_days - idx)) AS delta
      |FROM scan WHERE idx < n_days
      |ORDER BY delta DESC, change_day LIMIT 1""".stripMargin

  /** Shannon entropy (bits) of each source's token distribution —
    * the register-diversity read next to corpus_vocab_overlap's set
    * view: low entropy flags templated/boilerplate sources a quality
    * sampler should down-weight. Each token's −p·ln p term quantizes
    * to integer NANOS before the per-source sum (a cross-group double
    * sum is addition-order-dependent — the corpus_temperature_mix
    * recipe), so the one libm call per term never meets a
    * nondeterministic reduction; the bits conversion divides the
    * exact nano total by a ln(2) literal, unrounded.
    */
  def corpusTokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables(spark, dir).documents
      .select($"source", explode(filter(graft.functions.TextFns.toks($"text"),
        t => t =!= "")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy($"source")
      .agg(sum($"n").as("total"), count(lit(1)).as("vocab"))
    cnt.join(tot, "source")
      .withColumn("term",
        round(-($"n" / $"total") * log($"n" / $"total") * 1e9).cast("long"))
      .groupBy($"source")
      .agg(first($"total").as("n_tokens"), first($"vocab").as("vocab"),
        sum($"term").as("nanos"))
      .select($"source", $"n_tokens", $"vocab",
        ($"nanos".cast("double") / 1e9 / lit(0.6931471805599453)).as("entropy_bits"))
      .orderBy($"source")
  }

  private val corpusTokenEntropySql = {
    val t = QueryDef.toksSql()
    s"""WITH cnt AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT source, unnest(list_filter($t, t -> t <> '')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT source, CAST(sum(n) AS BIGINT) AS total,
      |    count(*) AS vocab
      |  FROM cnt GROUP BY 1)
      |SELECT source, any_value(total) AS n_tokens, any_value(vocab) AS vocab,
      |  CAST(sum(CAST(round(-(n / total) * ln(n / total) * 1e9) AS BIGINT)) AS DOUBLE)
      |    / 1e9 / 0.6931471805599453 AS entropy_bits
      |FROM cnt JOIN tot USING (source)
      |GROUP BY source ORDER BY source""".stripMargin
  }

  /** Int8 scalar quantization of the embedding table — the 4×
    * shrink every vector index applies before ANN at scale. Per-
    * dimension min/max aggregate (64 rows, broadcast back), then
    * `q = round((x − lo)·255/(hi − lo))`: the cast float→double is
    * exact, the affine map is deterministic IEEE, and INTEGER
    * rounding is the one rounding op both engines implement
    * identically (half away from zero on the exact binary value).
    * Output is bounded to dims 0–3 per vector; the quantization
    * itself is all-dims.
    */
  def embQuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", $"pos".cast("long").as("dim"),
        $"col".cast("double").as("x"))
    val ranges = e.groupBy($"dim").agg(min($"x").as("lo"), max($"x").as("hi"))
    e.join(broadcast(ranges), "dim")
      .withColumn("q",
        when($"hi" === $"lo", lit(0L))
          .otherwise(round(($"x" - $"lo") * 255.0 / ($"hi" - $"lo")).cast("long")))
      .filter($"dim" < 4)
      .select($"vec_id", $"dim", $"q")
      .orderBy($"vec_id", $"dim")
  }

  private val embQuantizeInt8Sql =
    """WITH e AS (
      |  SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |r AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM e GROUP BY 1)
      |SELECT vec_id, dim,
      |  CASE WHEN hi = lo THEN 0
      |       ELSE CAST(round((x - lo) * 255.0 / (hi - lo)) AS BIGINT) END AS q
      |FROM e JOIN r USING (dim)
      |WHERE dim < 4 ORDER BY vec_id, dim""".stripMargin

  // ------------------------------------------------------------- emb_drift
  /** Per-dimension embedding drift between the even/odd-id cohorts —
    * the embedding-space sibling of `q_psi_drift`: when a model or
    * upstream corpus changes, the per-dim standardized mean
    * difference (SMD) is the first monitor to fire. Components
    * quantize to e6 integers scan-side (the repo-wide embedding
    * discipline), each cohort×dim reduces to (n, Σx, Σx²) exact longs
    * map-side — 100 TB becomes 128 sufficient-statistic rows — and
    * means/variances round to 4 decimals BEFORE the SMD arithmetic
    * (the q_ab_test recipe) so the one double expression runs on
    * identical inputs in both engines. |SMD| > 0.1 flags (the
    * epidemiology imbalance convention).
    */
  def embDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
      .select(($"vec_id" % 2 === 0).as("a"),
        posexplode($"embedding").as(Seq("dim", "x")))
      .select($"a", ($"dim" + 1).cast("long").as("dim"),
        expr("CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)").as("xe6"))
    e.groupBy($"dim")
      .agg(sum(when($"a", 1L).otherwise(0L)).as("na"),
        sum(when($"a", $"xe6").otherwise(0L)).as("sa"),
        sum(when($"a", $"xe6" * $"xe6").otherwise(0L)).as("qa"),
        sum(when(!$"a", 1L).otherwise(0L)).as("nb"),
        sum(when(!$"a", $"xe6").otherwise(0L)).as("sb"),
        sum(when(!$"a", $"xe6" * $"xe6").otherwise(0L)).as("qb"))
      .withColumn("ma", expr("round(CAST(sa AS DOUBLE) / na / 1e6, 4)"))
      .withColumn("mb", expr("round(CAST(sb AS DOUBLE) / nb / 1e6, 4)"))
      .withColumn("va", expr(
        "round((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / 1e12, 4)"))
      .withColumn("vb", expr(
        "round((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / 1e12, 4)"))
      .select($"dim", $"na", $"nb", $"ma".as("mean_a"), $"mb".as("mean_b"),
        expr("round((ma - mb) / sqrt((va + vb) / 2.0), 4)").as("smd"),
        expr("abs(round((ma - mb) / sqrt((va + vb) / 2.0), 4)) > 0.1").as("drifted"))
      .orderBy($"dim")
  }

  private val embDriftSql =
    """WITH e AS (
      |  SELECT vec_id % 2 = 0 AS a, i AS dim,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS xe6
      |  FROM embeddings, range(1, 65) t(i)),
      |g AS (
      |  SELECT dim,
      |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN a THEN xe6 ELSE 0 END) AS BIGINT) AS sa,
      |    CAST(sum(CASE WHEN a THEN xe6 * xe6 ELSE 0 END) AS BIGINT) AS qa,
      |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN NOT a THEN xe6 ELSE 0 END) AS BIGINT) AS sb,
      |    CAST(sum(CASE WHEN NOT a THEN xe6 * xe6 ELSE 0 END) AS BIGINT) AS qb
      |  FROM e GROUP BY dim),
      |m AS (
      |  SELECT *,
      |    round(CAST(sa AS DOUBLE) / na / 1e6, 4) AS ma,
      |    round(CAST(sb AS DOUBLE) / nb / 1e6, 4) AS mb,
      |    round((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / 1e12, 4) AS va,
      |    round((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / 1e12, 4) AS vb
      |  FROM g)
      |SELECT dim, na, nb, ma AS mean_a, mb AS mean_b,
      |  round((ma - mb) / sqrt((va + vb) / 2.0), 4) AS smd,
      |  abs(round((ma - mb) / sqrt((va + vb) / 2.0), 4)) > 0.1 AS drifted
      |FROM m ORDER BY dim""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ts_changepoint", tsChangepoint _, tsChangepointSql),
    QueryDef.sql("corpus_token_entropy", corpusTokenEntropy _, corpusTokenEntropySql),
    QueryDef.sql("emb_quantize_int8", embQuantizeInt8 _, embQuantizeInt8Sql),
    QueryDef.sql("emb_drift", embDrift _, embDriftSql))
}
