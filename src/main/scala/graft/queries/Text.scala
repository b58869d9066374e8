package graft.queries

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over `documents` (SURVEY.md §2.5). Pure projections/
  * aggregations — scale with the scan, no shuffle except the ngram
  * count. All arithmetic mirrors the DuckDB oracle operation-for-
  * operation so doubles round identically.
  */
object Text {

  /** Per-doc token/char counts (whitespace + BPE-ish regex). */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id",
        length($"text").cast("long").as("n_chars"),
        tokenCount($"text").as("n_tokens"),
        bpeCount($"text").as("n_bpe_tokens"))
      .orderBy($"doc_id")
  }

  private val textStatsSql =
    s"""SELECT doc_id, length(text) AS n_chars,
      |  len(${QueryDef.toksSql()}) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Quality scoring: length, alpha ratio, stopword ratio, mean word
    * length → composite in [0,1].
    */
  /** The composite per-doc quality score (rounded to 4), defined
    * ONCE: text_quality and corpus_domain_quality both use it, and
    * the oracle-parity arithmetic (division order, 0.25 weights,
    * rounding) is load-bearing — two copies would drift.
    */
  private[queries] def qualityScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nChars = length(text).cast("long")
    val nTokens = tokenCount(text)
    val nAlpha = regexp_count(text, lit("[A-Za-z]")).cast("long")
    val nStop = tokensIn(text, Stopwords)
    round(
      least(lit(1.0), nChars / lit(500.0)) * 0.25 +
        (nAlpha / nChars) * 0.25 +
        (lit(1.0) - nStop / nTokens) * 0.25 +
        least(lit(1.0), ((nChars - (nTokens - lit(1))) / nTokens) / lit(8.0)) * 0.25,
      4)
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
      .select($"doc_id", $"text",
        length($"text").cast("long").as("n_chars"),
        tokenCount($"text").as("n_tokens"),
        regexp_count($"text", lit("[A-Za-z]")).cast("long").as("n_alpha"),
        regexp_count($"text", lit("[^A-Za-z0-9\\s]")).cast("long").as("n_punct"),
        tokensIn($"text", Stopwords).as("n_stop"))
    d.select($"doc_id", $"n_chars", $"n_tokens", $"n_punct",
        round($"n_alpha" / $"n_chars", 4).as("alpha_ratio"),
        round($"n_stop" / $"n_tokens", 4).as("stop_ratio"),
        round(($"n_chars" - ($"n_tokens" - lit(1))) / $"n_tokens", 4).as("mean_word_len"),
        qualityScore($"text").as("quality_score"))
      .orderBy($"doc_id")
  }

  private val textQualitySql =
    s"""WITH d AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |    len(${QueryDef.toksSql()}) AS n_tokens,
      |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
      |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
      |    len(list_filter(${QueryDef.toksSql()},
      |      t -> t IN ('the','a','and','of','to','in','is','it'))) AS n_stop
      |  FROM documents)
      |SELECT doc_id, n_chars, n_tokens, n_punct,
      |  round(n_alpha / n_chars, 4) AS alpha_ratio,
      |  round(n_stop / n_tokens, 4) AS stop_ratio,
      |  round((n_chars - (n_tokens - 1)) / n_tokens, 4) AS mean_word_len,
      |  round(
      |    least(1.0, n_chars / 500.0) * 0.25 +
      |    (n_alpha / n_chars) * 0.25 +
      |    (1.0 - n_stop / n_tokens) * 0.25 +
      |    least(1.0, ((n_chars - (n_tokens - 1)) / n_tokens) / 8.0) * 0.25,
      |  4) AS quality_score
      |FROM d ORDER BY doc_id""".stripMargin

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "y", "las"),
    "fr" -> Seq("le", "la", "et", "les"))

  /** CJK Unified Ideographs block — zh is char-based (no whitespace
    * word boundaries), so its signal is a character-class count. The
    * \x{...} code-point syntax parses identically in Java regex and
    * DuckDB's RE2, so Spark and the oracle share the pattern text.
    */
  private val CjkClass = "[\\x{4e00}-\\x{9fff}]"

  /** Marker language ID (de/en/es/fr word markers + zh CJK chars)
    * with deterministic alphabetical tie-break; `confidence` is the
    * winning marker share (floor-truncated to 4 decimals — IEEE
    * multiply+floor is bit-identical across engines, unlike round on
    * non-representable halves); `correct` compares the labeled lang.
    */
  def langidOf(docs: DataFrame): DataFrame = {
    val withCounts = Markers.foldLeft(docs) {
      case (df, (lang, words)) => df.withColumn(s"c_$lang", tokensIn(col("text"), words))
    }.withColumn("c_zh", regexp_count(col("text"), lit(CjkClass)).cast("long"))
    val langs = Markers.map(_._1) :+ "zh"
    val cols = langs.map(l => col(s"c_$l"))
    val g = greatest(cols: _*)
    val total = cols.reduce(_ + _)
    val pred = langs.foldRight(lit("unknown")) { case (l, acc) =>
      when(col(s"c_$l") === g && g > 0, l).otherwise(acc)
    }
    // foldRight gives de > en > es > fr > zh precedence (alphabetical)
    withCounts
      .withColumn("pred_lang", pred)
      .withColumn("confidence",
        when(total > 0, floor(g / total * 10000) / lit(10000.0)).otherwise(lit(0.0)))
      .withColumn("correct", col("pred_lang") === col("lang"))
      .select((Seq(col("doc_id"), col("lang")) ++ cols ++
        Seq(col("pred_lang"), col("confidence"), col("correct"))): _*)
      .orderBy(col("doc_id"))
  }

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    langidOf(Tables(spark, dir).documents)

  private val textLangidSql =
    s"""WITH c AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('der','die','und','das'))) AS c_de,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('the','and','of','is'))) AS c_en,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('el','los','y','las'))) AS c_es,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('le','la','et','les'))) AS c_fr,
      |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS c_zh
      |  FROM documents),
      |g AS (
      |  SELECT *, greatest(c_de,c_en,c_es,c_fr,c_zh) AS m,
      |    c_de+c_en+c_es+c_fr+c_zh AS tot,
      |    CASE WHEN greatest(c_de,c_en,c_es,c_fr,c_zh) = 0 THEN 'unknown'
      |         WHEN c_de = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'de'
      |         WHEN c_en = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'en'
      |         WHEN c_es = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'es'
      |         WHEN c_fr = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'fr'
      |         ELSE 'zh' END AS pred_lang
      |  FROM c)
      |SELECT doc_id, lang, c_de, c_en, c_es, c_fr, c_zh, pred_lang,
      |  CASE WHEN tot > 0 THEN floor(m / tot * 10000) / 10000 ELSE 0.0 END AS confidence,
      |  pred_lang = lang AS correct
      |FROM g ORDER BY doc_id""".stripMargin

  /** Canonical token-sort document fingerprint (md5 parity). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id", fingerprint($"text").as("fingerprint"))
      .orderBy($"doc_id")
  }

  private val textFingerprintSql =
    s"""SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    ${QueryDef.toksSql()})), ' ')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus-wide top-20 bigrams (one shuffle on bigram; map-side
    * combine does the heavy lifting at scale).
    */
  def textNgrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(explode(shingles($"text", 2)).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram")
      .limit(20)
  }

  private val textNgramsSql =
    s"""WITH t AS (SELECT ${QueryDef.toksSql()} AS t FROM documents),
      |bi AS (SELECT unnest(list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])) AS bigram FROM t)
      |SELECT bigram, count(*) AS n FROM bi
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  /** PII redaction (emails / phone fragments / IPv4) — the scrubbing
    * pass every published-corpus pipeline runs. Pure codegen'd
    * regexp_replace chain, so it scales with the scan. The corpus has
    * no organic PII, so deterministic synthetic PII derived from
    * doc_id is appended first — redaction then has real work on every
    * row and the oracle rebuilds the identical input.
    */
  def textRedactPii(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withPii = Tables(spark, dir).documents
      .select($"doc_id", concat($"text",
        lit(" contact user"), $"doc_id", lit("@example.com or 555-01"),
        $"doc_id" % 100, lit(" at 10.0."), $"doc_id" % 256, lit(".7")).as("text"))
    withPii.select($"doc_id",
        regexp_replace(
          regexp_replace(
            regexp_replace($"text",
              lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
            lit("\\b\\d{3}-\\d{2,4}\\b"), lit("<PHONE>")),
          lit("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"), lit("<IP>"))
          .as("redacted"))
      .orderBy($"doc_id")
  }

  private val textRedactPiiSql =
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        text || ' contact user' || doc_id || '@example.com or 555-01' || (doc_id % 100)
      |             || ' at 10.0.' || (doc_id % 256) || '.7',
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b\d{3}-\d{2,4}\b', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: flag any document sharing a 13-gram
    * with the benchmark set (here: every 20th doc) — the standard
    * eval-leakage guard. Candidate generation is an equi-join of the
    * corpus shingle stream against the (much smaller) benchmark
    * shingle index — never all-pairs, so it scales like the dedup
    * family.
    */
  def textDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val sh = docs.select($"doc_id", explode(shingles($"text", 13)).as("sh"))
    val bench = sh.filter($"doc_id" % 20 === 0)
      .select($"sh", $"doc_id".as("bench_id"))
    val hits = sh.join(bench, "sh")
      .filter($"doc_id" =!= $"bench_id")
      .select($"doc_id").distinct()
      .withColumn("contaminated", lit(true))
    docs.select($"doc_id").join(hits, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"contaminated", lit(false)).as("contaminated"))
      .orderBy($"doc_id")
  }

  private val textDecontaminateSql = {
    val gram13 = (0 until 13).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH tok AS (SELECT doc_id, ${QueryDef.toksSql()} AS t FROM documents),
       |sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 13
       |         THEN list_distinct([$gram13 for i in range(1, len(t) - 11)])
       |         ELSE [array_to_string(t, ' ')] END) AS sh FROM tok),
       |hits AS (SELECT DISTINCT a.doc_id
       |  FROM sh a JOIN sh b ON a.sh = b.sh
       |  WHERE b.doc_id % 20 = 0 AND a.doc_id <> b.doc_id)
       |SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Within-document repetition (the Gopher-style quality rule):
    * fraction of duplicate 3-grams. Narrow projection — [[WordNgrams]]
    * keeps duplicates, so total vs distinct counts give the ratio
    * without any shuffle.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = graft.functions.WordNgrams(toks($"text"), 3)
    Tables(spark, dir).documents
      .select($"doc_id",
        size(grams).cast("long").as("n_ngrams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        round(lit(1.0) - $"n_distinct" / $"n_ngrams", 4))
      .withColumn("repetitive", $"dup_ratio" > 0.2)
      .orderBy($"doc_id")
  }

  private val textRepetitionSql = {
    val gram3 = "t[i] || ' ' || t[i+1] || ' ' || t[i+2]"
    s"""WITH tok AS (SELECT doc_id, ${QueryDef.toksSql()} AS t FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(t) >= 3
       |        THEN [$gram3 for i in range(1, len(t) - 1)]
       |        ELSE [array_to_string(t, ' ')] END AS grams FROM tok)
       |SELECT doc_id,
       |  CAST(len(grams) AS BIGINT) AS n_ngrams,
       |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       |  round(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 4) AS dup_ratio,
       |  (1.0 - len(list_distinct(grams)) * 1.0 / len(grams)) > 0.2 AS repetitive
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** Hashed-feature linear quality classifier — the fasttext-style
    * model-inference shape every corpus pipeline runs at scale: each
    * token hashes to a weight (here md5-derived so the gate is
    * engine-replayable; a trained model ships a weight table instead),
    * mean-pooled and squashed to a score. All inside whole-stage
    * codegen: the fold runs in the `aggregate` HOF over the token
    * array — no explode, no shuffle, scales with the scan exactly
    * like `text_quality`.
    */
  def textQualityModel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id", toks($"text").as("t"))
      .select($"doc_id",
        (aggregate(
          transform($"t", tk =>
            (conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % 2001 - 1000) / 1000.0),
          lit(0.0), (acc, x) => acc + x) / size($"t")).as("raw"))
      .select($"doc_id",
        round(lit(1.0) / (lit(1.0) + exp($"raw" * -8.0)), 4).as("score"),
        ($"raw" > 0.0).as("keep"))
      .orderBy($"doc_id")
  }

  private val textQualityModelSql =
    s"""WITH d AS (SELECT doc_id, ${QueryDef.toksSql()} AS t FROM documents),
      |r AS (SELECT doc_id,
      |        list_reduce(
      |          list_prepend(CAST(0.0 AS DOUBLE), list_transform(t, tk ->
      |            ((('0x' || substr(md5(tk), 1, 8))::BIGINT % 2001 - 1000) / 1000.0))),
      |          (acc, x) -> acc + x) / len(t) AS raw
      |      FROM d)
      |SELECT doc_id, round(1.0 / (1.0 + exp(raw * -8.0)), 4) AS score, raw > 0.0 AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  /** Corpus token frequencies through a Count-Min sketch
    * ([[graft.functions.SketchAggs.CountMinAgg]], depth 4 × width
    * 256): the sketch aggregates in one fixed-size buffer (map-side
    * combinable — the shuffle carries 1024 longs per partition, not
    * the vocabulary), then each distinct token reads its estimate
    * back from the broadcast single-row sketch with the same md5
    * bucket arithmetic. Estimates are exact-replayable (not just
    * bounded): the DuckDB oracle recomputes bucket sums and mins,
    * collisions and all.
    */
  def textCountmin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toksDf = Tables(spark, dir).documents
      .select(explode(toks($"text")).as("token"))
    val sketch = toksDf.agg(graft.functions.SketchAggs.countmin($"token", 4, 256).as("sk"))
    def bucket(d: Int) =
      (conv(substring(md5(concat($"token", lit(s"#$d"))), 1, 8), 16, 10)
        .cast("long") % 256 + d * 256 + 1).cast("int")
    toksDf.distinct()
      .crossJoin(broadcast(sketch))
      .select($"token",
        least((0 until 4).map(d => element_at($"sk", bucket(d))): _*).as("est_count"))
      .orderBy($"token")
  }

  private val textCountminSql =
    s"""WITH tok AS (
      |  SELECT unnest(${QueryDef.toksSql()}) AS token FROM documents),
      |tc AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
      |bk AS (SELECT token, d, ('0x' || substr(md5(token || '#' || d), 1, 8))::BIGINT % 256 AS b
      |       FROM tc, range(0, 4) t(d)),
      |bs AS (SELECT d, b, CAST(sum(c) AS BIGINT) AS s
      |       FROM bk JOIN tc USING (token) GROUP BY d, b)
      |SELECT token, min(s) AS est_count
      |FROM bk JOIN bs USING (d, b)
      |GROUP BY token ORDER BY token""".stripMargin

  /** TF-IDF top terms per document — the classic two-pass weighting:
    * per-(doc, token) term counts, a corpus document-frequency table
    * joined back, smooth idf ln((N+1)/(df+1))+1, top-5 terms per doc
    * by score. Scale: the df table is VOCABULARY-cardinality — on web
    * text (URLs, typos, code) that grows into the billions, so the
    * join carries NO broadcast hint: AQE broadcasts when the measured
    * size is small and falls back to a sort-merge join (with skew
    * splitting for hot tokens like "the") when it isn't. Only the
    * 1-row corpus count is hint-broadcast. PlanSpec pins both shapes.
    * The per-doc top-5 rides the RewriteTopK native heap.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select($"doc_id", explode(toks($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        round($"tf" * (log(($"n_docs" + 1.0) / ($"df" + 1.0)) + 1.0), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"token")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"doc_id", $"rk".cast("long").as("rk"), $"token", $"score")
      .orderBy($"doc_id", $"rk")
  }

  private val textTfidfSql =
    s"""WITH tf AS (
      |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(${QueryDef.toksSql()}) AS token
      |        FROM documents)
      |  GROUP BY doc_id, token),
      |dfx AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, token, round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS score
      |  FROM tf JOIN dfx USING (token), n),
      |r AS (SELECT doc_id, token, score,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
      |      FROM scored)
      |SELECT doc_id, rk, token, score FROM r WHERE rk <= 5
      |ORDER BY doc_id, rk""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("text_tfidf", textTfidf _, textTfidfSql),
    QueryDef.sql("text_quality_model", textQualityModel _, textQualityModelSql),
    QueryDef.sql("text_countmin", textCountmin _, textCountminSql),
    QueryDef.sql("text_stats", textStats _, textStatsSql),
    QueryDef.sql("text_quality", textQuality _, textQualitySql),
    QueryDef.sql("text_langid", textLangid _, textLangidSql),
    QueryDef.sql("text_fingerprint", textFingerprint _, textFingerprintSql),
    QueryDef.sql("text_ngrams", textNgrams _, textNgramsSql),
    QueryDef.sql("text_redact_pii", textRedactPii _, textRedactPiiSql),
    QueryDef.sql("text_decontaminate", textDecontaminate _, textDecontaminateSql),
    QueryDef.sql("text_repetition", textRepetition _, textRepetitionSql))
}
