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
    """SELECT doc_id, length(text) AS n_chars,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Quality scoring: length, alpha ratio, stopword ratio, mean word
    * length → composite in [0,1].
    */
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
        round(
          least(lit(1.0), $"n_chars" / lit(500.0)) * 0.25 +
            ($"n_alpha" / $"n_chars") * 0.25 +
            (lit(1.0) - $"n_stop" / $"n_tokens") * 0.25 +
            least(lit(1.0), (($"n_chars" - ($"n_tokens" - lit(1))) / $"n_tokens") / lit(8.0)) * 0.25,
          4).as("quality_score"))
      .orderBy($"doc_id")
  }

  private val textQualitySql =
    """WITH d AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
      |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
      |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
      |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
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

  /** Marker-word language ID with deterministic alphabetical
    * tie-break; `correct` compares against the labeled lang.
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withCounts = Markers.foldLeft(Tables(spark, dir).documents) {
      case (df, (lang, words)) => df.withColumn(s"c_$lang", tokensIn($"text", words))
    }
    val g = greatest(Markers.map { case (l, _) => col(s"c_$l") }: _*)
    val pred = Markers.foldRight(lit("unknown")) { case ((l, _), acc) =>
      when(col(s"c_$l") === g && g > 0, l).otherwise(acc)
    }
    // foldRight gives de > en > es > fr precedence (alphabetical)
    val outCols = Seq($"doc_id", $"lang") ++
      Markers.map { case (l, _) => col(s"c_$l") } :+ pred.as("pred_lang")
    withCounts
      .select(outCols: _*)
      .withColumn("correct", $"pred_lang" === $"lang")
      .orderBy($"doc_id")
  }

  private val textLangidSql =
    """WITH c AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split_regex(lower(trim(text)),'\s+'), t -> t IN ('der','die','und','das'))) AS c_de,
      |    len(list_filter(string_split_regex(lower(trim(text)),'\s+'), t -> t IN ('the','and','of','is'))) AS c_en,
      |    len(list_filter(string_split_regex(lower(trim(text)),'\s+'), t -> t IN ('el','los','y','las'))) AS c_es,
      |    len(list_filter(string_split_regex(lower(trim(text)),'\s+'), t -> t IN ('le','la','et','les'))) AS c_fr
      |  FROM documents)
      |SELECT doc_id, lang, c_de, c_en, c_es, c_fr,
      |  CASE WHEN greatest(c_de,c_en,c_es,c_fr) = 0 THEN 'unknown'
      |       WHEN c_de = greatest(c_de,c_en,c_es,c_fr) THEN 'de'
      |       WHEN c_en = greatest(c_de,c_en,c_es,c_fr) THEN 'en'
      |       WHEN c_es = greatest(c_de,c_en,c_es,c_fr) THEN 'es'
      |       ELSE 'fr' END AS pred_lang,
      |  (CASE WHEN greatest(c_de,c_en,c_es,c_fr) = 0 THEN 'unknown'
      |       WHEN c_de = greatest(c_de,c_en,c_es,c_fr) THEN 'de'
      |       WHEN c_en = greatest(c_de,c_en,c_es,c_fr) THEN 'en'
      |       WHEN c_es = greatest(c_de,c_en,c_es,c_fr) THEN 'es'
      |       ELSE 'fr' END) = lang AS correct
      |FROM c ORDER BY doc_id""".stripMargin

  /** Canonical token-sort document fingerprint (md5 parity). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id", fingerprint($"text").as("fingerprint"))
      .orderBy($"doc_id")
  }

  private val textFingerprintSql =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split_regex(lower(trim(text)), '\s+'))), ' ')) AS fingerprint
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
    """WITH t AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      |bi AS (SELECT unnest(list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])) AS bigram FROM t)
      |SELECT bigram, count(*) AS n FROM bi
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("text_stats", textStats _, textStatsSql),
    QueryDef.sql("text_quality", textQuality _, textQualitySql),
    QueryDef.sql("text_langid", textLangid _, textLangidSql),
    QueryDef.sql("text_fingerprint", textFingerprint _, textFingerprintSql),
    QueryDef.sql("text_ngrams", textNgrams _, textNgramsSql))
}
