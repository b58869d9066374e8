package graft.queries

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 5 — lexical profiling over `documents`: a readability
  * score, cross-source vocabulary overlap, and the hashing-trick
  * featurizer. All three are scan-shaped (explode → count), share the
  * canonical tokenizer with every other text gate, and keep the
  * arithmetic on exact integer counts until a final rounded division.
  */
object LexQ {

  private def nonEmptyToks(c: Column): Column =
    filter(toks(c), t => t =!= "")

  /** Flesch-style readability per document — the classic quality
    * filter dimension next to `text_quality`'s ratio features.
    * Words/sentences/syllables are integer regex counts (the syllable
    * heuristic is vowel-group counting — deterministic and identical
    * under Java regex and RE2, unlike dictionary syllabification);
    * the score stays an UNROUNDED double: every term is a
    * deterministic IEEE op on exact integers in a fixed evaluation
    * order, so both engines produce the identical bit pattern —
    * whereas round(x, 2) is the one step whose half-case rule
    * DIFFERS cross-engine (Spark rounds the exact binary value via
    * BigDecimal HALF_UP; DuckDB rounds x·100 after its own FP
    * rounding — they disagree whenever x·100 lands within one ulp of
    * a half, which one sf0.001 doc hit). Pure map — scales with the
    * scan.
    */
  def textReadability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id",
        size(nonEmptyToks($"text")).cast("long").as("words"),
        greatest(lit(1L),
          size(regexp_extract_all($"text", lit("[.!?]+"), lit(0))).cast("long"))
          .as("sentences"),
        greatest(lit(1L),
          size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"), lit(0))).cast("long"))
          .as("syllables"))
      .filter($"words" > 0)
      .withColumn("flesch",
        lit(206.835) - lit(1.015) * ($"words".cast("double") / $"sentences") -
          lit(84.6) * ($"syllables".cast("double") / $"words"))
      .withColumn("level",
        when($"flesch" >= 70, "easy")
          .when($"flesch" >= 50, "medium").otherwise("hard"))
      .select($"doc_id", $"words", $"sentences", $"syllables", $"flesch", $"level")
      .orderBy($"doc_id")
  }

  private val textReadabilitySql = {
    val t = QueryDef.toksSql()
    s"""WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter($t, t -> t <> '')) AS BIGINT) AS words,
      |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS sentences,
      |    greatest(1, CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)) AS syllables
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, words, sentences, syllables,
      |    206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences) -
      |      84.6 * (CAST(syllables AS DOUBLE) / words) AS flesch
      |  FROM m WHERE words > 0)
      |SELECT doc_id, words, sentences, syllables, flesch,
      |  CASE WHEN flesch >= 70 THEN 'easy'
      |       WHEN flesch >= 50 THEN 'medium' ELSE 'hard' END AS level
      |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Vocabulary overlap between corpus sources: Jaccard of each
    * source pair's top-100 token sets — the cheap "are these sources
    * the same register?" probe before a full KL/perplexity read. The
    * per-source top-100 is a bounded GroupTopK-shaped window (ties
    * broken by token — exact in both engines); the pair frame comes
    * from a crossJoin of the DISTINCT source list (a handful of rows)
    * so zero-overlap pairs still appear; Jaccard divides exact set
    * cardinalities.
    */
  def corpusVocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables(spark, dir).documents
      .select($"source", explode(nonEmptyToks($"text")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"source").orderBy($"n".desc, $"token")
    val top = cnt.withColumn("rk", row_number().over(w)).filter($"rk" <= 100)
      .select($"source", $"token")
    val sizes = top.groupBy($"source").agg(count(lit(1)).as("sz"))
    val srcs = sizes.select($"source", $"sz")
    val pairs = srcs.as("a").crossJoin(broadcast(srcs.as("b")))
      .filter($"a.source" < $"b.source")
      .select($"a.source".as("source_a"), $"b.source".as("source_b"),
        $"a.sz".as("sz_a"), $"b.sz".as("sz_b"))
    val inter = top.as("x").join(top.as("y"),
        $"x.token" === $"y.token" && $"x.source" < $"y.source")
      .groupBy($"x.source".as("source_a"), $"y.source".as("source_b"))
      .agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("inter", coalesce($"inter", lit(0L)))
      .select($"source_a", $"source_b", $"inter",
        round($"inter" / ($"sz_a" + $"sz_b" - $"inter"), 4).as("jaccard"))
      .orderBy($"source_a", $"source_b")
  }

  private val corpusVocabOverlapSql = {
    val t = QueryDef.toksSql()
    s"""WITH cnt AS (
      |  SELECT source, token, count(*) AS n
      |  FROM (SELECT source, unnest(list_filter($t, t -> t <> '')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT source, token FROM (
      |    SELECT source, token,
      |      row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rk
      |    FROM cnt) WHERE rk <= 100),
      |sizes AS (SELECT source, count(*) AS sz FROM top GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    a.sz AS sz_a, b.sz AS sz_b
      |  FROM sizes a, sizes b WHERE a.source < b.source),
      |i AS (
      |  SELECT x.source AS source_a, y.source AS source_b,
      |    CAST(count(*) AS BIGINT) AS inter
      |  FROM top x JOIN top y ON x.token = y.token AND x.source < y.source
      |  GROUP BY 1, 2)
      |SELECT p.source_a, p.source_b,
      |  coalesce(i.inter, 0) AS inter,
      |  round(coalesce(i.inter, 0) / (p.sz_a + p.sz_b - coalesce(i.inter, 0)), 4) AS jaccard
      |FROM pairs p LEFT JOIN i USING (source_a, source_b)
      |ORDER BY source_a, source_b""".stripMargin
  }

  /** Hashing-trick featurizer: each token maps to one of 64 buckets
    * via md5 (the engine-replayable hash every sketch gate uses), and
    * a document's feature vector is its per-bucket token counts —
    * the fixed-dimension text representation that needs NO vocabulary
    * table, no broadcast, no fit step: the unbounded-vocab
    * scale-killer the tfidf gate documents simply never appears.
    * Explode → hash → count: scales with the scan.
    */
  def textFeatureHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id", explode(nonEmptyToks($"text")).as("token"))
      .withColumn("bucket",
        conv(substring(md5($"token"), 1, 8), 16, 10).cast("long") % 64)
      .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("weight"))
      .orderBy($"doc_id", $"bucket")
  }

  private val textFeatureHashSql = {
    val t = QueryDef.toksSql()
    s"""SELECT doc_id,
      |  CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS bucket,
      |  count(*) AS weight
      |FROM (SELECT doc_id, unnest(list_filter($t, t -> t <> '')) AS token
      |      FROM documents)
      |GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin
  }

  /** Zipf's-law fit over the top-1000 corpus tokens: OLS slope of
    * ln(freq) on ln(rank) — natural text sits near −1, templated or
    * synthetic corpora drift off it. The top-1000 comes from a
    * TakeOrderedAndProject heap (never a vocabulary sort); the rank
    * window then runs over 1000 rows of metadata. Both ln inputs are
    * NANO-QUANTIZED (round·1e9 → long → /1e9) so the regression
    * consumes bit-identical doubles in both engines, and the slope
    * rounds to 4 (the q_corr_stats co-moment precedent).
    */
  def textZipfFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables(spark, dir).documents
      .select(explode(nonEmptyToks($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
    val top = cnt.orderBy($"n".desc, $"token").limit(1000)
    val ranked = top.withColumn("rk",
      row_number().over(Window.orderBy($"n".desc, $"token")).cast("long"))
    ranked.agg(count(lit(1)).as("n_terms"),
      round(expr("regr_slope(cast(round(ln(n) * 1e9) as bigint) / 1e9," +
        " cast(round(ln(rk) * 1e9) as bigint) / 1e9)"), 4).as("zipf_slope"),
      round(expr("regr_r2(cast(round(ln(n) * 1e9) as bigint) / 1e9," +
        " cast(round(ln(rk) * 1e9) as bigint) / 1e9)"), 4).as("r2"))
  }

  private val textZipfFitSql = {
    val t = QueryDef.toksSql()
    s"""WITH cnt AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(list_filter($t, t -> t <> '')) AS token
      |        FROM documents)
      |  GROUP BY token),
      |top AS (SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT 1000),
      |ranked AS (
      |  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rk
      |  FROM top)
      |SELECT count(*) AS n_terms,
      |  round(regr_slope(CAST(round(ln(n) * 1e9) AS BIGINT) / 1e9,
      |    CAST(round(ln(rk) * 1e9) AS BIGINT) / 1e9), 4) AS zipf_slope,
      |  round(regr_r2(CAST(round(ln(n) * 1e9) AS BIGINT) / 1e9,
      |    CAST(round(ln(rk) * 1e9) AS BIGINT) / 1e9), 4) AS r2
      |FROM ranked""".stripMargin
  }

  /** Collocation mining: pointwise mutual information of the top-20
    * adjacent token pairs — PMI is what separates a true collocation
    * ("new york") from a merely-frequent pair ("of the"). All counts
    * are exact integers; corpus totals come from ONE extra
    * documents scan that only reads token-array lengths (no second
    * explode); PMI's log argument is assembled in double from exact
    * longs (overflow-safe) so both engines run ln on the identical
    * IEEE value (the text_zipf_fit precedent). Unigram lookups join
    * the 20-row top list against the vocabulary — broadcast the 20,
    * stream the vocab, never the reverse (the unbounded-vocabulary
    * broadcast is the round-3 scale-killer class).
    */
  def textBigramPmi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val toksArr = toks($"text")
    val uni = docs.select(explode(toksArr).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("uc"))
    val bi = docs
      .select(toksArr.as("t"))
      // sequence(1, 0) would count DOWN in Spark — guard 1-token docs
      .filter(size($"t") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))")).as("p"))
      .select($"p.w1", $"p.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("bc"))
    val top = bi.orderBy($"bc".desc, $"w1", $"w2").limit(20)
    val totals = docs.select(size(toksArr).as("len"))
      .agg(sum($"len".cast("long")).as("t"),
        sum(greatest($"len" - 1, lit(0)).cast("long")).as("bt"))
    top
      .join(uni.select($"tok".as("w1"), $"uc".as("uc1")), Seq("w1"))
      .join(uni.select($"tok".as("w2"), $"uc".as("uc2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select($"w1", $"w2", $"bc", $"uc1", $"uc2",
        round(log(($"bc".cast("double") * $"t" * $"t") /
          ($"bt".cast("double") * $"uc1" * $"uc2")), 6).as("pmi"))
      .orderBy($"bc".desc, $"w1", $"w2")
  }

  private val textBigramPmiSql = {
    val tk = QueryDef.toksSql()
    s"""WITH t AS (SELECT $tk AS t FROM documents),
       |uni AS (
       |  SELECT tok, count(*) AS uc
       |  FROM (SELECT unnest(t) AS tok FROM t) GROUP BY 1),
       |bi AS (
       |  SELECT w1, w2, count(*) AS bc FROM (
       |    SELECT unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))], recursive := true)
       |    FROM t)
       |  GROUP BY 1, 2),
       |top AS (SELECT * FROM bi ORDER BY bc DESC, w1, w2 LIMIT 20),
       |totals AS (
       |  SELECT CAST(sum(len(t)) AS BIGINT) AS tt,
       |    CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS bt
       |  FROM t)
       |SELECT w1, w2, bc, u1.uc AS uc1, u2.uc AS uc2,
       |  round(ln((CAST(bc AS DOUBLE) * tt * tt) /
       |    (CAST(bt AS DOUBLE) * u1.uc * u2.uc)), 6) AS pmi
       |FROM top
       |JOIN uni u1 ON u1.tok = top.w1
       |JOIN uni u2 ON u2.tok = top.w2
       |CROSS JOIN totals
       |ORDER BY bc DESC, w1, w2""".stripMargin
  }

  /** Lexical richness per source: vocabulary size, hapax legomena
    * (corpus-frequency-1 tokens — on natural text roughly half the
    * vocabulary, so a COLLAPSED hapax share is the signature of
    * templated/boilerplate text, and an inflated one flags OCR noise
    * or mojibake), type-token ratio, and the dis legomena count the
    * Zipf diagnostics want. One vocabulary-cardinality aggregate per
    * source — the same shuffle `corpus_vocab_overlap` already pays;
    * no broadcast anywhere (the q_tfidf vocabulary rule). Ratios are
    * divisions of exact longs, rounded once.
    */
  def textHapax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"source", explode(nonEmptyToks($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when($"c" === 2, 1L).otherwise(0L)).as("dis"))
      .select($"source", $"n_tokens", $"vocab", $"hapax", $"dis",
        round($"vocab" / $"n_tokens".cast("double"), 6).as("ttr"),
        round($"hapax" / $"vocab".cast("double"), 6).as("hapax_share"))
      .orderBy($"source")
  }

  private val textHapaxSql = {
    val t = QueryDef.toksSql()
    s"""WITH cnt AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(list_filter($t, x -> x <> '')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis
      |  FROM cnt GROUP BY 1)
      |SELECT source, n_tokens, vocab, hapax, dis,
      |  round(vocab / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      |  round(hapax / CAST(vocab AS DOUBLE), 6) AS hapax_share
      |FROM agg ORDER BY source""".stripMargin
  }

  /** Log₂-bucketed document-length histogram per source — the length
    * distribution read every curation recipe starts from (C4 drops
    * short docs; Gopher fences both tails; a bimodal length profile
    * flags a mixed crawl). Power-of-two buckets make the histogram
    * scale-free: `floor(log2(n_chars))` computes EXACTLY via the
    * bit length of an integer, so the gate needs no FP at all until
    * the final share division. One scan, one tiny aggregate.
    */
  def corpusLengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // floor(log2(n)) = length of the binary representation - 1 —
    // exact integer arithmetic in both engines, no FP log anywhere
    val docs = Tables(spark, dir).documents
      .select($"source", $"n_chars",
        when($"n_chars" <= 0, lit(-1L))
          .otherwise((length(conv($"n_chars", 10, 2)) - 1).cast("long")).as("bucket"))
    docs.groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .withColumn("share",
        round($"n_docs" / sum($"n_docs").over(Window.partitionBy($"source")).cast("double"), 6))
      .select($"source", $"bucket", ($"bucket" >= 0).as("valid"),
        $"n_docs", $"sum_chars", $"share")
      .orderBy($"source", $"bucket")
  }

  private val corpusLengthBucketsSql =
    """WITH b AS (
      |  SELECT source, n_chars,
      |    CASE WHEN n_chars <= 0 THEN -1
      |         ELSE CAST(length(bin(n_chars)) - 1 AS BIGINT) END AS bucket
      |  FROM documents),
      |g AS (
      |  SELECT source, bucket, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM b GROUP BY 1, 2)
      |SELECT source, bucket, bucket >= 0 AS valid, n_docs, sum_chars,
      |  round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE), 6) AS share
      |FROM g ORDER BY source, bucket""".stripMargin

  /** Per-document bigram language-model score with add-one smoothing
    * — the sequence-aware step past `text_lm_score`'s unigram model
    * (a doc of common words in impossible ORDER scores low here and
    * average there; the pair is the fluency filter). Corpus bigram
    * and unigram tables are vocabulary²-/vocabulary-cardinality and
    * deliberately carry NO broadcast hint (the tfidf rule — AQE
    * decides); only the 1-row vocabulary size broadcasts. Scoring
    * follows the lm_score arithmetic precedent: ln on exact-integer
    * ratios, per-doc weighted mean, one final rounding.
    */
  def textBigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val toksArr = toks($"text")
    val bg = docs.select($"doc_id", toksArr.as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))")).as("p"))
      .select($"doc_id", $"p.w1", $"p.w2")
      .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("tf"))
    val cb = bg.groupBy($"w1", $"w2").agg(sum($"tf").as("cb"))
    val cu = docs.select(explode(toksArr).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cu"))
    val v = cu.agg(count(lit(1)).as("v"))
    bg.join(cb, Seq("w1", "w2"))
      .join(cu.select($"tok".as("w1"), $"cu"), "w1")
      .crossJoin(broadcast(v))
      .groupBy($"doc_id")
      .agg(round(sum($"tf" * log(($"cb" + 1).cast("double") / ($"cu" + $"v"))) / sum($"tf"), 4)
        .as("bigram_lm"))
      .orderBy($"doc_id")
  }

  private val textBigramLmSql = {
    val tk = QueryDef.toksSql()
    s"""WITH t AS (SELECT doc_id, $tk AS t FROM documents),
       |bg AS (
       |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))], recursive := true)
       |    FROM t WHERE len(t) >= 2)
       |  GROUP BY 1, 2, 3),
       |cb AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
       |cu AS (
       |  SELECT tok, count(*) AS cu
       |  FROM (SELECT unnest(t) AS tok FROM t) GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM cu)
       |SELECT doc_id,
       |  round(sum(tf * ln(CAST(cb + 1 AS DOUBLE) / (cu + v))) / sum(tf), 4) AS bigram_lm
       |FROM bg JOIN cb USING (w1, w2) JOIN cu ON cu.tok = bg.w1 CROSS JOIN v
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("text_bigram_lm", textBigramLm _, textBigramLmSql),
    QueryDef.sql("text_hapax", textHapax _, textHapaxSql),
    QueryDef.sql("corpus_length_buckets", corpusLengthBuckets _, corpusLengthBucketsSql),
    QueryDef.sql("text_bigram_pmi", textBigramPmi _, textBigramPmiSql),
    QueryDef.sql("text_zipf_fit", textZipfFit _, textZipfFitSql),
    QueryDef.sql("text_readability", textReadability _, textReadabilitySql),
    QueryDef.sql("corpus_vocab_overlap", corpusVocabOverlap _, corpusVocabOverlapSql),
    QueryDef.sql("text_feature_hash", textFeatureHash _, textFeatureHashSql))
}
