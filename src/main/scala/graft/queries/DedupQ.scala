package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup queries over `documents`/`embeddings` (SURVEY.md §2.3). */
object DedupQ {

  /** Exact dedup on raw content hash; survivors with copy counts. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.exact(Tables(spark, dir).documents, "doc_id", md5($"text"))
      .orderBy($"doc_id")
  }

  private val dedupExactSql =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin

  /** Exact dedup after canonical normalization. */
  def dedupExactNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.exact(Tables(spark, dir).documents, "doc_id",
        md5(TextFns.normalized($"text")))
      .orderBy($"doc_id")
  }

  private val dedupExactNormSql =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')))
      |ORDER BY doc_id""".stripMargin

  /** Exact word-3-gram Jaccard near-dup pairs (>= 0.6) via inverted
    * shingle index — exact, so DuckDB recomputes it as the oracle.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.ngramJaccardPairs(Tables(spark, dir).documents, "doc_id", "text", n = 3, tau = 0.6)
      .orderBy($"id_a", $"id_b")
  }

  private val dedupNgramJaccardSql =
    """WITH s AS (SELECT doc_id, string_split_regex(lower(trim(text)),'\s+') AS t FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
      |         THEN list_distinct([t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1, len(t)-1)])
      |         ELSE [array_to_string(t, ' ')] END AS toks FROM s),
      |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        len(list_intersect(a.toks, b.toks)) * 1.0 /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(jaccard, 4) AS jaccard
      |FROM j WHERE jaccard >= 0.6 ORDER BY id_a, id_b""".stripMargin

  /** MinHash(128) + LSH(16 bands × 8 rows) candidates, verified by
    * exact token-set Jaccard >= 0.9. Probabilistic recall — rows-only
    * oracle; DedupSpec measures recall vs the exact pair set.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.minhashLshPairs(Tables(spark, dir).documents, "doc_id", "text",
        perms = 128, bands = 16, tau = 0.9)
      .orderBy($"id_a", $"id_b")
  }

  /** SimHash-64 near-dup pairs (Hamming <= 6) via 4×16-bit band
    * blocking. Fully deterministic — the token hash is the first 8
    * bytes of md5, so the DuckDB oracle recomputes the whole
    * signature (64 weighted bit votes), the band-blocking predicate
    * AND the Hamming filter bit for bit.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.simhashPairs(Tables(spark, dir).documents, "doc_id", "text", maxDist = 6)
      .orderBy($"id_a", $"id_b")
  }

  private val dedupSimhashSql: String = {
    // one vote column per bit: sum of ±w by whether md5-bit b is set
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN (h64 >> $b) & 1 = 1 THEN w ELSE -w END) AS v$b").mkString(",\n    ")
    // signed 64-bit assembly: bits 0..62 positive terms, bit 63 is the sign bit
    val low = (0 until 63).map(b =>
      s"(CASE WHEN v$b > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << $b)").mkString(" +\n    ")
    val bands = (0 until 4).map(b =>
      s"((xor(a.simhash, b.simhash) >> ${b * 16}) & 65535) = 0").mkString(" OR ")
    s"""WITH tk AS (
       |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents)
       |  GROUP BY doc_id, tok),
       |h AS (SELECT doc_id, w, CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h64 FROM tk),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM h GROUP BY doc_id),
       |sig AS (
       |  SELECT doc_id,
       |    $low +
       |    (CASE WHEN v63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END) AS simhash
       |  FROM votes)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE ($bands)
       |  AND bit_count(xor(a.simhash, b.simhash)) <= 6
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Embedding-cosine near-dup pairs (>= 0.45 — sits in a measured
    * gap of the corpus similarity distribution). DuckDB oracle casts
    * to DOUBLE[] for bit-identical math.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.embeddingPairs(Tables(spark, dir).embeddings, "vec_id", "embedding", tau = 0.45)
      .orderBy($"id_a", $"id_b")
  }

  private val dedupEmbeddingSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin

  /** LSH-banded embedding near-dup — the scale path ([[Dedup
    * .embeddingPairsLsh]]): no all-pairs step; exact-cosine verify
    * makes precision 1.0, recall measured ≥0.95 in DedupSpec against
    * the exact variant. Rows-only oracle (probabilistic recall).
    */
  def dedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.embeddingPairsLsh(Tables(spark, dir).embeddings, "vec_id", "embedding", tau = 0.45)
      .orderBy($"id_a", $"id_b")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("dedup_exact", dedupExact _, dedupExactSql),
    QueryDef.sql("dedup_exact_norm", dedupExactNorm _, dedupExactNormSql),
    QueryDef.sql("dedup_ngram_jaccard", dedupNgramJaccard _, dedupNgramJaccardSql),
    QueryDef.rowsOnly("dedup_minhash_lsh", dedupMinhashLsh _),
    QueryDef.sql("dedup_simhash", dedupSimhash _, dedupSimhashSql),
    QueryDef.sql("dedup_embedding", dedupEmbedding _, dedupEmbeddingSql),
    QueryDef.rowsOnly("dedup_embedding_lsh", dedupEmbeddingLsh _))
}
