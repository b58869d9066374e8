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
    * blocking. Rows-only oracle; DedupSpec pins the signature
    * determinism and fixture behavior.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.simhashPairs(Tables(spark, dir).documents, "doc_id", "text", maxDist = 6)
      .orderBy($"id_a", $"id_b")
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
    QueryDef.rowsOnly("dedup_simhash", dedupSimhash _),
    QueryDef.sql("dedup_embedding", dedupEmbedding _, dedupEmbeddingSql),
    QueryDef.rowsOnly("dedup_embedding_lsh", dedupEmbeddingLsh _))
}
