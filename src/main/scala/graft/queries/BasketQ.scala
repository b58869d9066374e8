package graft.queries

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 wave 7 — contribution and association analytics: per-doc
  * n-gram novelty, market-basket association rules, and a Simpson
  * diversity index. All three stay in exact integer counts until one
  * final division (unrounded — deterministic IEEE on exact inputs).
  */
object BasketQ {

  /** Per-document trigram novelty: the share of a doc's distinct
    * trigrams whose FIRST corpus occurrence (minimum doc_id) is this
    * doc — "how much new text does each doc contribute", the
    * marginal-value read behind dedup-aware sampling. One groupBy-min
    * over the trigram explosion + a join back on (trigram) — both
    * shuffles key on the trigram, no vocabulary broadcast (the tfidf
    * rule). Novelty divides exact integers. Top-50 most-novel docs,
    * ties by doc_id.
    */
  def textNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tri = Tables(spark, dir).documents
      .select($"doc_id", explode(shingles($"text", 3)).as("tri"))
    val firstSeen = tri.groupBy($"tri").agg(min($"doc_id").as("first_doc"))
    tri.join(firstSeen, "tri")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tri"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_tri", $"n_novel",
        ($"n_novel".cast("double") / $"n_tri").as("novelty"))
      .orderBy($"novelty".desc, $"doc_id")
      .limit(50)
  }

  private val textNgramNoveltySql = {
    val t = QueryDef.toksSql()
    s"""WITH tri AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                          for i in range(1, len(t) - 1)])) AS tri
      |  FROM (SELECT doc_id, $t AS t FROM documents)),
      |f AS (SELECT tri, min(doc_id) AS first_doc FROM tri GROUP BY 1)
      |SELECT doc_id, count(*) AS n_tri,
      |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS novelty
      |FROM tri JOIN f USING (tri)
      |GROUP BY doc_id
      |ORDER BY novelty DESC, doc_id LIMIT 50""".stripMargin
  }

  /** Market-basket association rules over co-purchased parts: for
    * part pairs sharing an order, support / confidence / lift — the
    * classic recommender primitive. The pair explosion self-joins
    * lineitem on the ORDER key, so fan-out is bounded by basket size
    * squared (TPC-H baskets are ≤ 7 lines — never a cross-corpus
    * blow-up); per-part counts join back on the part keys. Lift stays
    * the exact-integer ratio (n_ab·N)/(n_a·n_b) until one double
    * division; rules rank by (n_ab DESC, pair) with a support floor.
    */
  def qBasketRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables(spark, dir).lineitem
      .select($"l_orderkey", $"l_partkey").distinct()
    val n = items.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = items.as("x").join(items.as("y"), Seq("l_orderkey"))
      .filter($"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("part_a"), $"y.l_partkey".as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 2)
    val per = items.groupBy($"l_partkey").agg(count(lit(1)).as("n_part"))
    pairs
      .join(per.withColumnRenamed("l_partkey", "part_a")
        .withColumnRenamed("n_part", "n_a"), "part_a")
      .join(per.withColumnRenamed("l_partkey", "part_b")
        .withColumnRenamed("n_part", "n_b"), "part_b")
      .crossJoin(broadcast(n))
      .select($"part_a", $"part_b", $"n_ab", $"n_a", $"n_b",
        ($"n_ab".cast("double") / $"n_orders").as("support"),
        ($"n_ab".cast("double") / $"n_a").as("confidence"),
        (($"n_ab" * $"n_orders").cast("double") / ($"n_a" * $"n_b")).as("lift"))
      .orderBy($"n_ab".desc, $"part_a", $"part_b")
      .limit(20)
  }

  private val qBasketRulesSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
      |pairs AS (
      |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
      |    count(*) AS n_ab
      |  FROM items x JOIN items y ON x.l_orderkey = y.l_orderkey
      |    AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |per AS (SELECT l_partkey, count(*) AS n_part FROM items GROUP BY 1)
      |SELECT part_a, part_b, n_ab, a.n_part AS n_a, b.n_part AS n_b,
      |  CAST(n_ab AS DOUBLE) / n_orders AS support,
      |  CAST(n_ab AS DOUBLE) / a.n_part AS confidence,
      |  CAST(n_ab * n_orders AS DOUBLE) / (a.n_part * b.n_part) AS lift
      |FROM pairs
      |JOIN per a ON a.l_partkey = part_a
      |JOIN per b ON b.l_partkey = part_b
      |CROSS JOIN n
      |ORDER BY n_ab DESC, part_a, part_b LIMIT 20""".stripMargin

  /** Simpson diversity index per source: the probability two
    * independently drawn tokens differ — Σ nᵢ(nᵢ−1)/(N(N−1))
    * complemented. Unlike entropy this needs NO libm at all: the
    * numerator and denominator are exact integers end to end, one
    * division at the end — the strongest parity class. Low diversity
    * = templated source (the entropy gate's exact sibling).
    */
  def corpusSimpsonIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables(spark, dir).documents
      .select($"source", explode(filter(toks($"text"), t => t =!= "")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
    cnt.groupBy($"source")
      .agg(sum($"n").as("n_tokens"), count(lit(1)).as("vocab"),
        sum($"n" * ($"n" - 1)).as("same_pairs"))
      .select($"source", $"n_tokens", $"vocab",
        (lit(1.0) - $"same_pairs".cast("double") /
          ($"n_tokens" * ($"n_tokens" - 1)).cast("double")).as("diversity"))
      .orderBy($"source")
  }

  private val corpusSimpsonIndexSql = {
    val t = QueryDef.toksSql()
    s"""WITH cnt AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT source, unnest(list_filter($t, t -> t <> '')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
      |  count(*) AS vocab,
      |  1.0 - CAST(sum(n * (n - 1)) AS DOUBLE) /
      |    CAST(CAST(sum(n) AS BIGINT) * (CAST(sum(n) AS BIGINT) - 1) AS DOUBLE) AS diversity
      |FROM cnt GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q_item_recs
  /** Item-item collaborative filtering over the co-purchase matrix —
    * the classic "customers who bought X also bought Y" recommender:
    * cosine similarity on binary order-incidence vectors reduces to
    * n_ab/√(n_a·n_b) over pure co-occurrence COUNTS, so the whole
    * model is two integer aggregates + a basket-keyed pair join (the
    * q_basket_rules frame — fan-out bounded by basket size², never
    * cross-corpus). Scores are one identical double expression ranked
    * with (score desc, id) ties; top-5 per part through the native
    * bounded-heap tier. Exact oracle.
    */
  def qItemRecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    val per = li.groupBy($"p").agg(count(lit(1)).as("n"))
    val pairs = li.as("a").join(li.as("b"), "o")
      .filter($"a.p" < $"b.p")
      .groupBy($"a.p".as("pa"), $"b.p".as("pb"))
      .agg(count(lit(1)).as("n_ab"))
    val sym = pairs.select($"pa".as("part"), $"pb".as("rec"), $"n_ab")
      .unionByName(pairs.select($"pb".as("part"), $"pa".as("rec"), $"n_ab"))
    val scored = sym
      .join(per.select($"p".as("part"), $"n".as("na")), "part")
      .join(per.select($"p".as("rec"), $"n".as("nb")), "rec")
      .withColumn("score", expr(
        "CAST(n_ab AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * nb)"))
    graft.operators.TopK(scored,
        Seq($"part"), Seq($"score".desc, $"rec"), 5)
      .select($"part", $"rec", $"n_ab",
        round($"score", 4).as("score"), $"rk".cast("long").as("rk"))
      .orderBy($"part", $"rk")
  }

  private val qItemRecsSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |per AS (SELECT p, count(*) AS n FROM li GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*) AS n_ab
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT pa AS part, pb AS rec, n_ab FROM pairs
      |  UNION ALL
      |  SELECT pb, pa, n_ab FROM pairs),
      |scored AS (
      |  SELECT part, rec, n_ab,
      |    CAST(n_ab AS DOUBLE) / sqrt(CAST(na.n AS DOUBLE) * nb.n) AS score
      |  FROM sym JOIN per na ON na.p = part JOIN per nb ON nb.p = rec),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY part ORDER BY score DESC, rec) AS rk
      |  FROM scored)
      |SELECT part, rec, CAST(n_ab AS BIGINT) AS n_ab, round(score, 4) AS score, rk
      |FROM r WHERE rk <= 5 ORDER BY part, rk""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("text_ngram_novelty", textNgramNovelty _, textNgramNoveltySql),
    QueryDef.sql("q_basket_rules", qBasketRules _, qBasketRulesSql),
    QueryDef.sql("corpus_simpson_index", corpusSimpsonIndex _, corpusSimpsonIndexSql),
    QueryDef.sql("q_item_recs", qItemRecs _, qItemRecsSql))
}
