package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave K — governance and corpus-science operators:
  * CDC merge-apply (the I/U/D generalization of the SCD-1 upsert),
  * a declarative data-expectations suite evaluated in one scan, a
  * multinomial Naive Bayes language classifier with its confusion
  * matrix, exact dynamic-time-warping distance via an anti-diagonal
  * wavefront fold, and per-source distinctive terms by Dirichlet
  * log-odds. Everything reduces on exact longs: doubles appear only
  * inside per-term quantization (the mutual-info 1e6/1e9 rule) or as
  * the final-mile identical rounded expression.
  */
object CurateQ {

  // ----------------------------------------------------------- etl_cdc_apply
  /** Change-data-capture apply: a versioned I/U/D log compacted onto a
    * base snapshot, latest version wins, delete tombstones drop the
    * row — the merge-on-read compaction every CDC lake (Hudi/Iceberg
    * style) runs. The log here derives deterministically from orders
    * (base = keys %10<8, inserts = the rest, an update wave at %7,
    * tombstones at %13) so the oracle replays it bit-for-bit. Shape:
    * ONE shuffle on the key for the row_number compaction — identical
    * at 100 TB, where the window per key is the standard
    * merge-on-read pattern (no driver state, no collect).
    */
  def etlCdcApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
      .select($"o_orderkey", $"o_orderstatus",
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val base = o.filter($"o_orderkey" % 10 < 8)
      .select($"o_orderkey", $"o_orderstatus", $"cents",
        lit(0L).as("version"), lit("B").as("op"))
    val ins = o.filter($"o_orderkey" % 10 >= 8)
      .select($"o_orderkey", $"o_orderstatus", $"cents",
        lit(1L).as("version"), lit("I").as("op"))
    val upd = o.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_orderstatus", expr("(cents * 11) div 10").as("cents"),
        lit(2L).as("version"), lit("U").as("op"))
    val del = o.filter($"o_orderkey" % 13 === 0)
      .select($"o_orderkey", $"o_orderstatus", lit(0L).as("cents"),
        lit(3L).as("version"), lit("D").as("op"))
    base.unionByName(ins).unionByName(upd).unionByName(del)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"o_orderkey").orderBy($"version".desc)))
      .filter($"rk" === 1 && $"op" =!= "D")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum($"cents").as("total_cents"),
        sum(when($"op" === "B", 1L).otherwise(0L)).as("n_base"),
        sum(when($"op" === "I", 1L).otherwise(0L)).as("n_inserted"),
        sum(when($"op" === "U", 1L).otherwise(0L)).as("n_updated"))
      .orderBy($"o_orderstatus")
  }

  private[queries] val etlCdcApplySql =
    """WITH o AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |log AS (
      |  SELECT o_orderkey, o_orderstatus, cents, 0 AS version, 'B' AS op
      |  FROM o WHERE o_orderkey % 10 < 8
      |  UNION ALL SELECT o_orderkey, o_orderstatus, cents, 1, 'I'
      |  FROM o WHERE o_orderkey % 10 >= 8
      |  UNION ALL SELECT o_orderkey, o_orderstatus, (cents * 11) // 10, 2, 'U'
      |  FROM o WHERE o_orderkey % 7 = 0
      |  UNION ALL SELECT o_orderkey, o_orderstatus, 0, 3, 'D'
      |  FROM o WHERE o_orderkey % 13 = 0),
      |w AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rk
      |  FROM log)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST(sum(CASE WHEN op = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |  CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
      |  CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
      |FROM w WHERE rk = 1 AND op <> 'D'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------- etl_expectations
  /** Declarative data-quality expectations (the Deequ/Great
    * Expectations surface) evaluated in ONE scan of lineitem: row
    * count, completeness, primary-key uniqueness, numeric range, set
    * membership, non-negativity, and a bounded-domain check — each
    * emitted as (check, observed, passed). The whole suite is a
    * single aggregate row unpivoted by stack(); the only second pass
    * is the exact distinct count for uniqueness (l_linenumber ∈ 1..7,
    * so key*8+line is collision-free in a long). The uniqueness check
    * FAILS on this lake — the synthetic generator really emits
    * duplicate (orderkey, linenumber) pairs, and surfacing that is
    * the suite's job (CurateSpec pins the count against an
    * independent recount). At 100 TB: one scan, map-side combinable,
    * constant output.
    */
  def etlExpectations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .agg(
        count(lit(1)).as("row_count"),
        sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("null_shipdate"),
        (count(lit(1)) - countDistinct(expr("l_orderkey * 8 + l_linenumber"))).as("dup_pk"),
        sum(when($"l_quantity" < 1 || $"l_quantity" > 50, 1L).otherwise(0L)).as("qty_oob"),
        sum(when(!$"l_returnflag".isin("A", "N", "R"), 1L).otherwise(0L)).as("bad_flag"),
        sum(when($"l_extendedprice" < 0, 1L).otherwise(0L)).as("neg_price"),
        sum(when($"l_discount" < 0 || $"l_discount" > 0.1, 1L).otherwise(0L)).as("disc_oob"))
      .select(expr(
        """stack(7,
          |  'completeness_l_shipdate', null_shipdate,
          |  'nonnegative_l_extendedprice', neg_price,
          |  'range_l_discount_0_01', disc_oob,
          |  'range_l_quantity_1_50', qty_oob,
          |  'row_count', row_count,
          |  'set_l_returnflag_anr', bad_flag,
          |  'uniqueness_pk', dup_pk) AS (check, observed)""".stripMargin))
      .select($"check", $"observed",
        when($"check" === "row_count", $"observed" > 0)
          .otherwise($"observed" === 0).as("passed"))
      .orderBy($"check")
  }

  private val etlExpectationsSql =
    """WITH m AS (
      |  SELECT count(*) AS row_count,
      |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
      |    count(*) - count(DISTINCT l_orderkey * 8 + l_linenumber) AS dup_pk,
      |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_oob,
      |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag,
      |    CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS disc_oob
      |  FROM lineitem),
      |s AS (
      |  SELECT 'completeness_l_shipdate' AS "check", null_shipdate AS observed FROM m
      |  UNION ALL SELECT 'nonnegative_l_extendedprice', neg_price FROM m
      |  UNION ALL SELECT 'range_l_discount_0_01', disc_oob FROM m
      |  UNION ALL SELECT 'range_l_quantity_1_50', qty_oob FROM m
      |  UNION ALL SELECT 'row_count', row_count FROM m
      |  UNION ALL SELECT 'set_l_returnflag_anr', bad_flag FROM m
      |  UNION ALL SELECT 'uniqueness_pk', dup_pk FROM m)
      |SELECT "check", observed,
      |  CASE WHEN "check" = 'row_count' THEN observed > 0 ELSE observed = 0 END AS passed
      |FROM s ORDER BY "check"""".stripMargin

  // -------------------------------------------------------- q_naive_bayes
  /** Multinomial Naive Bayes language classifier trained on the 80%
    * split (doc_id %5 ≠ 0), evaluated on the held-out 20% — the
    * classic bag-of-words fasttext-predecessor, emitted as a
    * confusion matrix. Laplace-smoothed per-class token
    * log-likelihoods are quantized to integer micro-nats BEFORE the
    * per-document sum (integer addition is order-free, so partition
    * order can never flip a prediction), and argmax ties break to the
    * smaller label. Scale shape: the class-count table is
    * vocabulary-cardinality, so its join carries NO broadcast hint
    * (the tfidf rule — AQE decides); the 5-row class metadata table
    * rides along broadcast. min-df 3 prunes the hapax tail from the
    * model exactly as CCNet prunes its LM.
    */
  def qNaiveBayes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val tc = docs
      .select($"doc_id", $"lang", explode(TextFns.toks($"text")).as("t"))
      .select($"doc_id", $"lang", regexp_replace($"t", "[^a-z0-9]", "").as("w"))
      .filter($"w" =!= "")
      .groupBy($"doc_id", $"lang", $"w").agg(count(lit(1)).as("c"))
    val train = tc.filter($"doc_id" % 5 =!= 0)
    val vocab = train.groupBy($"w").agg(sum($"c").as("fw"))
      .filter($"fw" >= 3).select($"w")
    val vn = vocab.agg(count(lit(1)).as("v"))
    val cls = train.join(vocab, "w")
      .groupBy($"lang".as("model_lang"), $"w").agg(sum($"c").as("cnt"))
    val tot = cls.groupBy($"model_lang").agg(sum($"cnt").as("tot"))
    val priors = docs.filter($"doc_id" % 5 =!= 0)
      .groupBy($"lang".as("model_lang")).agg(count(lit(1)).as("dl"))
      .crossJoin(docs.filter($"doc_id" % 5 =!= 0).agg(count(lit(1)).as("dtot")))
    val langs = priors.join(tot, "model_lang").crossJoin(vn)
      .select($"model_lang", $"tot", $"v",
        expr("CAST(round(ln(CAST(dl AS DOUBLE) / dtot) * 1000000) AS BIGINT)").as("prior_e6"))
    val test = tc.filter($"doc_id" % 5 === 0).join(vocab, "w")
      .select($"doc_id", $"lang".as("true_lang"), $"w", $"c")
    val terms = test.crossJoin(langs)
      .join(cls, Seq("model_lang", "w"), "left")
      .select($"doc_id", $"true_lang", $"model_lang",
        ($"c" * expr("CAST(round(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)) * 1000000) AS BIGINT)")).as("term"))
    val tokenScore = terms.groupBy($"doc_id", $"true_lang", $"model_lang")
      .agg(sum($"term").as("tscore"))
    val scored = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"lang".as("true_lang"))
      .crossJoin(langs.select($"model_lang", $"prior_e6"))
      .join(tokenScore, Seq("doc_id", "true_lang", "model_lang"), "left")
      .select($"doc_id", $"true_lang", $"model_lang",
        (coalesce($"tscore", lit(0L)) + $"prior_e6").as("score_e6"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score_e6".desc, $"model_lang")))
      .filter($"rk" === 1)
      .groupBy($"true_lang".as("lang"), $"model_lang".as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_true", sum($"n").over(Window.partitionBy($"lang")))
      .select($"lang", $"pred_lang", $"n", $"n_true",
        round($"n".cast("double") / $"n_true", 4).as("share_of_true"))
      .orderBy($"lang", $"pred_lang")
  }

  private val qNaiveBayesSql =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, regexp_replace(t, '[^a-z0-9]', '', 'g') AS w
       |  FROM (SELECT doc_id, lang, unnest(${QueryDef.toksSql()}) AS t FROM documents)),
       |tc AS (
       |  SELECT doc_id, lang, w, count(*) AS c FROM tk WHERE w <> '' GROUP BY 1, 2, 3),
       |train AS (SELECT * FROM tc WHERE doc_id % 5 <> 0),
       |vocab AS (SELECT w FROM train GROUP BY w HAVING sum(c) >= 3),
       |vn AS (SELECT count(*) AS v FROM vocab),
       |cls AS (
       |  SELECT lang AS model_lang, w, CAST(sum(c) AS BIGINT) AS cnt
       |  FROM train JOIN vocab USING (w) GROUP BY 1, 2),
       |tot AS (SELECT model_lang, CAST(sum(cnt) AS BIGINT) AS tot FROM cls GROUP BY 1),
       |pri AS (
       |  SELECT lang AS model_lang, count(*) AS dl FROM documents
       |  WHERE doc_id % 5 <> 0 GROUP BY 1),
       |dt AS (SELECT count(*) AS dtot FROM documents WHERE doc_id % 5 <> 0),
       |langs AS (
       |  SELECT p.model_lang, t.tot, vn.v,
       |    CAST(round(ln(CAST(dl AS DOUBLE) / dtot) * 1000000) AS BIGINT) AS prior_e6
       |  FROM pri p JOIN tot t ON p.model_lang = t.model_lang, dt, vn),
       |test AS (
       |  SELECT doc_id, lang AS true_lang, w, c FROM tc
       |  WHERE doc_id % 5 = 0 AND w IN (SELECT w FROM vocab)),
       |terms AS (
       |  SELECT doc_id, true_lang, l.model_lang,
       |    c * CAST(round(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)) * 1000000) AS BIGINT) AS term
       |  FROM test t CROSS JOIN langs l
       |  LEFT JOIN cls ON cls.model_lang = l.model_lang AND cls.w = t.w),
       |tsc AS (
       |  SELECT doc_id, true_lang, model_lang, CAST(sum(term) AS BIGINT) AS tscore
       |  FROM terms GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT d.doc_id, d.lang AS true_lang, l.model_lang,
       |    coalesce(tsc.tscore, 0) + l.prior_e6 AS score_e6
       |  FROM documents d CROSS JOIN langs l
       |  LEFT JOIN tsc ON tsc.doc_id = d.doc_id AND tsc.model_lang = l.model_lang
       |  WHERE d.doc_id % 5 = 0),
       |pred AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, model_lang) AS rk
       |  FROM scored),
       |cm AS (
       |  SELECT true_lang AS lang, model_lang AS pred_lang, count(*) AS n
       |  FROM pred WHERE rk = 1 GROUP BY 1, 2),
       |wm AS (
       |  SELECT lang, pred_lang, n,
       |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_true
       |  FROM cm)
       |SELECT lang, pred_lang, n, n_true,
       |  round(CAST(n AS DOUBLE) / n_true, 4) AS share_of_true
       |FROM wm ORDER BY lang, pred_lang""".stripMargin

  // --------------------------------------------------------------- ts_dtw
  /** Exact dynamic-time-warping distance between the purchase and
    * view daily-count series — the alignment distance behind
    * time-series clustering and template matching. The O(n·m) DP runs
    * as an anti-diagonal WAVEFRONT: cells on diagonal k depend only
    * on diagonals k−1/k−2, so each diagonal is one data-parallel
    * transform() and the whole DP is a single aggregate() fold over
    * k — no per-cell sequential dependence inside a step, |a−b| costs
    * stay in exact longs, and the oracle replays the identical
    * wavefront as a recursive CTE. State is two (la+1)-long arrays:
    * day-cardinality-bounded (the q_ship_latency rule), however large
    * the event table that feeds the daily aggregate.
    */
  def tsDtw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
    def series(et: String, name: String) =
      ev.filter($"event_type" === et)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .agg(expr("transform(array_sort(collect_list(struct(day, cnt))), x -> x.cnt)").as(name))
    series("purchase", "av").crossJoin(series("view", "bv"))
      .withColumn("la", size($"av"))
      .withColumn("lb", size($"bv"))
      .withColumn("dtw", expr(dtwExpr("av", "bv", "la", "lb")))
      .select($"la".cast("long").as("la"), $"lb".cast("long").as("lb"), $"dtw",
        round($"dtw".cast("double") / ($"la" + $"lb"), 4).as("avg_step_cost"))
  }

  /** The wavefront fold as a Spark SQL expression — factored out so
    * the spec can pin hand-computed DP truths on literal arrays.
    * INF = 1e15: far above any real path cost (≤ series length ×
    * max |Δcount|) yet safe from long overflow under the ≤(la+lb)
    * cost additions a propagated boundary value can accumulate.
    */
  def dtwExpr(av: String, bv: String, la: String, lb: String): String = {
    val INF = "1000000000000000L"
    s"""aggregate(
       |  sequence(2, $la + $lb),
       |  named_struct(
       |    'prev', transform(sequence(0, $la), i -> $INF),
       |    'pp', transform(sequence(0, $la), i -> IF(i = 0, 0L, $INF))),
       |  (st, k) -> named_struct(
       |    'prev', transform(sequence(0, $la), i ->
       |      CASE WHEN i = 0 THEN $INF
       |           WHEN k - i < 1 OR k - i > $lb THEN $INF
       |           ELSE abs(element_at($av, i) - element_at($bv, k - i)) +
       |                least(element_at(st.prev, i), element_at(st.prev, i + 1),
       |                      element_at(st.pp, i))
       |      END),
       |    'pp', st.prev),
       |  st -> element_at(st.prev, $la + 1))""".stripMargin
  }

  private val tsDtwSql =
    """WITH RECURSIVE a AS (
      |  SELECT list(cnt ORDER BY day) AS av FROM (
      |    SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
      |    FROM events WHERE event_type = 'purchase' GROUP BY 1)),
      |b AS (
      |  SELECT list(cnt ORDER BY day) AS bv FROM (
      |    SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
      |    FROM events WHERE event_type = 'view' GROUP BY 1)),
      |init AS (SELECT av, bv, len(av) AS la, len(bv) AS lb FROM a, b),
      |dp AS (
      |  SELECT 1 AS k,
      |    [1000000000000000 for i in range(0, la + 1)] AS prev,
      |    [CASE WHEN i = 0 THEN 0 ELSE 1000000000000000 END for i in range(0, la + 1)] AS pp
      |  FROM init
      |  UNION ALL
      |  SELECT k + 1,
      |    [CASE WHEN i = 0 THEN 1000000000000000
      |          WHEN k + 1 - i < 1 OR k + 1 - i > lb THEN 1000000000000000
      |          ELSE abs(av[i] - bv[k + 1 - i]) +
      |               least(prev[i], prev[i + 1], pp[i])
      |     END for i in range(0, la + 1)] AS prev,
      |    prev AS pp
      |  FROM dp, init WHERE k < la + lb)
      |SELECT CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb,
      |  prev[la + 1] AS dtw,
      |  round(CAST(prev[la + 1] AS DOUBLE) / (la + lb), 4) AS avg_step_cost
      |FROM dp, init WHERE k = la + lb""".stripMargin

  // ------------------------------------------- corpus_distinctive_terms
  /** Per-source distinctive vocabulary by log-odds ratio with a
    * Dirichlet prior (Monroe et al.'s "Fightin' Words", α = 0.5):
    * for each source, the top-3 tokens whose usage rate most exceeds
    * the rest of the corpus, ranked by the prior-smoothed z-score —
    * the corpus-analysis staple behind "what makes this domain
    * different". All inputs are integer counts; δ and its variance
    * are quantized to 1e-4 z units before ranking so both engines
    * rank identical integers. Shape: per-source counts join the
    * global vocabulary table hint-free (vocabulary-cardinality — the
    * tfidf rule), totals ride along as one broadcast row.
    */
  def corpusDistinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables(spark, dir).documents
      .select($"source", explode(TextFns.toks($"text")).as("t"))
      .select($"source", regexp_replace($"t", "[^a-z0-9]", "").as("w"))
      .filter($"w" =!= "")
    val sw = tok.groupBy($"source", $"w").agg(count(lit(1)).as("y_sw"))
    val ns = sw.groupBy($"source").agg(sum($"y_sw").as("n_s"))
    val gw = sw.groupBy($"w").agg(sum($"y_sw").as("y_w"))
    val tot = gw.agg(sum($"y_w").as("n_tot"))
    sw.join(ns, "source").join(gw, "w").crossJoin(tot)
      .withColumn("z_e4", expr(
        """CAST(round((
          |  (ln((y_sw + 0.5) / (n_s - y_sw + 0.5))
          |   - ln(((y_w - y_sw) + 0.5) / ((n_tot - n_s) - (y_w - y_sw) + 0.5)))
          |  / sqrt(1.0 / (y_sw + 0.5) + 1.0 / ((y_w - y_sw) + 0.5))
          |) * 10000) AS BIGINT)""".stripMargin))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"source").orderBy($"z_e4".desc, $"w")).cast("long"))
      .filter($"rank" <= 3)
      .select($"source", $"rank", $"w".as("token"), $"y_sw".as("n_in_source"), $"z_e4")
      .orderBy($"source", $"rank")
  }

  private val corpusDistinctiveTermsSql =
    s"""WITH tok AS (
       |  SELECT source, regexp_replace(t, '[^a-z0-9]', '', 'g') AS w
       |  FROM (SELECT source, unnest(${QueryDef.toksSql()}) AS t FROM documents)),
       |sw AS (
       |  SELECT source, w, count(*) AS y_sw FROM tok WHERE w <> '' GROUP BY 1, 2),
       |ns AS (SELECT source, CAST(sum(y_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
       |gw AS (SELECT w, CAST(sum(y_sw) AS BIGINT) AS y_w FROM sw GROUP BY 1),
       |tot AS (SELECT CAST(sum(y_w) AS BIGINT) AS n_tot FROM gw),
       |z AS (
       |  SELECT sw.source, sw.w, sw.y_sw,
       |    CAST(round((
       |      (ln((y_sw + 0.5) / (n_s - y_sw + 0.5))
       |       - ln(((y_w - y_sw) + 0.5) / ((n_tot - n_s) - (y_w - y_sw) + 0.5)))
       |      / sqrt(1.0 / (y_sw + 0.5) + 1.0 / ((y_w - y_sw) + 0.5))
       |    ) * 10000) AS BIGINT) AS z_e4
       |  FROM sw JOIN ns USING (source) JOIN gw USING (w), tot),
       |rk AS (
       |  SELECT source, CAST(row_number() OVER (
       |      PARTITION BY source ORDER BY z_e4 DESC, w) AS BIGINT) AS rank,
       |    w AS token, y_sw AS n_in_source, z_e4
       |  FROM z)
       |SELECT source, rank, token, n_in_source, z_e4
       |FROM rk WHERE rank <= 3 ORDER BY source, rank""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_cdc_apply", etlCdcApply _, etlCdcApplySql),
    QueryDef.sql("etl_expectations", etlExpectations _, etlExpectationsSql),
    QueryDef.sql("q_naive_bayes", qNaiveBayes _, qNaiveBayesSql),
    QueryDef.sql("ts_dtw", tsDtw _, tsDtwSql),
    QueryDef.sql("corpus_distinctive_terms", corpusDistinctiveTerms _, corpusDistinctiveTermsSql))
}
