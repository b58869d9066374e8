package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 pattern wave: the BPE pair-count step (the tokenizer-
  * training primitive), a language-ID confusion matrix (classifier
  * evaluation as a first-class query), gaps-and-islands activity
  * streaks, a Hampel rolling-median outlier filter, and an A/B
  * sample-ratio-mismatch check. Everything reduces on exact longs;
  * doubles are final-mile identical expressions.
  */
object PatternQ {

  // ---------------------------------------------------------- text_bpe_pairs

  /** The byte-pair-encoding training step: count adjacent symbol
    * pairs across the corpus vocabulary (each token weighted by its
    * frequency, '#' as the end-of-word sentinel) and surface the
    * top-20 merge candidates — the argmax BPE would merge first.
    * Distributed shape: the corpus folds to a vocabulary-sized count
    * table map-side FIRST (pairs explode over the vocab, not the
    * corpus — at 100 TB that is the difference between touching every
    * token occurrence twice and touching each distinct token once).
    */
  def textBpePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables(spark, dir).documents
      .select(explode(TextFns.toks($"text")).as("t"))
      .select(regexp_replace($"t", "[^a-z0-9]", "").as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    vocab
      .withColumn("w2", concat($"w", lit("#")))
      .select($"freq", explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w2, i, 2))")).as("pair"))
      .groupBy($"pair").agg(sum($"freq").as("n"))
      .withColumn("rank", row_number().over(Window.orderBy($"n".desc, $"pair")).cast("long"))
      .filter($"rank" <= 20)
      .select($"rank", $"pair", $"n")
  }

  private val textBpePairsSql =
    s"""WITH vocab AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT regexp_replace(unnest(${QueryDef.toksSql()}), '[^a-z0-9]', '', 'g') AS w
       |    FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |pairs AS (
       |  SELECT freq, unnest([substr(w || '#', i, 2) for i in range(1, len(w) + 1)]) AS pair
       |  FROM vocab),
       |cnt AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM pairs GROUP BY pair),
       |rk AS (
       |  SELECT CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank, pair, n
       |  FROM cnt)
       |SELECT rank, pair, n FROM rk WHERE rank <= 20""".stripMargin

  // ------------------------------------------------------ corpus_langid_eval

  /** Language-ID confusion matrix: the `text_langid` classifier
    * evaluated against the corpus labels — per (true, predicted)
    * cell counts plus each cell's share of its true-language row
    * (recall on the diagonal). Classifier evaluation as one
    * aggregate over the per-doc prediction plan; the matrix is
    * languages² metadata however large the corpus.
    */
  def corpusLangidEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Text.langidOf(Tables(spark, dir).documents)
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_true", sum($"n").over(Window.partitionBy($"lang")))
      .select($"lang", $"pred_lang", $"n", $"n_true",
        round($"n".cast("double") / $"n_true", 4).as("share_of_true"))
      .orderBy($"lang", $"pred_lang")
  }

  private val corpusLangidEvalSql =
    s"""WITH c AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('der','die','und','das'))) AS c_de,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('the','and','of','is'))) AS c_en,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('el','los','y','las'))) AS c_es,
      |    len(list_filter(${QueryDef.toksSql()}, t -> t IN ('le','la','et','les'))) AS c_fr,
      |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS c_zh
      |  FROM documents),
      |g AS (
      |  SELECT lang,
      |    CASE WHEN greatest(c_de,c_en,c_es,c_fr,c_zh) = 0 THEN 'unknown'
      |         WHEN c_de = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'de'
      |         WHEN c_en = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'en'
      |         WHEN c_es = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'es'
      |         WHEN c_fr = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'fr'
      |         ELSE 'zh' END AS pred_lang
      |  FROM c),
      |cm AS (SELECT lang, pred_lang, count(*) AS n FROM g GROUP BY 1, 2),
      |w AS (
      |  SELECT lang, pred_lang, n,
      |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_true
      |  FROM cm)
      |SELECT lang, pred_lang, n, n_true,
      |  round(CAST(n AS DOUBLE) / n_true, 4) AS share_of_true
      |FROM w ORDER BY lang, pred_lang""".stripMargin

  // -------------------------------------------------------------- q_streaks

  /** Gaps-and-islands: each user's longest run of CONSECUTIVE active
    * days from the event stream — the engagement-streak staple. The
    * island key is day − dense_rank(day) (constant within a
    * consecutive run, integer end to end); two bounded aggregates
    * over the per-user distinct-day table, top-20 via TakeOrdered
    * heaps. Per-user state is its distinct-day count, never the raw
    * events.
    */
  def qStreaks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables(spark, dir).events
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val islands = days
      .withColumn("rk", dense_rank().over(
        Window.partitionBy($"user_id").orderBy($"day")))
      .groupBy($"user_id", ($"day" - $"rk").as("island"))
      .agg(count(lit(1)).as("len"), min($"day").as("start_day"), max($"day").as("end_day"))
    val best = islands
      .withColumn("pick", row_number().over(
        Window.partitionBy($"user_id").orderBy($"len".desc, $"start_day")))
      .filter($"pick" === 1)
    val nDays = days.groupBy($"user_id").agg(count(lit(1)).as("n_active_days"))
    best.join(nDays, "user_id")
      .withColumn("rank", row_number().over(
        Window.orderBy($"len".desc, $"user_id")).cast("long"))
      .filter($"rank" <= 20)
      .select($"rank", $"user_id", $"n_active_days",
        $"len".as("longest_streak"), $"start_day", $"end_day")
  }

  private val qStreaksSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |isl AS (
      |  SELECT user_id, day,
      |    day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM days),
      |runs AS (
      |  SELECT user_id, island, count(*) AS len,
      |    min(day) AS start_day, max(day) AS end_day
      |  FROM isl GROUP BY 1, 2),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS pick
      |  FROM runs),
      |nd AS (SELECT user_id, count(*) AS n_active_days FROM days GROUP BY user_id),
      |rk AS (
      |  SELECT CAST(row_number() OVER (ORDER BY len DESC, b.user_id) AS BIGINT) AS rank,
      |    b.user_id, nd.n_active_days, b.len AS longest_streak, b.start_day, b.end_day
      |  FROM best b JOIN nd ON b.user_id = nd.user_id WHERE b.pick = 1)
      |SELECT * FROM rk WHERE rank <= 20""".stripMargin

  // -------------------------------------------------------------- ts_hampel

  /** Hampel outlier filter on the daily purchase series: rolling
    * 7-day window (ROWS 3 preceding..following, full frames only),
    * median and MAD from the sorted 7-element window array — odd
    * window, so both are exact array elements, no interpolation —
    * and the classic |x − med| > 3·1.4826·MAD test cross-multiplied
    * to stay in exact integer units. The window state is 7 longs per
    * day; the series is distinct-day bounded (the q_ship_latency
    * rule).
    */
  def tsHampel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.orderBy($"day").rowsBetween(-3, 3)
    daily
      .withColumn("frame", collect_list($"cents").over(w))
      .filter(size($"frame") === 7)
      .withColumn("med", expr("array_sort(frame)[3]"))
      .withColumn("mad", expr("array_sort(transform(frame, v -> abs(v - med)))[3]"))
      .select($"day", $"cents", $"med", $"mad",
        (abs($"cents" - $"med") * 10000 > $"mad" * 3 * 14826).as("is_outlier"))
      .orderBy($"day")
  }

  private val tsHampelSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |f AS (
      |  SELECT day, cents,
      |    list(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS frame
      |  FROM daily),
      |m AS (
      |  SELECT day, cents,
      |    list_sort(frame)[4] AS med,
      |    list_sort(list_transform(frame, v -> abs(v - list_sort(frame)[4])))[4] AS mad
      |  FROM f WHERE len(frame) = 7)
      |SELECT day, cents, med, mad,
      |  abs(cents - med) * 10000 > mad * 3 * 14826 AS is_outlier
      |FROM m ORDER BY day""".stripMargin

  // ------------------------------------------------------------ q_srm_check

  /** Sample-ratio-mismatch check for the even/odd-user A/B split: the
    * 2-cell chi-square against the designed 50/50 allocation,
    * (n₀−n₁)²/n in exact integer cross-multiplication until the one
    * final division — the guardrail every experiment dashboard runs
    * before trusting a lift number. One map-side-combinable
    * aggregate.
    */
  def qSrmCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .select($"user_id").distinct()
      .agg(sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"user_id" % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))
      .select($"n_a", $"n_b",
        round((($"n_a" - $"n_b") * ($"n_a" - $"n_b")).cast("double") / ($"n_a" + $"n_b"), 4)
          .as("chi2"),
        ((($"n_a" - $"n_b") * ($"n_a" - $"n_b")).cast("double") / ($"n_a" + $"n_b") > 3.841)
          .as("srm_flag"))
  }

  private val qSrmCheckSql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |c AS (
      |  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM u)
      |SELECT n_a, n_b,
      |  round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 4) AS chi2,
      |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) > 3.841 AS srm_flag
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- registry

  // --------------------------------------------------------- q_window_funnel
  /** Strict in-order funnel inside a time window (the ClickHouse
    * `windowFunnel` shape): signup → click → purchase, each step
    * strictly after the previous and the whole chain within 24 hours of
    * the signup. Stage anchors resolve relationally — per-user min
    * signup, then the min qualifying click, then the min qualifying
    * purchase — three conditional aggregates over user-keyed joins,
    * no per-user array materialization; the funnel report is
    * stage-cardinality. Integer epoch micros end to end.
    */
  def qWindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val users = ev.select($"user_id").distinct()
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"us").as("s1"))
    val s2 = ev.filter($"event_type" === "click").as("e")
      .join(s1, "user_id")
      .filter($"us" > $"s1" && $"us" <= $"s1" + 86400000000L)
      .groupBy($"user_id").agg(min($"us").as("s2"), min($"s1").as("s1b"))
    val s3 = ev.filter($"event_type" === "purchase").as("e")
      .join(s2, "user_id")
      .filter($"us" > $"s2" && $"us" <= $"s1b" + 86400000000L)
      .groupBy($"user_id").agg(min($"us").as("s3"))
    val staged = users
      .join(s1.select($"user_id", lit(1L).as("r1")), Seq("user_id"), "left")
      .join(s2.select($"user_id", lit(1L).as("r2")), Seq("user_id"), "left")
      .join(s3.select($"user_id", lit(1L).as("r3")), Seq("user_id"), "left")
      .select($"user_id",
        (coalesce($"r1", lit(0L)) + coalesce($"r2", lit(0L)) +
          coalesce($"r3", lit(0L))).as("stage"))
    staged.groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  private val qWindowFunnelSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |users AS (SELECT DISTINCT user_id FROM ev),
      |s1 AS (
      |  SELECT user_id, min(us) AS s1 FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(us) AS s2, min(s1) AS s1b
      |  FROM ev e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND us > s1 AND us <= s1 + 86400000000
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(us) AS s3
      |  FROM ev e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND us > s2 AND us <= s1b + 86400000000
      |  GROUP BY e.user_id),
      |staged AS (
      |  SELECT u.user_id,
      |    (CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END +
      |     CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END +
      |     CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS stage
      |  FROM users u
      |  LEFT JOIN s1 ON s1.user_id = u.user_id
      |  LEFT JOIN s2 ON s2.user_id = u.user_id
      |  LEFT JOIN s3 ON s3.user_id = u.user_id)
      |SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_users
      |FROM staged GROUP BY stage ORDER BY stage""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_window_funnel", qWindowFunnel _, qWindowFunnelSql),
    QueryDef.sql("text_bpe_pairs", textBpePairs _, textBpePairsSql),
    QueryDef.sql("corpus_langid_eval", corpusLangidEval _, corpusLangidEvalSql),
    QueryDef.sql("q_streaks", qStreaks _, qStreaksSql),
    QueryDef.sql("ts_hampel", tsHampel _, tsHampelSql),
    QueryDef.sql("q_srm_check", qSrmCheck _, qSrmCheckSql))
}
