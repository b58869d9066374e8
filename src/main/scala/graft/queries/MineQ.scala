package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 mining wave: schema-type inference over an all-string
  * intake (the reference's CSV sniffing promoted to a per-column type
  * vote), RAKE keyword extraction over the document corpus, sequence-
  * pattern matching over per-user event paths (the MATCH_RECOGNIZE
  * shape), and Holt double-exponential smoothing with exact binary-
  * fraction coefficients.
  */
object MineQ {

  // ---------------------------------------------------------- etl_type_infer

  /** Column-type inference over an all-string table — what the
    * reference's dtype=str intake needs next: per column, regex
    * parse votes (integer / numeric / timestamp / boolean, Java and
    * RE2 agree on these character-class patterns) folded in ONE
    * map-side-combinable aggregate, and the inferred type by
    * precedence where EVERY non-empty value parses. The double
    * column renders through DECIMAL(14,2) so both engines see the
    * identical strings (raw double→string shortest-roundtrip
    * formatting is not a cross-engine contract).
    */
  def etlTypeInfer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders.select(
      $"o_orderkey".cast("string").as("o_orderkey"),
      $"o_custkey".cast("string").as("o_custkey"),
      $"o_orderstatus".as("o_orderstatus"),
      $"o_totalprice".cast("decimal(14,2)").cast("string").as("o_totalprice"),
      $"o_orderdate".cast("timestamp").cast("string").as("o_orderdate"),
      $"o_orderpriority".as("o_orderpriority"))
    val stacked = o.select(expr(
      """stack(6,
        |  'o_orderkey', o_orderkey, 'o_custkey', o_custkey,
        |  'o_orderstatus', o_orderstatus, 'o_totalprice', o_totalprice,
        |  'o_orderdate', o_orderdate, 'o_orderpriority', o_orderpriority)
        |  as (col_name, val)""".stripMargin))
    stacked.groupBy($"col_name")
      .agg(count(lit(1)).as("n"),
        sum(when($"val".isNull || $"val" === "", 1L).otherwise(0L)).as("n_empty"),
        sum(when($"val".rlike("^-?[0-9]+$"), 1L).otherwise(0L)).as("n_int"),
        sum(when($"val".rlike("^-?[0-9]+(\\.[0-9]+)?$"), 1L).otherwise(0L)).as("n_num"),
        sum(when($"val".rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?$"),
          1L).otherwise(0L)).as("n_ts"),
        sum(when(lower($"val").rlike("^(true|false)$"), 1L).otherwise(0L)).as("n_bool"))
      .withColumn("n_filled", $"n" - $"n_empty")
      .select($"col_name", $"n", $"n_empty", $"n_int", $"n_num", $"n_ts", $"n_bool",
        when($"n_filled" === 0, "string")
          .when($"n_int" === $"n_filled", "bigint")
          .when($"n_num" === $"n_filled", "double")
          .when($"n_ts" === $"n_filled", "timestamp")
          .when($"n_bool" === $"n_filled", "boolean")
          .otherwise("string").as("inferred_type"))
      .orderBy($"col_name")
  }

  private val etlTypeInferSql =
    """WITH s AS (
      |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS val FROM orders
      |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
      |  UNION ALL SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'o_orderdate', CAST(CAST(o_orderdate AS TIMESTAMP) AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
      |v AS (
      |  SELECT col_name, count(*) AS n,
      |    CAST(sum(CASE WHEN val IS NULL OR val = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
      |    CAST(sum(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
      |    CAST(sum(CASE WHEN regexp_matches(val, '^-?[0-9]+(\.[0-9]+)?$') THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
      |    CAST(sum(CASE WHEN regexp_matches(val, '^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?$') THEN 1 ELSE 0 END) AS BIGINT) AS n_ts,
      |    CAST(sum(CASE WHEN regexp_matches(lower(val), '^(true|false)$') THEN 1 ELSE 0 END) AS BIGINT) AS n_bool
      |  FROM s GROUP BY col_name)
      |SELECT col_name, n, n_empty, n_int, n_num, n_ts, n_bool,
      |  CASE WHEN n - n_empty = 0 THEN 'string'
      |    WHEN n_int = n - n_empty THEN 'bigint'
      |    WHEN n_num = n - n_empty THEN 'double'
      |    WHEN n_ts = n - n_empty THEN 'timestamp'
      |    WHEN n_bool = n - n_empty THEN 'boolean'
      |    ELSE 'string' END AS inferred_type
      |FROM v ORDER BY col_name""".stripMargin

  // ---------------------------------------------------------- text_keywords

  private val StopWords = Seq(
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "that", "from")

  /** RAKE keyword extraction over the corpus: token stream split into
    * candidate phrases at stopword/punctuation boundaries, word
    * scores degree/freq (degree = Σ phrase length over occurrences),
    * phrase score = Σ member word scores — all integer arithmetic
    * (scores in exact 1e-6 units via integer division), so the
    * top-15 ranking is engine-exact. Distributed shape: one explode
    * + per-doc window for phrase ids, two map-side-combinable
    * aggregates (word stats, phrase stats); the word-score table is
    * vocabulary-sized and joins hint-free (the tfidf rule — AQE
    * broadcasts it when measured small, shuffles when not).
    */
  def textKeywords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select($"doc_id", posexplode(TextFns.toks($"text")))
      .select($"doc_id", $"pos",
        regexp_replace($"col", "[^a-z0-9]", "").as("w"))
      .withColumn("bd",
        when($"w" === "" || $"w".isin(StopWords: _*), 1L).otherwise(0L))
      .withColumn("pid",
        sum($"bd").over(Window.partitionBy($"doc_id").orderBy($"pos")))
    val members = toks.filter($"bd" === 0)
      .select($"doc_id", $"pid", $"pos", $"w")
    val plen = members.groupBy($"doc_id", $"pid").agg(count(lit(1)).as("plen"))
    val wordScores = members.join(plen, Seq("doc_id", "pid"))
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"), sum($"plen").as("degree"))
      .select($"w", expr("(degree * 1000000) div freq").as("sc"))
    val phrases = members.join(wordScores, "w")
      .groupBy($"doc_id", $"pid")
      .agg(count(lit(1)).as("n_words"), sum($"sc").as("score_e6"),
        array_join(transform(array_sort(collect_list(struct($"pos", $"w"))),
          x => x.getField("w")), " ").as("phrase"))
      .filter($"n_words".between(2, 4))
    phrases.groupBy($"phrase")
      .agg(max($"n_words").as("n_words"), count(lit(1)).as("n_occurrences"),
        max($"score_e6").as("score_e6"))
      .withColumn("rank",
        row_number().over(Window.orderBy($"score_e6".desc, $"phrase")).cast("long"))
      .filter($"rank" <= 15)
      .select($"rank", $"phrase", $"n_words", $"n_occurrences", $"score_e6")
  }

  private val textKeywordsSql = {
    val stops = StopWords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_transform(${QueryDef.toksSql()}, x -> regexp_replace(x, '[^a-z0-9]', '', 'g')) AS ct
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest([{'pos': i - 1, 'w': ct[i]} for i in range(1, len(ct) + 1)],
       |    recursive := true)
       |  FROM t),
       |b AS (
       |  SELECT doc_id, pos, w,
       |    CASE WHEN w = '' OR w IN ($stops) THEN 1 ELSE 0 END AS bd
       |  FROM pos),
       |ph AS (
       |  SELECT doc_id, pos, w, bd,
       |    CAST(sum(bd) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pid
       |  FROM b),
       |m AS (SELECT doc_id, pid, pos, w FROM ph WHERE bd = 0),
       |plen AS (SELECT doc_id, pid, count(*) AS plen FROM m GROUP BY 1, 2),
       |ws AS (
       |  SELECT w, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS degree
       |  FROM m JOIN plen USING (doc_id, pid) GROUP BY w),
       |wsc AS (SELECT w, (degree * 1000000) // freq AS sc FROM ws),
       |ptext AS (
       |  SELECT doc_id, pid, count(*) AS n_words, CAST(sum(sc) AS BIGINT) AS score_e6,
       |    string_agg(w, ' ' ORDER BY pos) AS phrase
       |  FROM m JOIN wsc USING (w) GROUP BY 1, 2),
       |agg AS (
       |  SELECT phrase, max(n_words) AS n_words, count(*) AS n_occurrences,
       |    max(score_e6) AS score_e6
       |  FROM ptext WHERE n_words BETWEEN 2 AND 4 GROUP BY 1),
       |rk AS (
       |  SELECT row_number() OVER (ORDER BY score_e6 DESC, phrase) AS rank, *
       |  FROM agg)
       |SELECT rank, phrase, n_words, n_occurrences, score_e6
       |FROM rk WHERE rank <= 15""".stripMargin
  }

  // ---------------------------------------------------------- q_event_regex

  /** Sequence-pattern matching over per-user event paths — the
    * MATCH_RECOGNIZE shape: each user's events collapse (ordered by
    * ts, event_id) to a string of type initials, then a small
    * pattern table scores regex hits. Per-user state is one bounded
    * string; the pattern table is 3 rows of metadata; Java and RE2
    * agree on these character-class regexes. One shuffle on user_id,
    * then a 3-row broadcast.
    */
  def qEventRegex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val paths = Tables(spark, dir).events
      .select($"user_id", $"ts", $"event_id",
        substring($"event_type", 1, 1).as("ini"))
      .groupBy($"user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"ts", $"event_id", $"ini"))),
        x => x.getField("ini")), "").as("path"))
    val patterns = Seq(
      ("signup_then_purchase", "s.*p"),
      ("clean_conversion", "s[cv]*p"),
      ("repeat_purchase", "p.*p")).toDF("pattern_name", "pattern")
    paths.crossJoin(broadcast(patterns))
      .groupBy($"pattern_name", $"pattern")
      .agg(count(lit(1)).as("n_users"),
        sum(when(expr("path rlike pattern"), 1L).otherwise(0L)).as("n_matched"))
      .withColumn("match_rate",
        round($"n_matched".cast("double") / $"n_users", 4))
      .orderBy($"pattern_name")
  }

  private val qEventRegexSql =
    """WITH paths AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS path
      |  FROM events GROUP BY user_id),
      |pat AS (
      |  SELECT * FROM (VALUES
      |    ('signup_then_purchase', 's.*p'),
      |    ('clean_conversion', 's[cv]*p'),
      |    ('repeat_purchase', 'p.*p')) AS t(pattern_name, pattern))
      |SELECT pattern_name, pattern, count(*) AS n_users,
      |  CAST(sum(CASE WHEN regexp_matches(path, pattern) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |  round(CAST(sum(CASE WHEN regexp_matches(path, pattern) THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS match_rate
      |FROM paths CROSS JOIN pat
      |GROUP BY pattern_name, pattern ORDER BY pattern_name""".stripMargin

  // -------------------------------------------------------------- ts_holt

  /** Holt double-exponential smoothing of the daily revenue series,
    * α = β = 1/2 — binary-fraction coefficients, so both engines run
    * the IDENTICAL IEEE double recurrence (the ts_ewma discipline,
    * extended with a trend term). The serial recurrence runs inside
    * ONE `aggregate` higher-order function over the collected daily
    * array — state bounded by distinct days (the q_ship_latency
    * bounded-state rule: ~2.5k cells whatever the fact-table size),
    * never a driver collect; the daily aggregate itself is the only
    * distributed pass. The oracle replays the recurrence as a
    * recursive CTE.
    */
  def tsHolt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    daily.agg(array_sort(collect_list(struct($"day", $"cents"))).as("s"))
      .select(explode(expr(
        """aggregate(s,
          |  named_struct('l', cast(null as double), 'b', 0.0D,
          |    'out', cast(array() as array<struct<day:bigint,cents:bigint,l:double,b:double>>)),
          |  (acc, x) -> CASE WHEN acc.l IS NULL THEN
          |      named_struct('l', cast(x.cents as double), 'b', 0.0D,
          |        'out', array(named_struct('day', x.day, 'cents', x.cents,
          |          'l', cast(x.cents as double), 'b', 0.0D)))
          |    ELSE named_struct(
          |      'l', 0.5D * cast(x.cents as double) + 0.5D * (acc.l + acc.b),
          |      'b', 0.5D * ((0.5D * cast(x.cents as double) + 0.5D * (acc.l + acc.b)) - acc.l)
          |        + 0.5D * acc.b,
          |      'out', array_append(acc.out, named_struct('day', x.day, 'cents', x.cents,
          |        'l', 0.5D * cast(x.cents as double) + 0.5D * (acc.l + acc.b),
          |        'b', 0.5D * ((0.5D * cast(x.cents as double) + 0.5D * (acc.l + acc.b)) - acc.l)
          |          + 0.5D * acc.b))) END,
          |  acc -> acc.out)""".stripMargin)))
      .select($"col.day".as("day"), $"col.cents".as("cents"),
        round($"col.l" / 100, 4).as("level"),
        round($"col.b" / 100, 4).as("trend"),
        round(($"col.l" + $"col.b") / 100, 4).as("forecast_next"))
      .orderBy($"day")
  }

  /** The Holt recursion as a reusable CTE block — `ts_backtest`
    * (RobustQ) replays the identical smoother before scoring it.
    */
  private[queries] val holtCoreSql =
    """daily AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT day, cents, row_number() OVER (ORDER BY day) AS i FROM daily),
      |rec AS (
      |  SELECT i, day, cents, CAST(cents AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT t.i, t.day, t.cents,
      |    0.5 * CAST(t.cents AS DOUBLE) + 0.5 * (r.l + r.b),
      |    0.5 * ((0.5 * CAST(t.cents AS DOUBLE) + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      |  FROM rec r JOIN idx t ON t.i = r.i + 1)""".stripMargin

  private val tsHoltSql =
    s"""WITH RECURSIVE $holtCoreSql
      |SELECT day, cents, round(l / 100, 4) AS level, round(b / 100, 4) AS trend,
      |  round((l + b) / 100, 4) AS forecast_next
      |FROM rec ORDER BY day""".stripMargin

  // ------------------------------------------------------- ts_holt_winters

  /** Holt–Winters ADDITIVE seasonal smoothing (α = β = γ = 1/2,
    * season length 7) of the daily revenue series — `ts_holt` plus a
    * seasonal state vector. Deterministic seeding: level = mean of
    * the first 7 observations (one division of an exact integer sum),
    * seasonals = those observations' deviations from it, trend = 0;
    * from observation 8 on, the classic recurrences run with
    * binary-fraction coefficients, so every update is the IDENTICAL
    * IEEE double expression in both engines (the ts_holt discipline —
    * both sides are assembled from the same sub-expression strings
    * below). The serial pass runs inside ONE `aggregate` HOF over the
    * collected daily array (state = level + trend + 7 seasonal slots,
    * day-cardinality input — the q_ship_latency bounded-state rule);
    * the oracle replays it as a recursive CTE. Seasonality indexes by
    * observation position mod 7 (≡ weekday on this dense series).
    */
  def tsHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val y = "cast(x.cents as double)"
    val sv = "element_at(acc.sea, cast(acc.i % 7 as int) + 1)"
    val lp = s"(0.5D * ($y - $sv) + 0.5D * (acc.l + acc.b))"
    val bp = s"(0.5D * ($lp - acc.l) + 0.5D * acc.b)"
    val sp = s"(0.5D * ($y - $lp) + 0.5D * $sv)"
    val fc = s"(acc.l + acc.b + $sv)"
    val seedSum = "aggregate(array_append(acc.seed, x.cents), 0L, (a, v2) -> a + v2)"
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    daily.agg(array_sort(collect_list(struct($"day", $"cents"))).as("s"))
      .select(explode(expr(
        s"""aggregate(s,
          |  named_struct('i', 0L, 'seed', cast(array() as array<bigint>),
          |    'l', 0.0D, 'b', 0.0D, 'sea', cast(array() as array<double>),
          |    'out', cast(array() as array<struct<day:bigint,cents:bigint,l:double,b:double,sv:double,fc:double>>)),
          |  (acc, x) -> CASE
          |    WHEN acc.i < 6L THEN named_struct('i', acc.i + 1L,
          |      'seed', array_append(acc.seed, x.cents), 'l', 0.0D, 'b', 0.0D,
          |      'sea', acc.sea, 'out', acc.out)
          |    WHEN acc.i = 6L THEN named_struct('i', 7L,
          |      'seed', array_append(acc.seed, x.cents),
          |      'l', cast($seedSum as double) / 7.0D, 'b', 0.0D,
          |      'sea', transform(array_append(acc.seed, x.cents),
          |        v -> cast(v as double) - cast($seedSum as double) / 7.0D),
          |      'out', acc.out)
          |    ELSE named_struct('i', acc.i + 1L, 'seed', acc.seed,
          |      'l', $lp, 'b', $bp,
          |      'sea', transform(sequence(0, 6),
          |        j -> IF(cast(j as bigint) = acc.i % 7, $sp, element_at(acc.sea, j + 1))),
          |      'out', array_append(acc.out, named_struct('day', x.day, 'cents', x.cents,
          |        'l', $lp, 'b', $bp, 'sv', $sp, 'fc', $fc))) END,
          |  acc -> acc.out)""".stripMargin)))
      .select($"col.day".as("day"), $"col.cents".as("cents"),
        round($"col.l" / 100, 4).as("level"),
        round($"col.b" / 100, 4).as("trend"),
        round($"col.sv" / 100, 4).as("seasonal"),
        round($"col.fc" / 100, 4).as("fitted"))
      .orderBy($"day")
  }

  private val tsHoltWintersSql = {
    val y = "CAST(t.cents AS DOUBLE)"
    val sv = "r.sea[CAST((t.i - 1) % 7 AS INTEGER) + 1]"
    val lp = s"(0.5 * ($y - $sv) + 0.5 * (r.l + r.b))"
    val bp = s"(0.5 * ($lp - r.l) + 0.5 * r.b)"
    val sp = s"(0.5 * ($y - $lp) + 0.5 * $sv)"
    val fc = s"(r.l + r.b + $sv)"
    s"""WITH RECURSIVE daily AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT day, cents, row_number() OVER (ORDER BY day) AS i FROM daily),
      |sd AS (
      |  SELECT CAST(sum(cents) AS DOUBLE) / 7.0 AS l0,
      |    list(CAST(cents AS DOUBLE) ORDER BY i) AS ys
      |  FROM idx WHERE i <= 7),
      |rec(i, day, cents, l, b, sea, sv, fc) AS (
      |  SELECT CAST(7 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
      |    l0, CAST(0.0 AS DOUBLE), list_transform(ys, v -> v - l0),
      |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      |  FROM sd
      |  UNION ALL
      |  SELECT t.i, t.day, t.cents, $lp, $bp,
      |    list_transform(range(0, 7), j -> CASE WHEN j = (t.i - 1) % 7
      |      THEN $sp ELSE r.sea[CAST(j AS INTEGER) + 1] END),
      |    $sp, $fc
      |  FROM rec r JOIN idx t ON t.i = r.i + 1)
      |SELECT day, cents, round(l / 100, 4) AS level, round(b / 100, 4) AS trend,
      |  round(sv / 100, 4) AS seasonal, round(fc / 100, 4) AS fitted
      |FROM rec WHERE day IS NOT NULL ORDER BY day""".stripMargin
  }

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_type_infer", etlTypeInfer _, etlTypeInferSql),
    QueryDef.sql("text_keywords", textKeywords _, textKeywordsSql),
    QueryDef.sql("q_event_regex", qEventRegex _, qEventRegexSql),
    QueryDef.sql("ts_holt", tsHolt _, tsHoltSql),
    QueryDef.sql("ts_holt_winters", tsHoltWinters _, tsHoltWintersSql))
}
