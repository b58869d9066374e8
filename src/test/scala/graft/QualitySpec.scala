package graft

import org.apache.spark.sql.functions._

/** Round-6 quality/time-series/frontier operators: distributed
  * skyline, gap-filled LOCF resampling, IQR outliers, column
  * profiling (queries/QualityQ.scala, operators/Skyline.scala).
  */
class QualitySpec extends GraftSuite {
  import spark.implicits._

  // ---- Skyline ----

  private def bruteSkyline(pts: Seq[(Double, Int)]): Set[(Double, Int)] = {
    val d = pts.distinct
    d.filter { case (px, py) =>
      !d.exists { case (sx, sy) =>
        sx <= px && sy >= py && (sx < px || sy > py)
      }
    }.toSet
  }

  test("skyline matches brute-force dominance on a fixture with ties and duplicates") {
    val pts = Seq(
      (1.0, 3), (1.0, 5), (2.0, 5), (2.0, 7), (3.0, 7), // same-x and same-y ties
      (4.0, 9), (4.0, 9),                               // duplicate point
      (5.0, 1), (0.5, 2), (6.0, 10), (6.0, 4))
    val df = pts.toDF("price", "sz")
    val got = graft.operators.Skyline.pareto(df, "price", "sz")
      .select($"price", $"sz", $"n_rows").collect()
    val gotSet = got.map(r => (r.getDouble(0), r.getInt(1))).toSet
    assert(gotSet === bruteSkyline(pts))
    // multiplicity survives: the duplicated (4.0, 9) reports n_rows = 2
    val dup = got.find(r => r.getDouble(0) == 4.0).get
    assert(dup.getLong(2) === 2L)
  }

  test("skyline is idempotent and salt-count-invariant") {
    val df = Tables(spark, sf0001).part
      .select($"p_retailprice".as("price"), $"p_size".as("sz"))
    val s8 = graft.operators.Skyline.pareto(df, "price", "sz", salts = 8)
    val s64 = graft.operators.Skyline.pareto(df, "price", "sz", salts = 64)
    assert(s8.collect().toSet === s64.collect().toSet)
    // skyline(skyline(S)) = skyline(S)
    val once = s64.select($"price", $"sz")
    val twice = graft.operators.Skyline.pareto(once, "price", "sz")
      .select($"price", $"sz")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("skyline of an empty input is empty") {
    val empty = Seq.empty[(Double, Int)].toDF("price", "sz")
    assert(graft.operators.Skyline.pareto(empty, "price", "sz").count() === 0L)
  }

  // ---- Gap fill ----

  test("gap fill carries last observation forward and flags gaps") {
    // user 1: observations at hours 10, 13; grid must be 10..13 with
    // 11, 12 filled from hour 10's value
    val rows = Seq(
      (1L, 10L * 3600L + 5L, "purchase", 2.0),
      (1L, 13L * 3600L + 9L, "purchase", 7.0),
      (2L, 4L * 3600L, "purchase", 1.0)) // single-hour user: no gaps
    val events = rows.toDF("user_id", "secs", "event_type", "value")
      .select($"user_id", expr("timestamp_seconds(secs)").as("ts"),
        $"event_type", $"value",
        lit(0L).as("event_id"), lit("{}").as("props"))
    events.write.mode("overwrite").parquet("/tmp/gapfill_fixture/events.parquet")
    // reuse the real gate body against the fixture dir by replaying
    // its plan shape here (the gate itself is pinned by the oracle)
    val b = events.filter($"user_id" < 10 && $"event_type" === "purchase")
      .groupBy($"user_id", expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(round(sum($"value"), 4).as("v_obs"))
    val grid = b.groupBy($"user_id").agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Long.MinValue, 0)
    val filled = grid.join(b, Seq("user_id", "h"), "left")
      .select($"user_id", $"h",
        last($"v_obs", ignoreNulls = true).over(w).as("v"),
        $"v_obs".isNull.as("is_gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(filled((1L, 10L)) === ((2.0, false)))
    assert(filled((1L, 11L)) === ((2.0, true)))
    assert(filled((1L, 12L)) === ((2.0, true)))
    assert(filled((1L, 13L)) === ((7.0, false)))
    assert(filled((2L, 4L)) === ((1.0, false)))
    assert(filled.size === 5) // grids span each user's own range only
  }

  test("gap fill gate: first bucket per user is always observed (no leading nulls)") {
    val out = graft.queries.QualityQ.qGapFill(spark, sf001)
    val firsts = out.groupBy($"user_id").agg(min($"hour_bucket").as("h0"))
    val joined = out.join(firsts,
      out("user_id") === firsts("user_id") && out("hour_bucket") === firsts("h0"))
    assert(joined.filter($"is_gap" || $"v_filled".isNull).count() === 0L)
    // and every filled value is non-null everywhere (LOCF from an
    // observed first bucket can never be null)
    assert(out.filter($"v_filled".isNull).count() === 0L)
  }

  // ---- IQR outliers ----

  test("IQR outliers: fixture with a known fence") {
    // 0..99 plus two extremes: q1=24.75, q3=74.25, iqr=49.5 →
    // fences [-49.5, 148.5]; only ±1000 flagged
    val vals = (0 until 100).map(_.toDouble) ++ Seq(-1000.0, 1000.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
    val fences = df.groupBy($"event_type").agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .select($"event_type",
        ($"q1" - ($"q3" - $"q1") * 1.5).as("lo"),
        ($"q3" + ($"q3" - $"q1") * 1.5).as("hi"))
    val flagged = df.join(fences, "event_type")
      .filter($"value" < $"lo" || $"value" > $"hi")
      .select($"value").collect().map(_.getDouble(0)).toSet
    assert(flagged === Set(-1000.0, 1000.0))
  }

  test("IQR outlier gate flags a stable nonzero fraction per type") {
    val out = graft.queries.QualityQ.qOutlierIqr(spark, sf001)
    val n = out.count()
    assert(n > 0L)
    // outliers are a small minority, not the bulk of the stream
    val total = Tables(spark, sf001).events.count()
    assert(n.toDouble / total < 0.05)
  }

  // ---- EWMA ----

  test("ewma recurrence: fold matches the hand-computed sequence") {
    // s0=8, s1=.75*8+.25*4=7, s2=.75*7+.25*12=8.25
    val df = Seq((1L, 0L, 8.0), (1L, 1L, 4.0), (1L, 2L, 12.0), (2L, 3L, 5.0))
      .toDF("user_id", "event_id", "value")
      .withColumn("event_type", lit("purchase"))
      .withColumn("ts", expr("timestamp_seconds(event_id)"))
      .withColumn("props", lit("{}"))
    val got = df.groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"event_id", $"value"))).as("seq"))
      .withColumn("vals", expr("transform(seq, x -> x.value)"))
      .select($"user_id", expr(
        "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1)," +
          " (acc, x) -> acc * 0.75 + 0.25 * x)").as("ewma"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 8.25)
    assert(got(2L) === 5.0) // single observation: s0 = x0, no decay applied
  }

  // ---- Table digest ----

  test("table digest is order/partitioning-invariant and detects one changed row") {
    import graft.etl.TableDigest
    val base = Tables(spark, sf0001).customer
    def dig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = TableDigest.digest(df, "t", Seq(
        $"c_custkey", $"c_name", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long"), $"c_mktsegment")).collect().head
      (r.getLong(1), r.getLong(2))
    }
    val d1 = dig(base)
    assert(d1 === dig(base.repartition(17)))            // layout-blind
    assert(d1 === dig(base.orderBy($"c_name".desc)))    // order-blind
    val mutated = base.withColumn("c_acctbal",
      when($"c_custkey" === 7, $"c_acctbal" + 0.01).otherwise($"c_acctbal"))
    val d2 = dig(mutated)
    assert(d1._1 === d2._1 && d1._2 != d2._2) // same count, different digest
  }

  // ---- Weighted sampling ----

  test("weighted sampling keeps ~prob fraction and prob=1/0 are exact") {
    import graft.operators.Sample
    val df = (0L until 4000L).toDF("id")
    assert(Sample.weighted(df, "id", lit(1.0)).count() === 4000L)
    assert(Sample.weighted(df, "id", lit(0.0)).count() === 0L)
    val half = Sample.weighted(df, "id", lit(0.5)).count()
    assert(half > 1800 && half < 2200, s"got $half")
    // determinism: the same rows survive a different partitioning
    val a = Sample.weighted(df, "id", lit(0.3)).collect().map(_.getLong(0)).toSet
    val b = Sample.weighted(df.repartition(7), "id", lit(0.3))
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  // ---- Rolling DAU / MAD / divergence ----

  test("rolling WAU window: a user active on day d counts toward days d..d+6") {
    // one user active day 0; another active days 0 and 10
    val rows = Seq((1L, 0L), (2L, 0L), (2L, 10L))
    val ud = rows.toDF("user_id", "day")
    val wau = ud.select($"user_id", explode(sequence($"day", $"day" + 6)).as("day"))
      .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 6L).foreach(d => assert(wau(d) === 2L, s"day $d"))
    (10L to 16L).foreach(d => assert(wau(d) === 1L, s"day $d"))
    assert(!wau.contains(7L) && !wau.contains(9L))
  }

  test("rolling dau gate: wau_7d >= dau and both positive on every reported day") {
    val out = graft.queries.QualityQ.qRollingDau(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(1) > 0,
        s"day ${r.getLong(0)}: dau=${r.getLong(1)} wau=${r.getLong(2)}")
    }
  }

  test("MAD: hand-computed fixture, robust to an extreme outlier") {
    // values 1..9 plus 1e9: median 5.5, |x-med| medians to 2.75
    val df = ((1 to 9).map(_.toDouble) :+ 1e9).zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
    val med = df.groupBy($"event_type").agg(expr("percentile(value, 0.5)").as("med"))
    val got = df.join(med, "event_type").groupBy($"event_type")
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      .collect().head.getDouble(1)
    // deviations sorted: 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,1e9 → median 2.5
    assert(got === 2.5)
    // stddev by contrast explodes past 1e8 on the same data
    val sd = df.agg(stddev($"value")).collect().head.getDouble(0)
    assert(sd > 1e8)
  }

  test("source divergence: tv_dist is a bounded distance, zero for identical slices") {
    // two sources with identical token streams → TV 0; a third skewed one → >0
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"),
      (3L, "a a a a", "s3"))
      .toDF("doc_id", "text", "source")
    val toks = docs.select($"source", explode(split(lower(trim($"text")), "\\s+")).as("tok"))
    val f = toks.groupBy($"source", $"tok").agg(count(lit(1)).as("sc"))
    val st = f.groupBy($"source").agg(sum($"sc").as("st"))
    val g = f.groupBy($"tok").agg(sum($"sc").as("gc"))
    val gt = g.agg(sum($"gc").as("gt"))
    val tv = st.crossJoin(g.select($"tok")).join(f, Seq("source", "tok"), "left")
      .join(g, "tok").crossJoin(gt)
      .select($"source",
        floor(abs(coalesce($"sc", lit(0L)).cast("double") / $"st".cast("double")
          - $"gc".cast("double") / $"gt".cast("double")) * lit(1048576.0))
          .cast("long").as("q"))
      .groupBy($"source").agg((sum($"q").cast("double") / lit(2097152.0)).as("tv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // s1 and s2 are identical slices: same distance from global
    assert(tv("s1") === tv("s2"))
    // the skewed source is strictly farther, and all are in [0, 1]
    assert(tv("s3") > tv("s1"))
    tv.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // gate-level sanity at sf0.001: bounded, sources present
    val gate = graft.queries.TrainingQ.corpusSourceDivergence(spark, sf0001).collect()
    assert(gate.nonEmpty)
    gate.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  // ---- Column profile ----

  test("profile reports exact null/distinct/min/max per column") {
    val out = graft.queries.QualityQ.etlProfile(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = Tables(spark, sf0001).customer
    val nRows = c.count()
    assert(out.keySet === Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    out.values.foreach(r => assert(r.getLong(1) === nRows))
    val custkey = out("c_custkey")
    assert(custkey.getLong(2) === 0L) // no nulls in the key
    assert(custkey.getLong(3) === nRows) // key is unique
    assert(custkey.getDouble(4) === 0.0) // min key (ids start at 0 in this lake)
    val seg = out("c_mktsegment")
    assert(seg.getLong(3) === c.select($"c_mktsegment").distinct().count())
    assert(seg.isNullAt(4) && seg.isNullAt(5)) // numeric stats null for strings
    assert(!seg.isNullAt(6) && !seg.isNullAt(7))
  }
}
