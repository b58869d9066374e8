package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 optimizer/index-infrastructure wave: bitmap-index distinct
  * counting (the dense-keyspace alternative to a distinct shuffle),
  * join-cardinality estimation from per-key statistics (what a
  * cost-based optimizer consults before picking a join strategy),
  * and Mahalanobis outlier scoring from exact embedding moments.
  */
object OptimQ {

  // ------------------------------------------------------- q_bitmap_distinct

  /** Exact distinct-customer counts per order priority via a bitmap
    * index: custkey packs into (word = key div 63, bit = key mod 63 —
    * 63 bits per word keeps every shift off the sign bit, which
    * DuckDB's checked `<<` rejects), `bit_or` folds each word
    * MAP-SIDE (the whole reduction is bitwise — no row survives to
    * the shuffle beyond groups × keyspace/63 words), popcounts sum to
    * the exact distinct. The gate emits the bitmap count NEXT TO the classic
    * count(distinct) so the equivalence is part of the contract.
    * At 100 TB with a dense integer keyspace this replaces the
    * distinct's full-data shuffle with a bounded bitmap — the
    * roaring-bitmap pattern on plain longs.
    */
  def qBitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
    val words = o
      .select($"o_orderpriority".as("prio"),
        expr("o_custkey div 63").as("word"),
        expr("shiftleft(1L, cast(o_custkey % 63 as int))").as("bit"))
      .groupBy($"prio", $"word")
      .agg(bit_or($"bit").as("bits"))
      .groupBy($"prio")
      .agg(sum(bit_count($"bits")).cast("long").as("n_distinct_bitmap"),
        count(lit(1)).as("n_words"))
    val exact = o.groupBy($"o_orderpriority".as("prio"))
      .agg(countDistinct($"o_custkey").as("n_distinct_exact"))
    words.join(exact, "prio")
      .select($"prio", $"n_distinct_bitmap", $"n_distinct_exact", $"n_words")
      .orderBy($"prio")
  }

  private val qBitmapDistinctSql =
    """WITH w AS (
      |  SELECT o_orderpriority AS prio, o_custkey // 63 AS word,
      |    bit_or(CAST(1 AS BIGINT) << CAST(o_custkey % 63 AS INTEGER)) AS bits
      |  FROM orders GROUP BY 1, 2),
      |b AS (
      |  SELECT prio, CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct_bitmap,
      |    count(*) AS n_words
      |  FROM w GROUP BY prio),
      |e AS (
      |  SELECT o_orderpriority AS prio, count(DISTINCT o_custkey) AS n_distinct_exact
      |  FROM orders GROUP BY 1)
      |SELECT prio, n_distinct_bitmap, n_distinct_exact, n_words
      |FROM b JOIN e USING (prio) ORDER BY prio""".stripMargin

  // ------------------------------------------------------- q_join_size_est

  /** Join-cardinality estimation for the skew-prone events self-join
    * on user_id — the statistic a cost-based optimizer needs BEFORE
    * choosing broadcast vs shuffle vs skew-split. Ground truth
    * |E ⋈ E| = Σ_u n_u² folds exactly from the per-key count table;
    * the estimator sees only the top-10 heavy hitters (exact) plus a
    * uniformity assumption over the remaining keys — the classic
    * histogram-with-outliers synopsis. Everything is integer
    * arithmetic; the error ratio is the one final double. Per-key
    * counts reduce map-side; the top-10 rides a TakeOrdered heap,
    * never a global sort.
    */
  def qJoinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wAll = Window.partitionBy()
    val perKey = Tables(spark, dir).events
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val ranked = perKey
      .withColumn("rk", row_number().over(Window.orderBy($"n".desc, $"user_id")))
      .withColumn("true_size", sum($"n" * $"n").over(wAll))
      .withColumn("n_keys", count(lit(1)).over(wAll))
      .withColumn("n_rows", sum($"n").over(wAll))
      .withColumn("top_sq", sum(when($"rk" <= 10, $"n" * $"n").otherwise(0L)).over(wAll))
      .withColumn("top_rows", sum(when($"rk" <= 10, $"n").otherwise(0L)).over(wAll))
    ranked.filter($"rk" === 1)
      .select($"n_keys", $"n_rows", $"true_size",
        // uniform tail: (rest_rows)² / rest_keys, added to the exact head
        ($"top_sq" + expr(
          "(n_rows - top_rows) * (n_rows - top_rows) div greatest(n_keys - 10, 1)")).as("est_size"))
      .withColumn("err_ratio",
        round($"est_size".cast("double") / $"true_size", 4))
  }

  private val qJoinSizeEstSql =
    """WITH pk AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
      |r1 AS (
      |  SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rk FROM pk),
      |rk AS (
      |  SELECT rk,
      |    CAST(sum(n * n) OVER () AS BIGINT) AS true_size,
      |    count(*) OVER () AS n_keys,
      |    CAST(sum(n) OVER () AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN rk <= 10 THEN n * n ELSE 0 END) OVER () AS BIGINT) AS top_sq,
      |    CAST(sum(CASE WHEN rk <= 10 THEN n ELSE 0 END) OVER () AS BIGINT) AS top_rows
      |  FROM r1)
      |SELECT n_keys, n_rows, true_size,
      |  top_sq + (n_rows - top_rows) * (n_rows - top_rows) // greatest(n_keys - 10, 1) AS est_size,
      |  round(CAST(top_sq + (n_rows - top_rows) * (n_rows - top_rows) // greatest(n_keys - 10, 1) AS DOUBLE)
      |    / true_size, 4) AS err_ratio
      |FROM rk WHERE rk = 1""".stripMargin

  // ------------------------------------------------------- emb_mahalanobis

  /** Diagonal-Mahalanobis outlier scoring over the first 8 embedding
    * dims: per-dim moments (n, Σq, Σq²) fold exactly from the
    * repo-wide floor(x·2^20) quantization — one map-side aggregate to
    * 8×3 longs — then each vector's score Σ_i (q_i·n − Σq_i)² /
    * (n·Σq²_i − (Σq_i)²) is the identical double expression on both
    * engines. Top-20 outliers via TakeOrdered heaps. The sufficient-
    * statistics shape: at 100 TB the stats pass is one scan, the
    * scoring pass a broadcast join of 8 metadata rows.
    */
  def embMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables(spark, dir).embeddings
      .select($"vec_id", posexplode(slice($"embedding", 1, 8)))
      .select($"vec_id", $"pos".cast("long").as("i"),
        floor($"col".cast("double") * 1048576.0).cast("long").as("q"))
    val stats = cells.groupBy($"i")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"), sum($"q" * $"q").as("ss"))
    val scored = cells.join(broadcast(stats), "i")
      // per-cell double term quantized to exact 1e-6 units BEFORE the
      // cross-row sum (the repo-wide no-double-reduction discipline)
      .withColumn("term_e6",
        floor(($"q" * $"n" - $"s").cast("double") * ($"q" * $"n" - $"s").cast("double") /
          ($"n".cast("double") * $"ss".cast("double") - $"s".cast("double") * $"s".cast("double")) *
          1e6).cast("long"))
      .groupBy($"vec_id")
      .agg(round(sum($"term_e6") / 1e6, 6).as("maha_score"))
    scored
      .withColumn("rk",
        row_number().over(Window.orderBy($"maha_score".desc, $"vec_id")).cast("long"))
      .filter($"rk" <= 20)
      .select($"rk", $"vec_id", $"maha_score")
  }

  private val embMahalanobisSql =
    """WITH cells AS (
      |  SELECT vec_id, i,
      |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
      |  FROM embeddings, range(0, 8) t(i)),
      |stats AS (
      |  SELECT i, count(*) AS n, CAST(sum(q) AS BIGINT) AS s,
      |    CAST(sum(q * q) AS BIGINT) AS ss
      |  FROM cells GROUP BY i),
      |scored AS (
      |  SELECT vec_id,
      |    round(CAST(sum(CAST(floor(CAST(q * n - s AS DOUBLE) * CAST(q * n - s AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      |      * 1e6) AS BIGINT)) AS BIGINT) / 1e6, 6) AS maha_score
      |  FROM cells JOIN stats USING (i) GROUP BY vec_id),
      |rk AS (
      |  SELECT row_number() OVER (ORDER BY maha_score DESC, vec_id) AS rk, *
      |  FROM scored)
      |SELECT rk, vec_id, maha_score FROM rk WHERE rk <= 20""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_bitmap_distinct", qBitmapDistinct _, qBitmapDistinctSql),
    QueryDef.sql("q_join_size_est", qJoinSizeEst _, qJoinSizeEstSql),
    QueryDef.sql("emb_mahalanobis", embMahalanobis _, embMahalanobisSql))
}
