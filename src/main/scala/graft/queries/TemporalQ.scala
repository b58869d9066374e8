package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 temporal/relational-algebra wave: relational division
  * (the "for all" join), the as-of temporal dimension join against
  * SCD-2 validity intervals, and incremental distinct-count
  * maintenance over bitmap state (the IVM twin of
  * `q_bitmap_distinct`).
  */
object TemporalQ {

  // ---------------------------------------------------------- q_rel_division

  /** Relational division — "users who did EVERY event type": the
    * classic ∀-join, expressed as the count-match idiom (distinct
    * types per user = total distinct types) — two map-side-combinable
    * aggregates and a broadcast of ONE scalar row, no N×M join
    * anywhere. The qualifying-user row set is the contract.
    */
  def qRelDivision(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val allTypes = ev.agg(countDistinct($"event_type").as("n_types"))
    ev.groupBy($"user_id")
      .agg(countDistinct($"event_type").as("user_types"))
      .crossJoin(broadcast(allTypes))
      .filter($"user_types" === $"n_types")
      .select($"user_id", $"user_types")
      .orderBy($"user_id")
  }

  private val qRelDivisionSql =
    """WITH t AS (SELECT count(DISTINCT event_type) AS n_types FROM events),
      |u AS (
      |  SELECT user_id, count(DISTINCT event_type) AS user_types
      |  FROM events GROUP BY user_id)
      |SELECT user_id, user_types
      |FROM u CROSS JOIN t WHERE user_types = n_types
      |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------- q_temporal_join

  /** Temporal dimension join: each order reads the customer attribute
    * version that was CURRENT for it — the consumption side of
    * `etl_scd2`'s validity intervals (same synthetic change stream:
    * v2 bumps a third of customers, v3 a ninth). The as-of version
    * derives deterministically from the order key; the join keys on
    * c_custkey with the interval check as a residual predicate, so it
    * executes as a plain hash join however large the fact side — the
    * interval never becomes a cross product. Folded to per-version
    * totals in exact cents.
    */
  def qTemporalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val base = t.customer.select($"c_custkey", $"c_acctbal")
      .withColumn("version", lit(1L))
    val v2 = base.filter($"c_custkey" % 3 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 50.0).withColumn("version", lit(2L))
    val v3 = base.filter($"c_custkey" % 9 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 75.0).withColumn("version", lit(3L))
    val hist = graft.etl.Scd2.history(
      base.unionByName(v2).unionByName(v3), Seq("c_custkey"), "version")
    val facts = t.orders
      .select($"o_orderkey", $"o_custkey", ($"o_orderkey" % 3 + 1).as("as_of"))
    facts.join(hist,
        facts("o_custkey") === hist("c_custkey") &&
          hist("valid_from") <= facts("as_of") &&
          (hist("valid_to").isNull || facts("as_of") < hist("valid_to")))
      .groupBy($"as_of")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"c_acctbal" * 100).cast("long")).as("acctbal_cents"))
      .orderBy($"as_of")
  }

  private val qTemporalJoinSql =
    """WITH changes AS (
      |  SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 50.0, CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 75.0, CAST(3 AS BIGINT) FROM customer WHERE c_custkey % 9 = 0),
      |hist AS (
      |  SELECT c_custkey, c_acctbal, version AS valid_from,
      |    lead(version) OVER (PARTITION BY c_custkey ORDER BY version) AS valid_to
      |  FROM changes),
      |facts AS (
      |  SELECT o_orderkey, o_custkey, o_orderkey % 3 + 1 AS as_of FROM orders)
      |SELECT as_of, count(*) AS n_orders,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
      |FROM facts JOIN hist ON o_custkey = c_custkey
      |  AND valid_from <= as_of AND (valid_to IS NULL OR as_of < valid_to)
      |GROUP BY as_of ORDER BY as_of""".stripMargin

  // --------------------------------------------------------- q_ivm_distinct

  /** Incremental distinct-count maintenance: the bitmap-word state of
    * `q_bitmap_distinct` is MERGEABLE (bit_or is idempotent,
    * commutative, associative), so a distinct count maintains itself
    * against a delta batch without revisiting history — state ⊎ delta
    * ≡ full recompute, proven in-plan per group. The state is
    * groups × keyspace/63 words however many rows arrive: the
    * streaming-accumulator shape `q_ivm_agg` pioneered, extended to
    * the one aggregate (COUNT DISTINCT) naive IVM cannot fold.
    */
  def qIvmDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
      .select($"o_orderpriority".as("prio"), $"o_custkey",
        expr("o_custkey div 63").as("word"),
        expr("shiftleft(1L, cast(o_custkey % 63 as int))").as("bit"))
    // "history" = odd order keys, "delta" = even — any split works:
    // merging states is a bit_or, the same op that built them
    val state = o.filter($"o_custkey" % 2 === 1)
      .groupBy($"prio", $"word").agg(bit_or($"bit").as("bits"))
    val delta = o.filter($"o_custkey" % 2 === 0)
      .groupBy($"prio", $"word").agg(bit_or($"bit").as("bits"))
    val merged = state.unionByName(delta)
      .groupBy($"prio", $"word").agg(bit_or($"bits").as("bits"))
      .groupBy($"prio").agg(sum(bit_count($"bits")).cast("long").as("n_distinct_ivm"))
    val full = o.groupBy($"prio").agg(countDistinct($"o_custkey").as("n_distinct_full"))
    merged.join(full, "prio")
      .select($"prio", $"n_distinct_ivm", $"n_distinct_full",
        ($"n_distinct_ivm" === $"n_distinct_full").as("consistent"))
      .orderBy($"prio")
  }

  private val qIvmDistinctSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio, o_custkey, o_custkey // 63 AS word,
      |    CAST(1 AS BIGINT) << CAST(o_custkey % 63 AS INTEGER) AS bit
      |  FROM orders),
      |state AS (
      |  SELECT prio, word, bit_or(bit) AS bits FROM o WHERE o_custkey % 2 = 1 GROUP BY 1, 2),
      |delta AS (
      |  SELECT prio, word, bit_or(bit) AS bits FROM o WHERE o_custkey % 2 = 0 GROUP BY 1, 2),
      |merged AS (
      |  SELECT prio, word, bit_or(bits) AS bits FROM (
      |    SELECT * FROM state UNION ALL SELECT * FROM delta) GROUP BY 1, 2),
      |ivm AS (
      |  SELECT prio, CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct_ivm
      |  FROM merged GROUP BY prio),
      |fullc AS (
      |  SELECT prio, count(DISTINCT o_custkey) AS n_distinct_full FROM o GROUP BY prio)
      |SELECT prio, n_distinct_ivm, n_distinct_full,
      |  n_distinct_ivm = n_distinct_full AS consistent
      |FROM ivm JOIN fullc USING (prio) ORDER BY prio""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_rel_division", qRelDivision _, qRelDivisionSql),
    QueryDef.sql("q_temporal_join", qTemporalJoin _, qTemporalJoinSql),
    QueryDef.sql("q_ivm_distinct", qIvmDistinct _, qIvmDistinctSql))
}
