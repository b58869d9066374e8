package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Plan lint over EVERY gate: an unpartitioned window
  * (`WindowExec` with empty `partitionSpec`) funnels its whole input
  * through ONE task's sort — fine above an aggregate whose grouping
  * key is a bounded domain (calendar days, schema-fixed categories),
  * fatal on a data-sized input at 100 TB. This spec walks every gate's
  * physical plan and enforces: an empty-partition window may exist
  * ONLY in a gate on the declared whitelist below, and even there it
  * must sit above an aggregate or limit (the structural witness that
  * the windowed input is the bounded aggregate, not the raw table).
  * A new gate that ships an unbounded single-partition sort fails here
  * by name with its plan, before any reviewer has to spot it.
  *
  * Scope: the lint walks the main plan tree (not subquery expression
  * plans) with AQE off, so the pre-runtime shape is what is judged —
  * the shape that decides scalability.
  */
class WindowLintSpec extends GraftSuite {

  /** Gates allowed an empty-partition window, with the bounded domain
    * that makes the single-task sort O(domain), not O(data).
    */
  private val bounded: Map[String, String] = WindowLintSpec.bounded

  test("no gate plans an unpartitioned window over an unbounded input") {
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val plan =
          try fn(spark, sf0001).queryExecution.executedPlan
          catch { case e: Throwable =>
            fail(s"gate $name failed to plan at sf0.001: ${e.getMessage}")
          }
        def aggOrLimitBelow(p: SparkPlan): Boolean = {
          var found = false
          p.foreach {
            case _: HashAggregateExec | _: ObjectHashAggregateExec |
                 _: SortAggregateExec => found = true
            case other if other.nodeName.contains("TakeOrdered") ||
              other.nodeName.contains("Limit") => found = true
            // a reused exchange is a LEAF that hides its planned-once
            // subtree — follow it, or a window fed by the reuse of an
            // aggregate's shuffle would read as aggregate-free
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec
              if aggOrLimitBelow(r.child) => found = true
            case _ => ()
          }
          found
        }
        val bare = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
        plan.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty => bare += w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => bare += w
          case _ => ()
        }
        bare.foreach { w =>
          val child = w.children.head
          if (!bounded.contains(name))
            offenders += s"$name: empty-partition ${w.nodeName} not on the bounded-domain whitelist"
          else if (!aggOrLimitBelow(child))
            offenders += s"$name: whitelisted empty-partition ${w.nodeName} has no aggregate/limit beneath it (claimed domain: ${bounded(name)})"
        }
        spark.catalog.clearCache()
      }
      assert(offenders.isEmpty,
        s"\nunpartitioned-window lint failures:\n  ${offenders.mkString("\n  ")}\n")
    }
  }
}

object WindowLintSpec {
  /** Audited round 9: each entry names the bounded input the
    * single-task window actually sorts — the structural agg/limit
    * check below the window is enforced by the spec; this map is the
    * human claim of WHAT bounds that aggregate's cardinality.
    */
  val bounded: Map[String, String] = Map(
    // schema-fixed category tables
    "corpus_budget_mix" -> "per-source mix table (schema-fixed sources)",
    "corpus_token_budget" -> "per-source token totals (schema-fixed sources)",
    "etl_binpack" -> "(source, lang) cell table (schema-fixed categories)",
    "etl_rendezvous_shard" -> "5-shard assignment summary",
    "q_anova_f" -> "per-group sufficient statistics (schema-fixed groups)",
    "q_diff_in_diff" -> "period x cohort cells (4 cells)",
    // calendar-bounded daily aggregated series (~2.4k rows)
    "etl_watermark_audit" -> "PrefixSum chunk totals over calendar days",
    "q_durbin_watson" -> "daily residual series (calendar days)",
    "q_msprt" -> "daily sequential-test series (calendar days)",
    "q_open_orders_timeline" -> "daily order-boundary series (calendar days)",
    "q_peak_concurrency" -> "PrefixSum chunk totals over hour buckets",
    "q_running_distinct" -> "daily first-seen counts (calendar days)",
    "q_runs_test" -> "daily sign sequence (calendar days)",
    "ts_backtest" -> "daily aggregated series (calendar days)",
    "ts_bollinger" -> "daily aggregated series (calendar days)",
    "ts_changepoint" -> "daily aggregated series (calendar days)",
    "ts_cusum" -> "PrefixSum chunk totals over calendar days",
    "ts_granger" -> "daily (y, x) aggregated series (calendar days)",
    "ts_hampel" -> "daily aggregated series (calendar days)",
    "ts_periodogram" -> "daily aggregated series (calendar days)",
    "ts_rolling_corr" -> "daily aggregated series (calendar days)",
    "ts_seasonal_decompose" -> "daily aggregated series (calendar days)",
    // concrete bound: the gate calendar spans ~2.4k distinct days, so the
    // single-task slope window sorts ~n_days^2/2 ≈ 3M day-pair rows —
    // bounded by the CALENDAR (data-free), but 1-2 orders larger than any
    // other whitelisted domain; repartition the slope table if the daily
    // span ever grows past ~10k days (~50M pairs)
    "ts_theil_sen" -> "day-pair slopes over the daily series (calendar^2 ~ 2.4k days -> ~3M pair rows, still data-free)",
    // value-domain bounded (distinct values of a bounded attribute,
    // chunked through PrefixSum's bucket-offset two-pass)
    "q_abc_analysis" -> "PrefixSum chunk totals over distinct revenue values",
    "q_gini" -> "PrefixSum chunk totals over spend buckets",
    "q_ks_test" -> "PrefixSum chunk totals over the value domain",
    "q_lorenz_curve" -> "PrefixSum chunk totals over spend buckets",
    "q_mann_whitney" -> "PrefixSum chunk totals over the value domain",
    "q_pr_curve" -> "PrefixSum chunk totals over the score domain (div 512)",
    "q_roc_auc" -> "PrefixSum chunk totals over the score domain (div 512)",
    "q_tree_stump" -> "candidate split thresholds (quantity domain <= 50)",
    "q_gbdt_stumps" -> "month-domain boosting state (12 rows per round)",
    "q_cox_ph" -> "risk-set cumulative counts over distinct duration days (calendar-bounded)",
    "q_bootstrap_ci" -> "bootstrap replicate table (fixed B)",
    // explicitly limited or distributively pruned inputs
    "text_zipf_fit" -> "top-1000 vocabulary heap (limit 1000)",
    "q_skyline" -> "salt-local Pareto frontiers (skyline distributivity)",
    "q_join_size_est" -> "per-key CBO synopsis (key-cardinality table; the estimator's own input)")
}
