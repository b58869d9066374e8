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
  val bounded: Map[String, String] = Map.empty
}
