package graft

import graft.etl.{TableDigest, Validation, Wap}
import org.apache.spark.sql.functions._

/** Write–Audit–Publish discipline (etl/Wap.scala). */
class WapSpec extends GraftSuite {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wap").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val rules = Seq(
    Validation.Rule("null_name", col("name").isNull),
    Validation.Rule("neg_value", col("value") < 0))

  test("clean table publishes atomically with a verifiable digest") {
    val root = tmpRoot()
    val df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "value")
    val r = Wap.publish(spark, df, root, "t1", rules,
      d => Seq(d("id"), d("name"), d("value")))
    assert(r.published && r.nRows === 2L && r.nViolations === 0L)
    val back = spark.read.parquet(r.servingPath)
    assert(back.count() === 2L)
    // staged dir was MOVED, not copied
    assert(!new java.io.File(r.stagedPath).exists())
    // returned digest equals an independent recompute of the serving data
    val d2 = TableDigest.digest(back, "t1", Seq(back("id"), back("name"), back("value")))
      .collect().head.getLong(2)
    assert(r.digest === d2)
  }

  test("failed audit leaves serving untouched and the staged bytes inspectable") {
    val root = tmpRoot()
    val good = Seq((1L, "a", 10L)).toDF("id", "name", "value")
    assert(Wap.publish(spark, good, root, "t2", rules, d => Seq(d("id"))).published)
    val before = spark.read.parquet(s"$root/t2").collect().map(_.toSeq.toList).toList
    // second batch violates neg_value — publish must refuse
    val bad = Seq((2L, "b", -5L)).toDF("id", "name", "value")
    val r = Wap.publish(spark, bad, root, "t2", rules, d => Seq(d("id")))
    assert(!r.published && r.nViolations === 1L)
    // serving path still has the ORIGINAL data
    assert(spark.read.parquet(s"$root/t2").collect().map(_.toSeq.toList).toList === before)
    // staged bytes remain for inspection
    assert(spark.read.parquet(r.stagedPath).count() === 1L)
  }

  test("republish swaps via rename-aside: new data serves, no debris remains") {
    val root = tmpRoot()
    val first = Seq((1L, "a", 10L)).toDF("id", "name", "value")
    assert(Wap.publish(spark, first, root, "t4", rules, d => Seq(d("id"))).published)
    val second = Seq((2L, "b", 20L), (3L, "c", 30L)).toDF("id", "name", "value")
    val r = Wap.publish(spark, second, root, "t4", rules, d => Seq(d("id")))
    assert(r.published && r.nRows === 2L)
    assert(spark.read.parquet(s"$root/t4").select($"id").as[Long].collect().toSet === Set(2L, 3L))
    // the parked previous table was dropped after the swap completed
    assert(!new java.io.File(s"$root/_prev_t4").exists())
    // a stale parked copy from an interrupted earlier swap is recoverable
    // input, not an obstacle: plant one and republish over it
    new java.io.File(s"$root/_prev_t4").mkdirs()
    val r2 = Wap.publish(spark, first, root, "t4", rules, d => Seq(d("id")))
    assert(r2.published)
    assert(spark.read.parquet(s"$root/t4").select($"id").as[Long].collect().toSet === Set(1L))
    assert(!new java.io.File(s"$root/_prev_t4").exists())
  }

  test("crash between rename-aside and rename-in is healed, never destroyed") {
    val root = tmpRoot()
    val first = Seq((1L, "a", 10L)).toDF("id", "name", "value")
    assert(Wap.publish(spark, first, root, "t5", rules, d => Seq(d("id"))).published)
    // simulate the crash window: serving parked at _prev_, staged never renamed in
    assert(new java.io.File(s"$root/t5").renameTo(new java.io.File(s"$root/_prev_t5")))
    assert(Wap.recover(spark, root, "t5"))
    assert(spark.read.parquet(s"$root/t5").select($"id").as[Long].collect().toSet === Set(1L))
    assert(!Wap.recover(spark, root, "t5")) // idempotent no-op when healthy
    // publish() itself heals on entry — even when the new batch FAILS its
    // audit, the parked-only copy must come back, not be deleted
    assert(new java.io.File(s"$root/t5").renameTo(new java.io.File(s"$root/_prev_t5")))
    val bad = Seq((2L, "b", -5L)).toDF("id", "name", "value")
    val r = Wap.publish(spark, bad, root, "t5", rules, d => Seq(d("id")))
    assert(!r.published)
    assert(spark.read.parquet(s"$root/t5").select($"id").as[Long].collect().toSet === Set(1L))
    assert(!new java.io.File(s"$root/_prev_t5").exists())
  }

  test("empty publish is refused by the row-count floor") {
    val root = tmpRoot()
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "name", "value")
    val r = Wap.publish(spark, empty, root, "t3", rules, d => Seq(d("id")))
    assert(!r.published && r.nRows === 0L)
    assert(!new java.io.File(s"$root/t3").exists())
  }
}
