package graft

import graft.operators.{AsOfJoin, Sessionize, TopK}
import org.apache.spark.sql.functions._

class OperatorSpec extends GraftSuite {
  import spark.implicits._

  test("AsOfJoin picks latest right row <= left time, inclusive") {
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("key", "t", "tag")
      .select($"key", timestamp_micros($"t").as("t"), $"tag")
    val left = Seq((1L, 15L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), (3L, 50L, 103L))
      .toDF("key", "t", "id")
      .select($"key", timestamp_micros($"t").as("t"), $"id")
    val got = AsOfJoin(left, right, "key", "t", Seq("tag"))
      .select($"id", $"tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(100L) == "a")   // 15 -> latest at 10
    assert(got(101L) == "b")   // 20 -> inclusive match at 20
    assert(got(102L) == null)  // 5  -> nothing before
    assert(got(103L) == null)  // unseen key
  }

  test("AsOfJoin tolerance drops matches older than the lookback bound") {
    val right = Seq((1L, 10L, "a")).toDF("key", "t", "tag")
      .select($"key", timestamp_micros($"t").as("t"), $"tag")
    val left = Seq((1L, 15L, 100L), (1L, 500L, 101L)).toDF("key", "t", "id")
      .select($"key", timestamp_micros($"t").as("t"), $"id")
    val got = AsOfJoin(left, right, "key", "t", Seq("tag"), toleranceMicros = 50L)
      .select($"id", $"tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(100L) == "a")   // 15-10=5 <= 50
    assert(got(101L) == null)  // 500-10=490 > 50 -> dropped
  }

  test("Sessionize splits on gaps > threshold") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 2000L, 3L), // gap 1900 > 1000 -> new session
      (2L, 0L, 4L))
      .toDF("user_id", "us", "event_id")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"event_id")
    val got = Sessionize(df, "user_id", "ts", "event_id", gapMicros = 1000L)
      .select($"event_id", $"session_num").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 2L && got(4L) == 1L)
  }

  test("TopK keeps k rows per group in order") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = TopK(df, Seq($"g"), Seq($"v".desc), 2)
      .select($"g", $"v", $"rk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set(("a", 3, 1), ("a", 2, 2), ("b", 9, 1)))
  }
}
