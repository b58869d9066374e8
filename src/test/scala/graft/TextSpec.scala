package graft

import graft.functions.TextFns
import graft.queries.Text
import org.apache.spark.sql.functions._

class TextSpec extends GraftSuite {
  import spark.implicits._

  test("token and BPE-ish counts") {
    val r = Seq("Hello world, 42 times!").toDF("text")
      .select(TextFns.tokenCount($"text"), TextFns.bpeCount($"text")).collect().head
    assert(r.getLong(0) == 4)
    // Hello | world | , | 42 | times | !  -> 6
    assert(r.getLong(1) == 6)
  }

  test("shingles produce n-grams, short docs fall back to whole text") {
    val got = Seq("a b c d").toDF("t").select(TextFns.shingles($"t", 3)).as[Seq[String]].collect().head
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t").select(TextFns.shingles($"t", 3)).as[Seq[String]].collect().head
    assert(short == Seq("a b"))
  }

  test("fingerprint is order-invariant over token sets") {
    val fps = Seq("b a c", "c b a", "a b x").toDF("t")
      .select(TextFns.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("langid predicts marker-dominant language deterministically") {
    val df = Seq(
      (1L, "der hund und die katze das haus", "de"),
      (2L, "the cat and the dog of the house is", "en"),
      (3L, "el perro y los gatos las casas", "es")).toDF("doc_id", "text", "lang")
    // route through a temp view shaped like documents
    val got = graft.queries.Text.textLangid(spark, sf0001)
    assert(got.columns.contains("pred_lang"))
    val mini = df.withColumn("source", lit("x")).withColumn("n_chars", length($"text"))
    // directly exercise marker logic via tokensIn
    val cnt = df.select(TextFns.tokensIn($"text", Seq("der", "die", "und", "das"))).as[Long].collect()
    assert(cnt.toSeq == Seq(4L, 0L, 0L))
  }

  test("quality score is within [0,1] on the corpus") {
    val scores = Text.textQuality(spark, sf0001).select($"quality_score").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(s => s >= 0.0 && s <= 1.0))
  }
}
