package graft

import graft.functions.UrlFns
import graft.operators.DomainOps
import org.apache.spark.sql.functions._

/** Domain-aware corpus curation: URL parsing edge cases beyond the
  * gate's synthetic shapes, and the cap/rebalance operator
  * invariants.
  */
class CorpusSpec extends GraftSuite {
  import spark.implicits._

  private def parse(url: String) = {
    val host = UrlFns.host($"u")
    Seq(url).toDF("u").select(
      UrlFns.scheme($"u"), host, UrlFns.registeredDomain(host),
      UrlFns.tld(host), UrlFns.port($"u"), UrlFns.path($"u"),
      UrlFns.pathDepth($"u"), UrlFns.hasQuery($"u")).collect().head
  }

  test("UrlFns handles hosts, ports, deep subdomains, and degenerate URLs") {
    val r = parse("https://a.news.Example.COM:8443/x/y/z.html?q=1#frag")
    assert(r.getString(0) == "https")
    assert(r.getString(1) == "a.news.example.com", "host must lowercase, keep subdomains")
    assert(r.getString(2) == "example.com" && r.getString(3) == "com")
    assert(r.getString(4) == "8443" && r.getString(5) == "/x/y/z.html")
    assert(r.getLong(6) == 3 && r.getBoolean(7))

    val bare = parse("http://www.example.org")
    assert(bare.getString(1) == "example.org", "www. must strip")
    assert(bare.getString(4) == "" && bare.getString(5) == "" && bare.getLong(6) == 0)

    val noScheme = parse("not a url at all")
    assert(noScheme.getString(0) == "" && noScheme.getString(1) == "")

    // single-label host (intranet): no registered domain to extract
    assert(parse("https://localhost:9000/a").getString(2) == "")

    // a '?' that lives in the fragment is NOT a query (RFC 3986)
    assert(!parse("https://example.com/page#sec?note").getBoolean(7))
    assert(parse("https://example.com/page?x=1#sec").getBoolean(7))
  }

  test("canonicalize strips disguises and keeps meaningful parts") {
    def canon(u: String) =
      Seq(u).toDF("u").select(UrlFns.canonicalize($"u")).collect().head.getString(0)
    // www, default port, trailing slash, fragment, tracking params all go
    assert(canon("HTTP://www.Example.COM:80/a/b/?utm_source=x&ref=rss#frag")
      == "http://example.com/a/b")
    assert(canon("https://example.com:443/x") == "https://example.com/x")
    // non-default port, real params, param order survive
    assert(canon("https://example.com:8443/x?b=2&a=1") == "https://example.com:8443/x?b=2&a=1")
    // mixed query: tracking stripped, payload kept
    assert(canon("https://example.com/x?utm_campaign=c&id=7&fbclid=z") ==
      "https://example.com/x?id=7")
    // '?' only in the fragment is not a query
    assert(canon("https://example.com/x#sec?note") == "https://example.com/x")
    // utm param with no '=' still strips; lone '&' leaves nothing
    assert(canon("https://example.com/x?utm_source&") == "https://example.com/x")
    // root path trailing slash drops; bare host stays bare
    assert(canon("https://example.com/") == "https://example.com")
    assert(canon("https://example.com") == "https://example.com")
    // a 'reference' param is NOT the tracking param 'ref'
    assert(canon("https://example.com/x?reference=9") == "https://example.com/x?reference=9")
  }

  test("rebalanceToUniform refuses an input that already carries n_before") {
    val docs = Tables(spark, sf0001).documents
      .select($"doc_id", $"lang", lit(1L).as("n_before"))
    intercept[IllegalArgumentException](
      DomainOps.rebalanceToUniform(docs, $"lang", $"doc_id"))
  }

  test("capPerDomain keeps at most K per domain, deterministically") {
    val docs = Tables(spark, sf0001).documents
      .select($"doc_id", $"source".as("host"))
    val a = DomainOps.capPerDomain(docs, $"host", $"doc_id", cap = 4).collect()
    val byHost = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byHost.values.max <= 4 && byHost.values.forall(_ > 0))
    val b = DomainOps.capPerDomain(docs, $"host", $"doc_id", cap = 4)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a.map(_.getLong(0)).sorted.toSeq == b, "draw must be deterministic")
    // the native draw equals the window formulation
    val w = graft.operators.TopK(docs, Seq($"host"),
        Seq(md5($"doc_id".cast("string")), $"doc_id"), 4)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(b == w, "native GroupTopK must match the window draw")
  }

  test("rebalanceToUniform thins big groups, passes small ones whole") {
    val docs = Tables(spark, sf001).documents
      .select($"doc_id", when($"lang" === "en", "small").otherwise("big").as("g"))
    val before = docs.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = DomainOps.rebalanceToUniform(docs, $"g", $"doc_id")
      .groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = before.values.sum / 2.0
    assert(before("big") > target, "fixture must be skewed for the test to bite")
    assert(after("small") == before("small"), "under-represented group must pass whole")
    assert(after("big") < before("big"), "over-represented group must thin")
    assert(math.abs(after("big") - target) < target * 0.2,
      s"thinned size ${after("big")} should approach the uniform target $target")
  }

  test("domain-quality blocklist composes: docs from blocked hosts filter out") {
    val blocklist = graft.queries.CorpusQ.corpusDomainQuality(spark, sf0001)
    val rows = blocklist.collect()
    val blocked = rows.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    assert(blocked.nonEmpty && blocked.size < rows.length,
      "fixture must split hosts for the test to bite")
    // the curation step: anti-join the corpus against blocked hosts
    // (host derivation mirrors the gate's synthesis ground truth)
    val docs = Tables(spark, sf0001).documents
    val withHost = docs.select($"doc_id",
      concat($"source", lit(".example."),
        when($"lang" === "en", "com").when($"lang" === "de", "org")
          .when($"lang" === "fr", "net").when($"lang" === "es", "io")
          .otherwise("cn")).as("host"))
    val kept = withHost.join(
      blocklist.filter($"blocked").select($"host"), Seq("host"), "left_anti")
    val keptHosts = kept.select($"host").distinct().collect().map(_.getString(0)).toSet
    assert(keptHosts.intersect(blocked).isEmpty, "blocked hosts must not survive")
    assert(kept.count() == withHost.count() -
      withHost.join(blocklist.filter($"blocked").select($"host"), Seq("host")).count())
  }

  test("corpus cap plans through GroupTopKExec, not a window sort") {
    val p = graft.queries.CorpusQ.corpusDomainCap(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("GroupTopK"), s"cap not planned natively:\n$p")
    assert(!p.contains("Window"), s"cap fell back to WindowExec:\n$p")
  }

  test("budget mix: greedy take conserves the 60% budget with one partial source") {
    val rows = graft.queries.CorpusQ.corpusBudgetMix(spark, sf0001)
      .orderBy($"rank").collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(budget === 3 * total / 5)
    assert(rows.map(_.getAs[Long]("taken_tokens")).sum === budget,
      "greedy take must exactly conserve the budget")
    // quality ordering is non-increasing down the rank
    val q = rows.map(_.getAs[Double]("mean_quality"))
    assert(q.zip(q.tail).forall { case (a, b) => a >= b - 1e-9 })
    // exactly one source is partially taken; later ones contribute zero
    val partial = rows.filter(r =>
      r.getAs[Long]("taken_tokens") > 0 &&
        r.getAs[Long]("taken_tokens") < r.getAs[Long]("n_tokens"))
    assert(partial.length <= 1)
    rows.foreach { r =>
      val f = r.getAs[Double]("frac_taken")
      assert(f >= 0.0 && f <= 1.0)
    }
  }
}
