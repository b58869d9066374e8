package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-aware corpus curation (SURVEY.md §2.5 extension): web-scale
  * training corpora are balanced per-site, not per-document — a
  * handful of hosts contribute most of the crawl, and uncapped they
  * dominate the mixture. These are the two standard controls:
  *
  *  - [[capPerDomain]]: keep at most K documents per domain, chosen
  *    uniformly-at-random but DETERMINISTICALLY (md5 order) so a
  *    100 TB rebuild keeps the identical rows.
  *  - [[rebalanceToUniform]]: thin over-represented groups down to a
  *    uniform target share by content-addressed sampling.
  *
  * Scale: the cap routes through the native GroupTopK operator
  * (bounded heap per domain inside each map partition, then one
  * shuffle on domain over the ALREADY-CAPPED candidates — a hot
  * domain ships at most partitions×K rows, never its full crawl).
  * The rebalance is one map-side-combinable count aggregate plus a
  * shuffle-free filter; the per-group stats table has group
  * cardinality, so the join back carries no broadcast hint — AQE
  * broadcasts when it measures small (the tfidf/lm_score lesson).
  */
object DomainOps {

  /** Keep at most `cap` rows per domain, ranked by (md5(id), id) — a
    * deterministic uniform draw. Emits the surviving rows plus their
    * in-domain rank `rk`.
    */
  def capPerDomain(df: DataFrame, domainCol: Column, idCol: Column, cap: Int): DataFrame =
    TopK.native(df, Seq(domainCol), Seq(md5(idCol.cast("string")), idCol), cap)

  /** Thin each group to (at most) a uniform share of the corpus:
    * group g keeps each row with probability min(1, (total/nGroups)/n_g),
    * md5-thresholded. Returns the input rows that survive, with the
    * group's `n_before` riding along. Under-represented groups pass
    * through untouched (rate clamps at 1).
    */
  def rebalanceToUniform(df: DataFrame, groupCol: Column, idCol: Column): DataFrame = {
    // the output ADDS n_before; fail fast rather than emit an
    // ambiguous duplicate when the input already carries one (e.g. a
    // chained rebalance — drop or rename it first)
    require(!df.columns.contains("n_before"),
      "rebalanceToUniform adds an n_before column; rename the input's existing one first")
    // internal names are prefixed so a caller's own `g`/`cutoff`
    // column can never collide with the join keys
    val byGroup = df.groupBy(groupCol.as("__graft_g")).agg(count(lit(1)).as("n_before"))
    val totals = byGroup.agg(
      sum(col("n_before")).cast("double").as("total"),
      count(lit(1)).as("ngroups"))
    // floor, not round: rate*1e6 sits just below the integer for
    // many rates and floor truncates identically in both engines,
    // while round() half-way behavior diverges (gotcha bank)
    val rates = byGroup.crossJoin(broadcast(totals))
      .select(col("__graft_g"), col("n_before"),
        floor(least(lit(1.0),
          (col("total") / col("ngroups")) / col("n_before")) * 1000000L)
          .cast("long").as("__graft_cutoff"))
    df.join(rates, groupCol === col("__graft_g"))
      .filter(Sample.md5Bucket(idCol) < col("__graft_cutoff"))
      .drop("__graft_g", "__graft_cutoff")
  }
}
