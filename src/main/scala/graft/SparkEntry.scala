package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Every implemented operator, one QueryDef each (SURVEY.md §2). */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ Etl.defs ++ Text.defs ++ DedupQ.defs ++ SimilarityQ.defs ++
      Extra.defs ++ TrainingQ.defs ++ TpchMore.defs ++ Analytics.defs ++ CorpusQ.defs ++
      QualityQ.defs ++ TextFilters.defs ++ SequenceQ.defs ++ AuditQ.defs ++
      StatsQ.defs ++ SegmentQ.defs ++ TsQ.defs ++ LexQ.defs ++ DriftQ.defs ++ BasketQ.defs ++
      InferQ.defs ++ AssocQ.defs ++ OpsQ.defs ++ MlQ.defs ++ LearnQ.defs ++ MineQ.defs ++ OptimQ.defs ++ PatternQ.defs ++ TemporalQ.defs ++ GraphQ.defs ++ ShardQ.defs ++ RobustQ.defs ++ SqlFaceQ.defs ++ HeaderQ.defs ++ CurateQ.defs ++ InsightQ.defs ++ EvalQ.defs ++ TrendQ.defs ++ MetricsQ.defs ++ RankQ.defs ++ DiagQ.defs ++ SeriesQ.defs ++ GovQ.defs ++ ExperimentQ.defs ++ InfraQ.defs ++ SamplingQ.defs ++ RigorQ.defs ++ SpatialQ.defs ++ EntityQ.defs ++ CausalQ.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
