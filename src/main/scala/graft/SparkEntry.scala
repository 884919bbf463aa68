package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module contributes (name -> query) plus matching DuckDB oracle SQL;
  * this object is just the registry. Column names are aliased identically
  * in the Spark query and the oracle SQL (the driver's compare hashes by
  * sorted column name).
  */
object SparkEntry {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.silverToSignal(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    "q_gold_rollup" -> ((s, dir) => gold.GoldRollup.overEvents(Tables.events(s, dir))),
    "q_incremental_rollup" -> ((s, dir) => gold.GoldRollup.incrementalRollup(Tables.events(s, dir))),
    "q_ohlc_bars" -> ((s, dir) => gold.GoldRollup.ohlcBars(Tables.events(s, dir))),
    "q_flagship" -> ((s, dir) => Flagship.silverToSignal(Tables.events(s, dir)))
  ) ++ ingest.Bronze.queries ++ silver.SilverAgg.queries ++
    analytics.Indicators.queries ++ relational.StarQueries.queries ++
    relational.TypedQueries.queries ++ relational.TemporalJoins.queries ++
    relational.RuntimeFilters.queries ++ relational.MergeableSketches.queries ++
    ml.PriceModel.queries ++ ext.TextOps.queries ++ ext.Dedup.queries ++
    ext.Curation.queries ++ ext.QualityProbe.queries ++
    ext.Similarity.queries ++ ext.Multimodal.queries ++ streaming.Streams.queries ++
    sources.Sinks.queries ++ sources.Layout.queries ++ sources.TxLog.queries ++
    sources.IcebergLog.queries ++
    sources.DeltaLog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_gold_rollup" -> gold.GoldRollup.overEventsOracle,
    "q_incremental_rollup" -> gold.GoldRollup.incrementalRollupOracle,
    "q_ohlc_bars" -> gold.GoldRollup.ohlcBarsOracle,
    "q_flagship" -> Flagship.silverToSignalOracle
  ) ++ ingest.Bronze.oracles ++ silver.SilverAgg.oracles ++
    analytics.Indicators.oracles ++ relational.StarQueries.oracles ++
    relational.TypedQueries.oracles ++ relational.TemporalJoins.oracles ++
    relational.RuntimeFilters.oracles ++ relational.MergeableSketches.oracles ++
    ml.PriceModel.oracles ++ ext.TextOps.oracles ++ ext.Dedup.oracles ++
    ext.Curation.oracles ++ ext.QualityProbe.oracles ++
    ext.Similarity.oracles ++ ext.Multimodal.oracles ++ streaming.Streams.oracles ++
    sources.Sinks.oracles ++ sources.Layout.oracles ++ sources.TxLog.oracles ++
    sources.IcebergLog.oracles ++
    sources.DeltaLog.oracles
}
