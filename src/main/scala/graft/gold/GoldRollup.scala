package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer rollup — the dbt/DuckDB model re-expressed as a Spark batch
  * aggregate.
  *
  * Reference: `dbt_project/models/gold_market_summary.sql:3-16` — per
  * (symbol, date_trunc('minute', processed_time)) compute AVG/MAX/MIN of
  * average_price, AVG(volatility), COUNT(*), ORDER BY minute DESC.
  *
  * Scale notes (100 TB): a single hash-aggregate over a time-truncated key —
  * partial aggregation happens map-side, so the shuffle carries one row per
  * (group × input-partition), not per input row. With a date-partitioned
  * table the scan prunes to the queried days; no join, no skew risk beyond
  * hot minutes (AQE handles those). Rounding to 6 dp is for cross-engine
  * float determinism in the oracle compare, not a semantic change.
  */
object GoldRollup {

  /** Generic per-minute rollup of `valueCol` grouped by `keyCol`. */
  def rollup(df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val minute: Column = date_trunc("minute", col(tsCol))
    df.groupBy(col(keyCol), minute.as("minute_window"))
      .agg(
        round(avg(col(valueCol)), 6).as("avg_value"),
        round(max(col(valueCol)), 6).as("max_value"),
        round(min(col(valueCol)), 6).as("min_value"),
        count(lit(1)).as("transaction_count"))
      .orderBy(col("minute_window").desc, col(keyCol))
  }

  /** The driver-corpus instantiation: events(event_type, ts, value). */
  def overEvents(events: DataFrame): DataFrame =
    rollup(events, "event_type", "ts", "value")

  val overEventsOracle: String =
    """SELECT event_type,
      |       date_trunc('minute', ts) AS minute_window,
      |       round(avg(value), 6) AS avg_value,
      |       round(max(value), 6) AS max_value,
      |       round(min(value), 6) AS min_value,
      |       count(*) AS transaction_count
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 2 DESC, 1""".stripMargin
}
