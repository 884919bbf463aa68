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

  /** OHLC candlestick bars — THE finance aggregation the reference's
    * dashboard charts imply: per (minute, series), the first / highest /
    * lowest / last trade price. Open and close are ORDER-DEPENDENT
    * aggregates over an unordered group; a sort-based formulation
    * (window + pick first/last) shuffles every row to sort whole
    * groups, so instead each is computed as a lexicographic min/max
    * over a (ts, event_id, value) struct — plain commutative aggregates
    * that combine map-side like any min/max, with the unique event_id
    * making the pick deterministic under ties. One hash aggregate, one
    * exchange, no window.
    */
  def ohlcBars(events: DataFrame): DataFrame = {
    val pick = struct(col("ts").as("t"), col("event_id").as("i"),
      col("value").as("v"))
    events
      .groupBy(date_trunc("minute", col("ts")).as("window_start"),
        col("event_type"))
      .agg(
        min(pick).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(pick).getField("v").as("close"),
        count(lit(1)).as("n_trades"))
  }

  /** Oracle spells the same bars with ordered window picks — the
    * formulation the struct min/max trick replaces.
    */
  val ohlcBarsOracle: String =
    """SELECT DISTINCT
      |       date_trunc('minute', ts) AS window_start, event_type,
      |       first_value(value) OVER w AS open,
      |       max(value) OVER f AS high,
      |       min(value) OVER f AS low,
      |       last_value(value) OVER (PARTITION BY date_trunc('minute', ts), event_type
      |                               ORDER BY ts, event_id
      |                               ROWS BETWEEN UNBOUNDED PRECEDING
      |                                        AND UNBOUNDED FOLLOWING) AS close,
      |       count(*) OVER f AS n_trades
      |FROM events
      |WINDOW w AS (PARTITION BY date_trunc('minute', ts), event_type
      |             ORDER BY ts, event_id),
      |       f AS (PARTITION BY date_trunc('minute', ts), event_type)""".stripMargin

  /** Incremental view maintenance: the gold rollup maintained from
    * MERGEABLE partial states instead of a full recompute.
    *
    * At 100 TB the rollup is never recomputed from scratch when a day
    * of data lands — each increment is aggregated into partial states
    * (count, sum, min, max: all commutative monoids) and MERGED into
    * the stored states; avg is derived at read time as sum/count.
    * That is exactly what this query proves: events are split at a
    * time cutoff into a "base" (the stored view) and a "delta" (the
    * new arrivals), each is partially aggregated, and the union is
    * re-aggregated with the merge functions (sum-of-counts,
    * sum-of-sums, min-of-mins, max-of-maxes). The oracle is the
    * one-shot full aggregate — hash-equality IS the IVM correctness
    * proof. (Same algebra as Spark's own map-side partial aggregation,
    * here lifted to a cross-batch materialized view. stddev/avg-style
    * measures keep (n, sum) or (n, sum, m2) states; only the derived
    * value is rounded, once, at the output.)
    *
    * Plan shape: two pruned scans (the cutoff predicate pushes to
    * parquet), two map-side-combined hash aggregates over hour-grain
    * keys, a union, and an O(groups) merge aggregate — no join, no
    * extra shuffle beyond the two partial aggs.
    */
  def incrementalRollup(events: DataFrame, cutoff: String = "2024-01-20"): DataFrame = {
    val hour: Column = date_trunc("hour", col("ts"))
    // the sum state is DECIMAL, not double: decimal addition is exact
    // and associative, so the merged two-level sum is bit-identical to
    // the oracle's one-level sum no matter how the partials split —
    // double sums drift past the 6 dp rounding at a few hundred rows
    // per group. The double appears only in the final division.
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), hour.as("hour_window"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(28,10)")).as("sm"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
    val cut = lit(cutoff).cast("timestamp")
    val base = partial(events.filter(col("ts") < cut))
    val delta = partial(events.filter(col("ts") >= cut))
    base.unionByName(delta)
      .groupBy(col("event_type"), col("hour_window"))
      .agg(
        sum(col("cnt")).as("transaction_count"),
        round(sum(col("sm")).cast("double") / sum(col("cnt")), 6).as("avg_value"),
        round(min(col("mn")), 6).as("min_value"),
        round(max(col("mx")), 6).as("max_value"))
  }

  /** Oracle = the full one-shot aggregate, with the same exact-decimal
    * sum state so the float algebra matches the merged-partials
    * derivation bit for bit.
    */
  val incrementalRollupOracle: String =
    """SELECT event_type,
      |       date_trunc('hour', ts) AS hour_window,
      |       count(*) AS transaction_count,
      |       round(sum(CAST(value AS DECIMAL(28,10)))::DOUBLE / count(*), 6) AS avg_value,
      |       round(min(value), 6) AS min_value,
      |       round(max(value), 6) AS max_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin
}
