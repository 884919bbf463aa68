package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship "silver-to-signal" query (SURVEY §7.5): one plan touching
  * the whole spine — scan → tumbling silver bars (volatility + average
  * price) → per-minute gold rollup join → SMA-5 / signal window pass →
  * sort.
  *
  * Float-determinism rule (learned at sf0.1): round ONCE at the output,
  * never feed rounded values into further averages — avg-of-rounded
  * lands exactly on round-off half-boundaries where cross-engine ulp
  * drift flips the last digit. All derived stats here (gold rollup,
  * SMA) consume the RAW bar averages; the signal comparison uses the
  * rounded outputs so both engines compare identical values.
  *
  * Plan shape at scale: one shuffle for the bars aggregate (map-side
  * partial agg), the gold rollup derived FROM the bars (no second scan
  * of the fact table), a broadcast-joined rollup (small: one row per
  * minute), and one window pass partitioned by the series key.
  */
object Flagship {

  def silverToSignal(events: DataFrame): DataFrame = {
    val bars = events
      .groupBy(date_trunc("minute", col("ts")).as("minute_window"), col("event_type"))
      .agg(
        coalesce(stddev_pop(col("value")), lit(0.0)).as("vol_raw"),
        avg(col("value")).as("avg_raw"),
        count(lit(1)).as("n_rows"))
    // Gold per-minute stats as WINDOW functions over the bars — not a
    // self-join of a second aggregation: one fact scan, one agg, then
    // two window passes. (A join of bars⋈gold re-scans the fact table:
    // the two agg subtrees prune differently, defeating ReuseExchange.)
    val minuteW = Window.partitionBy(col("minute_window"))
    val series = Window.partitionBy(col("event_type"))
      .orderBy(col("minute_window"))
    val frame = series.rowsBetween(-4, 0)
    val smaRaw = when(count(col("avg_raw")).over(frame) >= 5,
      avg(col("avg_raw")).over(frame))
    bars
      .withColumn("minute_avg", round(avg(col("avg_raw")).over(minuteW), 6))
      .withColumn("minute_max", round(max(col("avg_raw")).over(minuteW), 6))
      .withColumn("sma5", round(smaRaw, 6))
      .withColumn("volatility", round(col("vol_raw"), 6))
      .withColumn("average_price", round(col("avg_raw"), 6))
      .withColumn("signal",
        when(col("sma5").isNull, lit("HOLD"))
          .when(col("sma5") > col("average_price"), lit("BUY"))
          .otherwise(lit("SELL")))
      .select(col("minute_window"), col("event_type"), col("volatility"),
        col("average_price"), col("n_rows"), col("minute_avg"),
        col("minute_max"), col("sma5"), col("signal"))
      .orderBy(col("minute_window").desc, col("event_type"))
  }

  val silverToSignalOracle: String =
    """WITH bars AS (
      |  SELECT date_trunc('minute', ts) AS minute_window, event_type,
      |         coalesce(stddev_pop(value), 0) AS vol_raw,
      |         avg(value) AS avg_raw,
      |         count(*) AS n_rows
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT minute_window, event_type,
      |       round(vol_raw, 6) AS volatility,
      |       round(avg_raw, 6) AS average_price,
      |       n_rows, minute_avg, minute_max, sma5,
      |       CASE WHEN sma5 IS NULL THEN 'HOLD'
      |            WHEN sma5 > round(avg_raw, 6) THEN 'BUY'
      |            ELSE 'SELL' END AS signal
      |FROM (
      |  SELECT b.*,
      |         round(avg(avg_raw) OVER m, 6) AS minute_avg,
      |         round(max(avg_raw) OVER m, 6) AS minute_max,
      |         CASE WHEN count(avg_raw) OVER f >= 5
      |              THEN round(avg(avg_raw) OVER f, 6) END AS sma5
      |  FROM bars b
      |  WINDOW m AS (PARTITION BY minute_window),
      |         f AS (PARTITION BY event_type ORDER BY minute_window
      |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |)
      |ORDER BY minute_window DESC, event_type""".stripMargin
}
