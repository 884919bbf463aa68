package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship "silver-to-signal" query (SURVEY §7.5): one plan touching
  * the whole spine — scan → tumbling silver bars (volatility + average
  * price) → per-minute gold rollup join → SMA-5 / signal window pass →
  * sort.
  *
  * Plan shape at scale: one shuffle for the bars aggregate (map-side
  * partial agg), the gold rollup derived FROM the bars (no second scan
  * of the fact table), a broadcast-joined rollup (small: one row per
  * minute × type), and one window pass partitioned by the series key.
  */
object Flagship {

  def silverToSignal(events: DataFrame): DataFrame = {
    val bars = events
      .groupBy(date_trunc("minute", col("ts")).as("minute_window"), col("event_type"))
      .agg(
        round(coalesce(stddev_pop(col("value")), lit(0.0)), 6).as("volatility"),
        round(avg(col("value")), 6).as("average_price"),
        count(lit(1)).as("n_rows"))
    val gold = bars
      .groupBy(col("minute_window").as("mw"))
      .agg(
        round(avg(col("average_price")), 6).as("minute_avg"),
        round(max(col("average_price")), 6).as("minute_max"))
    val series = Window.partitionBy(col("event_type"))
      .orderBy(col("minute_window"))
    val frame = series.rowsBetween(-4, 0)
    val sma = when(count(col("average_price")).over(frame) >= 5,
      round(avg(col("average_price")).over(frame), 6))
    bars
      .join(broadcast(gold), col("minute_window") === col("mw"))
      .drop("mw")
      .withColumn("sma5", sma)
      .withColumn("signal",
        when(col("sma5").isNull, lit("HOLD"))
          .when(col("sma5") > col("average_price"), lit("BUY"))
          .otherwise(lit("SELL")))
      .orderBy(col("minute_window").desc, col("event_type"))
  }

  val silverToSignalOracle: String =
    """WITH bars AS (
      |  SELECT date_trunc('minute', ts) AS minute_window, event_type,
      |         round(coalesce(stddev_pop(value), 0), 6) AS volatility,
      |         round(avg(value), 6) AS average_price,
      |         count(*) AS n_rows
      |  FROM events GROUP BY 1, 2
      |), gold AS (
      |  SELECT minute_window AS mw,
      |         round(avg(average_price), 6) AS minute_avg,
      |         round(max(average_price), 6) AS minute_max
      |  FROM bars GROUP BY 1
      |)
      |SELECT minute_window, event_type, volatility, average_price, n_rows,
      |       minute_avg, minute_max, sma5,
      |       CASE WHEN sma5 IS NULL THEN 'HOLD'
      |            WHEN sma5 > average_price THEN 'BUY'
      |            ELSE 'SELL' END AS signal
      |FROM (
      |  SELECT b.*, g.minute_avg, g.minute_max,
      |         CASE WHEN count(average_price) OVER f >= 5
      |              THEN round(avg(average_price) OVER f, 6) END AS sma5
      |  FROM bars b JOIN gold g ON b.minute_window = g.mw
      |  WINDOW f AS (PARTITION BY event_type ORDER BY minute_window
      |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |)
      |ORDER BY minute_window DESC, event_type""".stripMargin
}
