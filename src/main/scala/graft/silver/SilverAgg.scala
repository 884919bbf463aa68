package graft.silver

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Silver-layer windowed aggregation — the heart of the reference
  * pipeline: `process_silver.py:50-57` (sliding 1-min/30-s window,
  * stddev volatility + average price per (window, symbol)), plus the
  * null-fill at `process_silver.py:67`.
  *
  * `current_timestamp()` (`process_silver.py:56`) is replaced with the
  * deterministic `max(ts)` per group so oracle comparisons are stable
  * (SURVEY §5.1); the streaming pipeline (graft.streaming) restores the
  * processing-time stamp.
  *
  * Scale notes (100 TB): time-window group-by shuffles once on
  * (window, key) with map-side partial aggregation; a sliding window with
  * k = duration/slide overlap multiplies shuffle rows by k — keep k small
  * (here 2, as the reference). In streaming the same plan runs
  * incrementally against the state store, so only open windows are held.
  */
object SilverAgg {

  /** Core silver transform, batch or streaming: sliding-window
    * volatility + average of `valCol` per (`window`, `keyCol`).
    * Pure DataFrame => DataFrame — reused verbatim under readStream.
    */
  def silverBars(df: DataFrame, tsCol: String, keyCol: String, valCol: String,
                 duration: String = "1 minute", slide: String = "30 seconds"): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide).as("w"), col(keyCol))
      .agg(
        coalesce(stddev_pop(col(valCol)), lit(0.0)).as("volatility"),
        avg(col(valCol)).as("average_price"),
        max(col(tsCol)).as("processed_time"))

  private def windowed(events: DataFrame, duration: String, slide: Option[String]): DataFrame = {
    val w: Column = slide match {
      case Some(s) => window(col("ts"), duration, s)
      case None    => window(col("ts"), duration)
    }
    events.groupBy(w.as("w"), col("event_type"))
      .agg(
        round(coalesce(stddev_pop(col("value")), lit(0.0)), 6).as("volatility"),
        round(avg(col("value")), 6).as("average_price"),
        max(col("ts")).as("processed_time"),
        count(lit(1)).as("n_rows"))
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("volatility"), col("average_price"),
        col("processed_time"), col("n_rows"))
  }

  /** Tumbling 1-minute variant (oracle: date_trunc buckets). */
  def tumbling(events: DataFrame): DataFrame = windowed(events, "1 minute", None)

  val tumblingOracle: String =
    """SELECT date_trunc('minute', ts) AS window_start,
      |       date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
      |       event_type,
      |       round(coalesce(stddev_pop(value), 0), 6) AS volatility,
      |       round(avg(value), 6) AS average_price,
      |       max(ts) AS processed_time,
      |       count(*) AS n_rows
      |FROM events
      |GROUP BY 1, 2, 3""".stripMargin

  /** Sliding 1-min / 30-s — the reference's exact window shape
    * (`process_silver.py:52`): every event lands in exactly 2 windows.
    */
  def sliding(events: DataFrame): DataFrame = windowed(events, "1 minute", Some("30 seconds"))

  /** DuckDB emulation of Spark's sliding window: each event belongs to the
    * windows starting at bucket30(ts) and bucket30(ts)-30s.
    */
  val slidingOracle: String =
    """SELECT window_start,
      |       window_start + INTERVAL 60 SECOND AS window_end,
      |       event_type,
      |       round(coalesce(stddev_pop(value), 0), 6) AS volatility,
      |       round(avg(value), 6) AS average_price,
      |       max(ts) AS processed_time,
      |       count(*) AS n_rows
      |FROM (
      |  SELECT e.*,
      |         time_bucket(INTERVAL 30 SECOND, CAST(ts AS TIMESTAMP))
      |           - k.k * INTERVAL 30 SECOND AS window_start
      |  FROM events e CROSS JOIN (VALUES (0), (1)) k(k)
      |)
      |GROUP BY 1, 2, 3""".stripMargin

  /** Null-fill path (P4): sample stddev of a 1-row group IS null in both
    * engines; fill with 0 exactly as `process_silver.py:67`'s na.fill.
    * Grouped at (user_id, minute) so singleton groups actually occur.
    */
  def volatilityFill(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), date_trunc("minute", col("ts")).as("minute_window"))
      .agg(round(stddev_samp(col("value")), 6).as("volatility"),
        count(lit(1)).as("n_rows"))
      .na.fill(0.0, Seq("volatility"))

  val volatilityFillOracle: String =
    """SELECT user_id,
      |       date_trunc('minute', ts) AS minute_window,
      |       coalesce(round(stddev_samp(value), 6), 0) AS volatility,
      |       count(*) AS n_rows
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Session windows (gap-based, per user): Spark's `session_window`
    * merges an event into the open session when its time is <= the
    * session end (start + gap) — a gap of EXACTLY the threshold still
    * merges (verified against Spark 4.1; oracle uses strict >); end =
    * last event + gap. The streaming form is identical (same builtin over
    * readStream + watermark). T10-adjacent capability the reference
    * never used but an event pipeline needs.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** DuckDB emulation: new-session flags via lag, session ids via
    * running sum, end = max(ts) + gap.
    */
  val sessionsOracle: String =
    """SELECT min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       user_id, count(*) AS n_events,
      |       round(sum(value), 2) AS session_value
      |FROM (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM (
      |    SELECT user_id, ts, value,
      |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
      |                THEN 1 ELSE 0 END AS new_s
      |    FROM events
      |  )
      |)
      |GROUP BY user_id, sid""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_silver_tumbling" -> ((s, dir) => tumbling(Tables.events(s, dir))),
    "q_silver_sliding" -> ((s, dir) => sliding(Tables.events(s, dir))),
    "q_volatility_fill" -> ((s, dir) => volatilityFill(Tables.events(s, dir))),
    "q_session_window" -> ((s, dir) => sessions(Tables.events(s, dir)))
  )

  def oracles: Map[String, String] = Map(
    "q_silver_tumbling" -> tumblingOracle,
    "q_silver_sliding" -> slidingOracle,
    "q_volatility_fill" -> volatilityFillOracle,
    "q_session_window" -> sessionsOracle
  )
}
