package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dashboard analytics re-expressed as Spark window functions.
  *
  * Reference: `dashboard.py:17-22` (RSI-14), `dashboard.py:46` (SMA-5),
  * `dashboard.py:18,91-94` (lag diff), `dashboard.py:47` (prediction
  * error), `dashboard.py:104-107` (buy/sell signal), `dashboard.py:89-99`
  * (last-row pick).
  *
  * pandas parity notes (SURVEY §2.5):
  *  - `rolling(n)` yields null until n observations exist → every rolling
  *    metric is gated on a window count >= n;
  *  - RSI divides gain/loss: pandas x/0 = inf ⇒ RSI=100; 0/0 = NaN ⇒ null.
  *    Both cases are made explicit so Spark and DuckDB agree.
  *
  * Scale notes: all windows are partitioned by the series key
  * (`event_type`) — state per partition is a bounded rows-frame, so the
  * plan is a single shuffle on the key followed by a sorted window pass;
  * no unbounded frames, no driver collection. Skewed keys would show up
  * as straggler partitions; for a truly hot single series, range-bucket
  * the time dimension and recombine (not needed at reference scale where
  * the series count is tiny but series length is huge — there, secondary
  * partition by coarse time bucket and stitch the boundary rows).
  */
object Indicators {

  private def series = Window.partitionBy(col("event_type"))
    .orderBy(col("ts"), col("event_id"))

  /** W1: value − previous value per series (pandas `.diff()`). */
  def lagDiff(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("delta", round(col("value") - lag(col("value"), 1).over(series), 6) + lit(0.0))

  val lagDiffOracle: String =
    """SELECT event_id, ts, event_type, value,
      |       round(value - lag(value, 1) OVER w, 6) + 0.0 AS delta
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin

  /** W2: SMA-n with pandas min_periods gating. */
  def sma(events: DataFrame, n: Int = 5): DataFrame = {
    val frame = series.rowsBetween(-(n - 1), 0)
    events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("sma",
        when(count(col("value")).over(frame) >= n,
          round(avg(col("value")).over(frame), 6)))
  }

  def smaOracle(n: Int = 5): String =
    s"""SELECT event_id, ts, event_type, value,
       |       CASE WHEN count(value) OVER w >= $n
       |            THEN round(avg(value) OVER w, 6) END AS sma
       |FROM events
       |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
       |             ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  /** W3: simple-mean RSI-n (NOT Wilder smoothing — matches
    * `dashboard.py:17-22` exactly): gain/loss split of the lag diff,
    * rolling means, RS ratio with explicit 0-division semantics.
    */
  def rsi(events: DataFrame, n: Int = 14): DataFrame = {
    val frame = series.rowsBetween(-(n - 1), 0)
    val withDelta = events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("delta", col("value") - lag(col("value"), 1).over(series))
    val gain = when(col("delta") > 0, col("delta")).otherwise(lit(0.0))
    val loss = when(col("delta") < 0, -col("delta")).otherwise(lit(0.0))
    withDelta
      .withColumn("avg_gain", avg(when(col("delta").isNotNull, gain)).over(frame))
      .withColumn("avg_loss", avg(when(col("delta").isNotNull, loss)).over(frame))
      .withColumn("n_obs", count(col("delta")).over(frame))
      .withColumn("rsi",
        when(col("n_obs") < n, lit(null))
          .when(col("avg_loss") === 0 && col("avg_gain") === 0, lit(null))
          .when(col("avg_loss") === 0, lit(100.0))
          .otherwise(round(lit(100.0) - lit(100.0) / (lit(1.0) + col("avg_gain") / col("avg_loss")), 6)))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"), col("rsi"))
  }

  def rsiOracle(n: Int = 14): String =
    s"""SELECT event_id, ts, event_type, value,
       |       CASE WHEN n_obs < $n THEN NULL
       |            WHEN avg_loss = 0 AND avg_gain = 0 THEN NULL
       |            WHEN avg_loss = 0 THEN 100.0
       |            ELSE round(100.0 - 100.0 / (1.0 + avg_gain / avg_loss), 6)
       |       END AS rsi
       |FROM (
       |  SELECT *,
       |         avg(CASE WHEN delta IS NULL THEN NULL
       |                  WHEN delta > 0 THEN delta ELSE 0 END) OVER f AS avg_gain,
       |         avg(CASE WHEN delta IS NULL THEN NULL
       |                  WHEN delta < 0 THEN -delta ELSE 0 END) OVER f AS avg_loss,
       |         count(delta) OVER f AS n_obs
       |  FROM (
       |    SELECT event_id, ts, event_type, value,
       |           value - lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS delta
       |    FROM events
       |  )
       |  WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
       |               ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  /** W4+W6: prediction error + buy/sell signal, with SMA-5 standing in
    * for the model prediction (`dashboard.py:47,104-107`).
    */
  def signal(events: DataFrame): DataFrame = {
    val frame = series.rowsBetween(-4, 0)
    val smaCol = when(count(col("value")).over(frame) >= 5,
      avg(col("value")).over(frame))
    events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("predicted", round(smaCol, 6))
      .withColumn("diff", round(col("value") - smaCol, 6) + lit(0.0))
      .withColumn("signal",
        when(col("predicted").isNull, lit("HOLD"))
          .when(col("predicted") > col("value"), lit("BUY"))
          .otherwise(lit("SELL")))
  }

  val signalOracle: String =
    """SELECT event_id, ts, event_type, value,
      |       round(predicted_raw, 6) AS predicted,
      |       round(value - predicted_raw, 6) + 0.0 AS diff,
      |       CASE WHEN predicted_raw IS NULL THEN 'HOLD'
      |            WHEN predicted_raw > value THEN 'BUY'
      |            ELSE 'SELL' END AS signal
      |FROM (
      |  SELECT event_id, ts, event_type, value,
      |         CASE WHEN count(value) OVER w >= 5
      |              THEN avg(value) OVER w END AS predicted_raw
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |)""".stripMargin

  /** W5: last row per series (`df.iloc[-1]` analog, made deterministic). */
  def lastRow(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  val lastRowOracle: String =
    """SELECT event_id, ts, event_type, value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** Scale-out SMA: identical output to `sma`, computed WITHOUT a
    * single per-series partition. The series is split into coarse time
    * buckets (week); each bucket is stitched with the previous bucket's
    * last n−1 rows ("carry" rows, excluded from output), so every
    * bucket computes its rows' frames locally and in parallel.
    *
    * This is the answer to "one hot series longer than a partition":
    * shuffle key becomes (series, bucket) — parallelism scales with
    * time — while the rows-frame semantics stay exact. Empty buckets
    * are handled (carry targets the next EXISTING bucket per series);
    * the remaining precondition is that a NON-empty bucket holds
    * ≥ n−1 rows per series (frame ≪ bucket density; week buckets at
    * the corpus density give 40+ rows per bucket). Output is
    * oracle-checked against the sequential single-window SQL.
    */
  def smaPartitioned(events: DataFrame, n: Int = 5): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("bucket", date_trunc("week", col("ts")))
    val wDesc = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts").desc, col("event_id").desc)
    // each bucket's carry lands in the series' NEXT EXISTING bucket —
    // not bucket+7d, which would drop the lookback across an empty
    // calendar week and null out the next bucket's first frames. The
    // bucket list is O(series × weeks): a tiny lead() window + a
    // broadcast-sized join back.
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val nextBucket = base.select(col("event_type"), col("bucket")).distinct()
      .withColumn("next_bucket", lead(col("bucket"), 1).over(wNext))
    val carry = base
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") < n)
      .drop("rn")
      .join(broadcast(nextBucket), Seq("event_type", "bucket"))
      .filter(col("next_bucket").isNotNull)
      .withColumn("bucket", col("next_bucket"))
      .drop("next_bucket")
      .withColumn("is_carry", lit(true))
    val stitched = base.withColumn("is_carry", lit(false)).unionByName(carry)
    val frame = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-(n - 1), 0)
    stitched
      .withColumn("sma",
        when(count(col("value")).over(frame) >= n,
          round(avg(col("value")).over(frame), 6)))
      .filter(!col("is_carry"))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"), col("sma"))
  }

  /** Bollinger bands (n, k): SMA-n ± k·sample-stddev over the trailing
    * rows frame, with the same min_periods gating as `sma`, plus %B
    * (where the price sits inside the band; null on a zero-width band).
    * Same scale shape as every indicator here: one shuffle on the
    * series key, bounded rows frame, no unbounded state.
    */
  def bollinger(events: DataFrame, n: Int = 20, k: Double = 2.0): DataFrame = {
    val frame = series.rowsBetween(-(n - 1), 0)
    val gated = count(col("value")).over(frame) >= n
    val mid = avg(col("value")).over(frame)
    val sd = stddev_samp(col("value")).over(frame)
    val upper = mid + lit(k) * sd
    val lower = mid - lit(k) * sd
    events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("bb_mid", when(gated, round(mid, 6)))
      .withColumn("bb_upper", when(gated, round(upper, 6)))
      .withColumn("bb_lower", when(gated, round(lower, 6)))
      .withColumn("pct_b",
        when(gated && upper =!= lower,
          round((col("value") - lower) / (upper - lower), 6) + lit(0.0)))
  }

  def bollingerOracle(n: Int = 20, k: Double = 2.0): String =
    s"""SELECT event_id, ts, event_type, value,
       |       CASE WHEN gated THEN round(mid, 6) END AS bb_mid,
       |       CASE WHEN gated THEN round(mid + $k*sd, 6) END AS bb_upper,
       |       CASE WHEN gated THEN round(mid - $k*sd, 6) END AS bb_lower,
       |       CASE WHEN gated AND (mid + $k*sd) <> (mid - $k*sd)
       |            THEN round((value - (mid - $k*sd)) / ((mid + $k*sd) - (mid - $k*sd)), 6) + 0.0
       |       END AS pct_b
       |FROM (
       |  SELECT event_id, ts, event_type, value,
       |         avg(value) OVER f AS mid,
       |         stddev_samp(value) OVER f AS sd,
       |         count(value) OVER f >= $n AS gated
       |  FROM events
       |  WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
       |               ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  /** Left fold acc ← α·v + (1−α)·acc over a frame-ordered value list,
    * seeded with the list's first element — pandas `ewm(adjust=False)`
    * semantics over a BOUNDED lookback. Spark's `aggregate` and
    * DuckDB's `list_reduce` run the identical operation sequence, so
    * the two engines agree bit-for-bit, not just to rounding.
    */
  private def emaFold(l: Column, alpha: Double): Column =
    when(size(l) === 1, element_at(l, 1).cast("double"))
      .otherwise(aggregate(
        slice(l, lit(2), size(l) - 1),
        element_at(l, 1).cast("double"),
        (acc, v) => lit(alpha) * v + lit(1.0 - alpha) * acc))

  /** SQL twin of `emaFold` (DuckDB). `CAST` keeps the fold in IEEE
    * doubles — bare `2.0/21.0` would be DECIMAL arithmetic in DuckDB.
    */
  private def emaFoldSql(listExpr: String, num: Int, den: Int): String =
    s"list_reduce(list_transform($listExpr, x -> CAST(x AS DOUBLE)), " +
      s"(acc, v) -> (CAST($num AS DOUBLE)/$den)*v + (1 - CAST($num AS DOUBLE)/$den)*acc)"

  /** EMA-n with α = 2/(n+1) over a trailing 3n-row lookback. The
    * truncation is the scale decision: a true EMA folds the ENTIRE
    * series history into every row (inherently sequential per series);
    * bounding the lookback at 3n rows (residual tail weight
    * (1−α)^{3n} ≈ 0.3%) turns it into a fixed-size rows frame — one
    * shuffle on the series key, constant state per row, and the
    * partitioned-bucket scale-out of `smaPartitioned` applies
    * unchanged. The oracle computes the same bounded definition.
    */
  def ema(events: DataFrame, n: Int = 20): DataFrame = {
    val look = 3 * n
    val frame = series.rowsBetween(-(look - 1), 0)
    val alpha = 2.0 / (n + 1)
    // null prices are dropped from the series BEFORE framing, on both
    // engines — otherwise Spark's null-skipping collect_list and
    // DuckDB's null-keeping list() would frame different row sets
    events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("ema", round(emaFold(collect_list(col("value")).over(frame), alpha), 6))
  }

  def emaOracle(n: Int = 20): String = {
    val look = 3 * n
    s"""SELECT event_id, ts, event_type, value,
       |       round(${emaFoldSql("list(value) OVER f", 2, n + 1)}, 6) AS ema
       |FROM events
       |WHERE value IS NOT NULL
       |WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
       |             ROWS BETWEEN ${look - 1} PRECEDING AND CURRENT ROW)""".stripMargin
  }

  /** MACD(12, 26, 9): fast EMA − slow EMA, a 9-period EMA signal line
    * over the (unrounded) MACD series, and the histogram. Two window
    * passes over the same series partitioning — Catalyst reuses the
    * exchange, so the plan stays one shuffle + two sorted window
    * stages. Lookbacks bounded as in `ema`.
    */
  def macd(events: DataFrame): DataFrame = {
    val fastF = series.rowsBetween(-(3 * 12 - 1), 0)
    val slowF = series.rowsBetween(-(3 * 26 - 1), 0)
    val sigF = series.rowsBetween(-(3 * 9 - 1), 0)
    val macdRaw = emaFold(collect_list(col("value")).over(fastF), 2.0 / 13) -
      emaFold(collect_list(col("value")).over(slowF), 2.0 / 27)
    val base = events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .filter(col("value").isNotNull) // same null contract as `ema`
      .withColumn("macd_raw", macdRaw)
    val sigRaw = emaFold(collect_list(col("macd_raw")).over(sigF), 2.0 / 10)
    base
      .withColumn("macd", round(col("macd_raw"), 6) + lit(0.0))
      .withColumn("signal_line", round(sigRaw, 6) + lit(0.0))
      .withColumn("histogram", round(col("macd_raw") - sigRaw, 6) + lit(0.0))
      .drop("macd_raw")
  }

  val macdOracle: String =
    s"""SELECT event_id, ts, event_type, value,
       |       round(macd_raw, 6) + 0.0 AS macd,
       |       round(${emaFoldSql("list(macd_raw) OVER s", 2, 10)}, 6) + 0.0 AS signal_line,
       |       round(macd_raw - ${emaFoldSql("list(macd_raw) OVER s", 2, 10)}, 6) + 0.0 AS histogram
       |FROM (
       |  SELECT event_id, ts, event_type, value,
       |         ${emaFoldSql("list(value) OVER fast", 2, 13)}
       |           - ${emaFoldSql("list(value) OVER slow", 2, 27)} AS macd_raw
       |  FROM events
       |  WHERE value IS NOT NULL
       |  WINDOW fast AS (PARTITION BY event_type ORDER BY ts, event_id
       |                  ROWS BETWEEN ${3 * 12 - 1} PRECEDING AND CURRENT ROW),
       |         slow AS (PARTITION BY event_type ORDER BY ts, event_id
       |                  ROWS BETWEEN ${3 * 26 - 1} PRECEDING AND CURRENT ROW)
       |)
       |WINDOW s AS (PARTITION BY event_type ORDER BY ts, event_id
       |             ROWS BETWEEN ${3 * 9 - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  /** Rolling cross-series correlation: click vs view mean price per
    * minute, Pearson correlation over a trailing n-minute frame — the
    * co-movement signal a pairs-trading strategy watches. Computed
    * from EXPLICIT co-moment window sums (n·Σxy − ΣxΣy over the
    * explicit denominator) rather than an engine `corr` aggregate, so
    * both engines execute the same arithmetic and the 4dp rounding is
    * all the tolerance needed. Gated like every rolling metric
    * (null until n points, and on a zero denominator).
    *
    * Scale shape: the aligned series is one row per MINUTE (the
    * upstream agg collapses the corpus), and the co-moment windows run
    * bucket-and-carry like `smaPartitioned`: the series splits into
    * week buckets and every frame computes locally inside its (bucket)
    * partition — NO single-task corpus-scale window anywhere in the
    * plan (spec-asserted). Unlike `smaPartitioned` the carry here has
    * NO bucket-density precondition: each bucket's lookback is the
    * GLOBAL last n−1 rows across all preceding buckets, assembled from
    * the per-bucket tail candidates (≤ n−1 rows per non-empty bucket —
    * config-scale, so the stitching join and its ranking window are
    * broadcast-tiny even for a sparse series whose weeks hold fewer
    * than n minutes).
    */
  def rollingCorr(events: DataFrame, n: Int = 30): DataFrame = {
    val byMin = events.filter(col("event_type").isin("click", "view"))
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(avg(when(col("event_type") === "click", col("value"))).as("x"),
        avg(when(col("event_type") === "view", col("value"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val base = byMin.withColumn("bucket", date_trunc("week", col("minute")))
    // tail candidates: the last ≤ n−1 rows of EVERY bucket (any row
    // deeper than n−1 in its own bucket can never be part of a later
    // bucket's lookback)
    val wDesc = Window.partitionBy(col("bucket")).orderBy(col("minute").desc)
    val candidates = base
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") < n)
      .drop("rn")
    // each target bucket stitches the global last n−1 rows drawn from
    // all PRECEDING buckets' candidates: candidates × buckets is
    // O(weeks² · n) — config-scale — so the broadcast join and the
    // per-target ranking window never touch corpus-scale data
    val buckets = base.select(col("bucket").as("target")).distinct()
    val wCarry = Window.partitionBy(col("target")).orderBy(col("minute").desc)
    val carry = candidates
      .join(broadcast(buckets), col("bucket") < col("target"))
      .withColumn("rn", row_number().over(wCarry))
      .filter(col("rn") < n)
      .select(col("minute"), col("x"), col("y"), col("target").as("bucket"))
      .withColumn("is_carry", lit(true))
    val stitched = base.withColumn("is_carry", lit(false)).unionByName(carry)
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("minute")).rowsBetween(-(n - 1), 0)
    val cnt = count(lit(1)).over(w).cast("double")
    val sx = sum(col("x")).over(w)
    val sy = sum(col("y")).over(w)
    val sxx = sum(col("x") * col("x")).over(w)
    val syy = sum(col("y") * col("y")).over(w)
    val sxy = sum(col("x") * col("y")).over(w)
    // clamp: float cancellation can push a near-zero variance term a
    // few ulps NEGATIVE — Spark's sqrt would yield NaN and DuckDB
    // ERRORS outright, so both engines clamp at 0 (the gate then
    // nulls the row via den > 0)
    val den = sqrt(greatest(cnt * sxx - sx * sx, lit(0.0))) *
      sqrt(greatest(cnt * syy - sy * sy, lit(0.0)))
    stitched
      .withColumn("n_obs", count(lit(1)).over(w))
      .withColumn("corr_xy",
        when(col("n_obs") >= n && den > 0,
          // + 0.0 folds IEEE negative zero into positive zero — the
          // engines disagree on the sign of a correlation that rounds
          // to zero, and the hash gate distinguishes -0.0 from 0.0
          round((cnt * sxy - sx * sy) / den, 4) + lit(0.0)))
      .filter(!col("is_carry"))
      .select(col("minute"), round(col("x"), 6).as("x"),
        round(col("y"), 6).as("y"), col("n_obs"), col("corr_xy"))
  }

  def rollingCorrOracle(n: Int = 30): String =
    s"""SELECT minute, round(x, 6) AS x, round(y, 6) AS y, n_obs,
       |       CASE WHEN n_obs >= $n AND den > 0
       |            THEN round((cnt * sxy - sx * sy) / den, 4) + 0.0 END AS corr_xy
       |FROM (
       |  SELECT minute, x, y,
       |         count(*) OVER w AS n_obs,
       |         CAST(count(*) OVER w AS DOUBLE) AS cnt,
       |         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
       |         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
       |         sum(x * y) OVER w AS sxy,
       |         sqrt(greatest(CAST(count(*) OVER w AS DOUBLE) * sum(x * x) OVER w - sum(x) OVER w * sum(x) OVER w, 0))
       |           * sqrt(greatest(CAST(count(*) OVER w AS DOUBLE) * sum(y * y) OVER w - sum(y) OVER w * sum(y) OVER w, 0)) AS den
       |  FROM (
       |    SELECT date_trunc('minute', ts) AS minute,
       |           avg(CASE WHEN event_type = 'click' THEN value END) AS x,
       |           avg(CASE WHEN event_type = 'view' THEN value END) AS y
       |    FROM events WHERE event_type IN ('click', 'view')
       |    GROUP BY 1
       |  )
       |  WHERE x IS NOT NULL AND y IS NOT NULL
       |  WINDOW w AS (ORDER BY minute ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  /** RANGE-frame window (value-based, vs the ROWS frames above): the
    * trailing 10-minute average — every peer row within the time range
    * joins the frame regardless of row count, the frame a time-series
    * metric actually means when events arrive unevenly. Spark needs a
    * numeric order key for rangeBetween → epoch seconds.
    */
  def rangeFrameAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(unix_micros(col("ts"))) // full precision: second-truncation would shift frame edges
      .rangeBetween(-600L * 1000000, 0)
    events.select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("avg_10m", round(avg(col("value")).over(w), 6))
      .withColumn("n_10m", count(lit(1)).over(w))
  }

  val rangeFrameAvgOracle: String =
    """SELECT event_id, event_type, ts, value,
      |       round(avg(value) OVER w, 6) AS avg_10m,
      |       count(*) OVER w AS n_10m
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts
      |             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)""".stripMargin

  /** Resample each series to a regular 1-minute grid with forward
    * fill — the gap-filling step every indicator pipeline runs before
    * rolling math on irregular ticks (pandas `resample('1min').last()
    * .ffill()`). Per minute the CLOSE is the lexicographic struct max
    * (the OHLC idiom — one hash aggregate, no per-minute window); the
    * grid is generated per series from its own [min, max] minute
    * bounds (calendar-bounded — a year is ~526k rows per series, never
    * corpus-scale), and the fill is one `last(value, ignoreNulls)`
    * running window per series — the same single-shuffle sorted-pass
    * shape as every indicator here. `filled` marks synthesized rows.
    */
  def resampleFfill(events: DataFrame): DataFrame = {
    val perMin = events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .groupBy(col("event_type"), col("minute"))
      .agg(max(struct(col("ts"), col("event_id"), col("value")))
        .getField("value").as("close"))
      // minutes × series — calendar-bounded; checkpointed so the grid
      // bounds and the join don't each replay the corpus aggregate
      .localCheckpoint()
    val grid = perMin.groupBy(col("event_type"))
      .agg(min(col("minute")).as("lo"), max(col("minute")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("minute"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perMin, Seq("event_type", "minute"), "left")
      .withColumn("filled", col("close").isNull)
      .withColumn("value", last(col("close"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("minute"), col("value"), col("filled"))
  }

  val resampleFfillOracle: String =
    """WITH pm AS (
      |  SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute,
      |         last_value(value) OVER (PARTITION BY event_type, date_trunc('minute', ts)
      |                                 ORDER BY ts, event_id
      |                                 ROWS BETWEEN UNBOUNDED PRECEDING
      |                                          AND UNBOUNDED FOLLOWING) AS close
      |  FROM events
      |), grid AS (
      |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
      |  FROM (SELECT event_type, min(minute) AS lo, max(minute) AS hi FROM pm GROUP BY 1)
      |)
      |SELECT g.event_type, g.minute,
      |       last_value(pm.close IGNORE NULLS) OVER (
      |         PARTITION BY g.event_type ORDER BY g.minute
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |       pm.close IS NULL AS filled
      |FROM grid g LEFT JOIN pm ON pm.event_type = g.event_type AND pm.minute = g.minute""".stripMargin

  /** Linear-interpolation resample (pandas `resample('1min').last()
    * .interpolate()`): gap minutes take the time-weighted blend of the
    * PREVIOUS and NEXT known closes; leading/trailing gaps (no anchor
    * on one side) forward-/backward-fill to the single known side.
    * Same grid and per-minute close as `resampleFfill`; the anchors
    * are one running `last(ignoreNulls)` and one `first(ignoreNulls)`
    * window (both bounded sorted passes per series, same shuffle).
    * Values are emitted UNROUNDED — see the determinism note below.
    */
  def resampleInterp(events: DataFrame): DataFrame = {
    val perMin = events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .groupBy(col("event_type"), col("minute"))
      .agg(max(struct(col("ts"), col("event_id"), col("value")))
        .getField("value").as("close"))
      .localCheckpoint()
    val grid = perMin.groupBy(col("event_type"))
      .agg(min(col("minute")).as("lo"), max(col("minute")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("minute"))
    val anchor = when(col("close").isNotNull, struct(col("minute").as("m"), col("close").as("v")))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next known anchor" = last(ignoreNulls) over a cumulative frame in
    // DESCENDING minute order — semantically identical to
    // first(ignoreNulls) over (currentRow, unboundedFollowing) ascending,
    // but O(n) per partition: Spark's UnboundedFollowing frame re-scans
    // current→end for every row (quadratic — at a 30-day fixture span the
    // 43k-minute grid made that ~2e9 aggregate updates per series), while
    // a cumulative frame is one running pass. Costs one extra sort of the
    // (tiny, minutes×series) grid, not of the corpus.
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("minute").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Determinism: time deltas stay INTEGER seconds until the single
    // frac division, so both engines feed identical operands through
    // identical IEEE ops and the interpolated doubles are BIT-IDENTICAL
    // — which is also why the value is NOT rounded: interpolation on a
    // regular grid systematically produces terminating decimals (e.g.
    // x.xxx8125 from a 32-minute gap), and on exactly those values
    // Spark's round (HALF_UP over the shortest DECIMAL representation)
    // and DuckDB's round (over the BINARY double) disagree by one ulp
    // of the last digit. Rounding here would CREATE divergence where
    // bit-identity already holds (observed at sf0.001).
    val sec = (c: Column) => unix_timestamp(c)
    val frac = (sec(col("minute")) - sec(col("p.m"))).cast("double") /
      (sec(col("nx.m")) - sec(col("p.m"))).cast("double")
    grid.join(perMin, Seq("event_type", "minute"), "left")
      .withColumn("p", last(anchor, ignoreNulls = true).over(wPrev))
      .withColumn("nx", last(anchor, ignoreNulls = true).over(wNext))
      .withColumn("value",
        when(col("p").isNull, col("nx.v"))
          .when(col("nx").isNull, col("p.v"))
          .when(col("nx.m") === col("p.m"), col("p.v"))
          .otherwise(col("p.v") + (col("nx.v") - col("p.v")) * frac))
      .select(col("event_type"), col("minute"), col("value"),
        col("close").isNull.as("filled"))
  }

  val resampleInterpOracle: String =
    """WITH pm AS (
      |  SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute,
      |         last_value(value) OVER (PARTITION BY event_type, date_trunc('minute', ts)
      |                                 ORDER BY ts, event_id
      |                                 ROWS BETWEEN UNBOUNDED PRECEDING
      |                                          AND UNBOUNDED FOLLOWING) AS close
      |  FROM events
      |), grid AS (
      |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
      |  FROM (SELECT event_type, min(minute) AS lo, max(minute) AS hi FROM pm GROUP BY 1)
      |), j AS (
      |  SELECT g.event_type, g.minute, pm.close,
      |         last_value(CASE WHEN pm.close IS NOT NULL
      |                         THEN struct_pack(m := g.minute, v := pm.close) END IGNORE NULLS)
      |           OVER (PARTITION BY g.event_type ORDER BY g.minute
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
      |         first_value(CASE WHEN pm.close IS NOT NULL
      |                          THEN struct_pack(m := g.minute, v := pm.close) END IGNORE NULLS)
      |           OVER (PARTITION BY g.event_type ORDER BY g.minute
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
      |  FROM grid g LEFT JOIN pm ON pm.event_type = g.event_type AND pm.minute = g.minute
      |)
      |SELECT event_type, minute,
      |       CASE WHEN p IS NULL THEN nx.v
      |            WHEN nx IS NULL THEN p.v
      |            WHEN nx.m = p.m THEN p.v
      |            ELSE p.v + (nx.v - p.v) *
      |                 ((epoch(minute) - epoch(p.m)) /
      |                  (epoch(nx.m) - epoch(p.m))) END AS value,
      |       close IS NULL AS filled
      |FROM j""".stripMargin

  /** Weekly cohort retention — the canonical product-analytics query
    * over an event stream: users grouped by first-seen week, retention
    * = fraction of each cohort active at week offsets 0..n. Week
    * offsets are calendar-day arithmetic on Monday-truncated weeks
    * (`datediff ÷ 7` — both engines truncate weeks to Monday), so the
    * bucket is exact in ANY session timezone: a DST transition shifts
    * the epoch delta by ±3600 s, but never the day count between two
    * week starts.
    *
    * Scale shape: the first-seen frame is the USER DIMENSION — one
    * user-keyed aggregate a production pipeline persists; here it
    * localCheckpoints for its two consumers (cohort sizes + the event
    * join). The event join shuffles on user_id once, the distinct
    * active-user count is a (cohort, offset)-keyed agg, and cohort
    * sizes broadcast back (cohorts are calendar-bounded).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      .localCheckpoint()
    val sizes = firstSeen.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
    events.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .join(firstSeen, "user_id")
      .groupBy(col("cohort"),
        floor(datediff(col("wk"), col("cohort")) / 7).cast("bigint").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("week_offset"), col("active_users"), col("cohort_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 6).as("retention"))
  }

  val cohortRetentionOracle: String =
    """WITH fs AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY 1
      |), sz AS (SELECT cohort, count(*) AS cohort_users FROM fs GROUP BY 1),
      |act AS (
      |  SELECT fs.cohort,
      |         CAST(date_diff('day', fs.cohort, date_trunc('week', e.ts)) // 7 AS BIGINT)
      |           AS week_offset,
      |         count(DISTINCT e.user_id) AS active_users
      |  FROM events e JOIN fs USING (user_id)
      |  GROUP BY 1, 2
      |)
      |SELECT act.cohort, week_offset, active_users, cohort_users,
      |       round(active_users::DOUBLE / cohort_users, 6) AS retention
      |FROM act JOIN sz USING (cohort)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cohort_retention" -> ((s, dir) => cohortRetention(Tables.events(s, dir))),
    "q_resample_ffill" -> ((s, dir) => resampleFfill(Tables.events(s, dir))),
    "q_resample_interp" -> ((s, dir) => resampleInterp(Tables.events(s, dir))),
    "q_bollinger" -> ((s, dir) => bollinger(Tables.events(s, dir))),
    "q_ema" -> ((s, dir) => ema(Tables.events(s, dir))),
    "q_macd" -> ((s, dir) => macd(Tables.events(s, dir))),
    "q_rolling_corr" -> ((s, dir) => rollingCorr(Tables.events(s, dir))),
    "q_range_frame" -> ((s, dir) => rangeFrameAvg(graft.Tables.events(s, dir))),
    "q_sma_partitioned" -> ((s, dir) => smaPartitioned(Tables.events(s, dir))),
    "q_lag_diff" -> ((s, dir) => lagDiff(Tables.events(s, dir))),
    "q_sma" -> ((s, dir) => sma(Tables.events(s, dir))),
    "q_rsi" -> ((s, dir) => rsi(Tables.events(s, dir))),
    "q_signal" -> ((s, dir) => signal(Tables.events(s, dir))),
    "q_last_row" -> ((s, dir) => lastRow(Tables.events(s, dir)))
  )

  def oracles: Map[String, String] = Map(
    "q_cohort_retention" -> cohortRetentionOracle,
    "q_resample_ffill" -> resampleFfillOracle,
    "q_resample_interp" -> resampleInterpOracle,
    "q_bollinger" -> bollingerOracle(),
    "q_ema" -> emaOracle(),
    "q_macd" -> macdOracle,
    "q_rolling_corr" -> rollingCorrOracle(),
    "q_range_frame" -> rangeFrameAvgOracle,
    // the partitioned computation must equal the sequential definition
    "q_sma_partitioned" -> smaOracle(),
    "q_lag_diff" -> lagDiffOracle,
    "q_sma" -> smaOracle(),
    "q_rsi" -> rsiOracle(),
    "q_signal" -> signalOracle,
    "q_last_row" -> lastRowOracle
  )
}
