package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.gold.GoldRollup
import graft.silver.SilverAgg

/** Window-aggregation semantics: tumbling/sliding bars, session
  * windows, null-fill, the gold rollup, and the flagship composition.
  */
class SilverGoldSpec extends SparkSpec {

  private def ts(h: Int, m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:$s%02d")

  private def events(rows: (Long, Timestamp, Long, String, Double)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("tumbling bars: per-minute volatility and average") {
    val df = events(
      (1L, ts(0, 0, 10), 1L, "a", 10.0), (2L, ts(0, 0, 50), 1L, "a", 20.0),
      (3L, ts(0, 1, 10), 1L, "a", 7.0))
    val out = SilverAgg.tumbling(df).orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(4) == 15.0) // avg minute 0
    assert(out(0).getDouble(3) == 5.0)  // stddev_pop {10,20}
    assert(out(1).getDouble(3) == 0.0)  // singleton -> coalesce 0
    assert(out(0).getLong(6) == 2L && out(1).getLong(6) == 1L)
  }

  test("sliding 1-min/30-s: every event contributes to exactly 2 windows") {
    val df = events((1L, ts(0, 0, 10), 1L, "a", 10.0))
    val out = SilverAgg.sliding(df).collect()
    assert(out.length == 2)
  }

  test("session windows merge at exactly-gap, split beyond it") {
    val df = events(
      (1L, ts(0, 0), 1L, "a", 1.0), (2L, ts(0, 20), 1L, "a", 2.0),
      (3L, ts(0, 50), 1L, "a", 3.0),  // exactly 30m after prev -> still merges
      (4L, ts(1, 21), 1L, "a", 5.0),  // 31m after prev -> new session
      (5L, ts(2, 0), 2L, "a", 4.0))   // other user
    val out = SilverAgg.sessions(df).orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getLong(3) == 3L)              // 0:00,0:20,0:50 in one session
    assert(out(0).getTimestamp(1) == ts(1, 20))  // end = last event + gap
  }

  test("volatility null-fill: singleton groups become 0.0 not null") {
    val df = events((1L, ts(0, 0), 1L, "a", 5.0))
    val out = SilverAgg.volatilityFill(df).head()
    assert(out.getDouble(2) == 0.0)
  }

  test("gold rollup aggregates per (key, minute) sorted desc") {
    val df = events(
      (1L, ts(0, 0, 5), 1L, "a", 10.0), (2L, ts(0, 0, 30), 1L, "a", 30.0),
      (3L, ts(0, 1, 0), 1L, "a", 7.0))
    val out = GoldRollup.overEvents(df).collect()
    assert(out.length == 2)
    assert(out(0).getTimestamp(1) == ts(0, 1)) // desc: minute 1 first
    assert(out(1).getDouble(2) == 20.0 && out(1).getDouble(3) == 30.0 && out(1).getDouble(4) == 10.0)
    assert(out(1).getLong(5) == 2L)
  }

  test("flagship: signal only after 5 bars, BUY/SELL consistent with SMA") {
    val rows = (0 until 6).map(i => (i.toLong, ts(0, i), 1L, "a", if (i == 5) 1.0 else 10.0))
    val out = Flagship.silverToSignal(events(rows: _*))
      .orderBy("minute_window").collect()
    val signals = out.map(_.getString(8)).toSeq
    assert(signals.take(4).forall(_ == "HOLD"))
    assert(signals(4) == "SELL") // constant series: sma == price -> not >
    assert(signals(5) == "BUY")  // sma(10,10,10,10,1)=8.2 > 1
  }

  test("incremental rollup: merged partials equal the full recompute") {
    import org.apache.spark.sql.functions._
    // rows straddling the cutoff: the (a, 2024-01-19 23:00) group would
    // be WRONG if the merge double-counted or dropped a partial
    val df = events(
      (1L, Timestamp.valueOf("2024-01-19 23:10:00"), 1L, "a", 10.0),
      (2L, Timestamp.valueOf("2024-01-20 00:10:00"), 1L, "a", 30.0),
      (3L, Timestamp.valueOf("2024-01-20 00:40:00"), 1L, "a", 20.0),
      (4L, Timestamp.valueOf("2024-01-21 09:00:00"), 2L, "b", 5.0))
    val inc = GoldRollup.incrementalRollup(df)
      .orderBy("event_type", "hour_window").collect()
    val full = df.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_window"))
      .agg(count(lit(1)).as("transaction_count"),
        round(sum(col("value")) / count(lit(1)), 6).as("avg_value"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"))
      .orderBy("event_type", "hour_window").collect()
    assert(inc.toSeq == full.toSeq)
    // the straddle-adjacent delta group merged both rows into one state
    assert(inc.exists(r => r.getString(0) == "a" && r.getLong(2) == 2L
      && r.getDouble(3) == 25.0))
  }

  test("ohlc bars: open=first, close=last by (ts, event_id), high/low exact") {
    val df = events(
      (2L, ts(0, 0, 10), 1L, "a", 20.0), // same ts as event 1: id breaks tie
      (1L, ts(0, 0, 10), 1L, "a", 10.0), // open (smaller event_id)
      (3L, ts(0, 0, 40), 1L, "a", 5.0),  // low + close
      (4L, ts(0, 0, 20), 1L, "b", 7.0))  // other series
    val out = GoldRollup.ohlcBars(df).orderBy("event_type").collect()
    val a = out(0)
    assert(a.getString(1) == "a")
    assert(a.getDouble(2) == 10.0, "open ties break by event_id")
    assert(a.getDouble(3) == 20.0 && a.getDouble(4) == 5.0)
    assert(a.getDouble(5) == 5.0 && a.getLong(6) == 3L)
    assert(out(1).getDouble(2) == 7.0 && out(1).getDouble(5) == 7.0)
  }
}
