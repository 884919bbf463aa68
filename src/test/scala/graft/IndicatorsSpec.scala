package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.analytics.Indicators

/** W1–W6 semantics on tiny hand-checked series (SURVEY §2.5),
  * including the pandas `min_periods` null-gating.
  */
class IndicatorsSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def series(values: Double*): DataFrame = {
    val s = spark
    import s.implicits._
    values.zipWithIndex
      .map { case (v, i) => (i.toLong, ts(i), "x", v) }
      .toDF("event_id", "ts", "event_type", "value")
  }

  test("lagDiff is value minus previous, null for the first row") {
    val out = Indicators.lagDiff(series(10, 12, 11)).orderBy("event_id")
      .select("delta").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(2.0), Some(-1.0)))
  }

  test("SMA-5 is null until 5 observations exist (pandas min_periods)") {
    val out = Indicators.sma(series(1, 2, 3, 4, 5, 6)).orderBy("event_id")
      .select("sma").collect().map(r => Option(r.get(0)))
    assert(out.take(4).forall(_.isEmpty))
    assert(out(4).contains(3.0)) // mean(1..5)
    assert(out(5).contains(4.0)) // mean(2..6)
  }

  test("RSI-14 is 100 for monotonic gains, 0 for monotonic losses") {
    val up = Indicators.rsi(series((1 to 20).map(_.toDouble): _*))
      .orderBy("event_id").select("rsi").collect().map(r => Option(r.get(0)))
    assert(up.take(14).forall(_.isEmpty)) // gated until 14 deltas: rows 0..13 null, row 14 first defined
    assert(up.last.contains(100.0))
    val down = Indicators.rsi(series((1 to 20).reverse.map(_.toDouble): _*))
      .orderBy("event_id").select("rsi").collect().map(r => Option(r.get(0)))
    assert(down.last.contains(0.0))
  }

  test("RSI stays within [0, 100] when defined") {
    val vals = Seq(5.0, 7.0, 6.0, 6.5, 8.0, 7.5, 7.7, 9.0, 8.2, 8.8,
      9.5, 9.1, 10.0, 9.7, 10.2, 11.0, 10.5, 10.8, 11.5, 11.2)
    val out = Indicators.rsi(series(vals: _*))
      .select("rsi").collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(out.nonEmpty && out.forall(v => v >= 0.0 && v <= 100.0))
  }

  test("signal: BUY when SMA above value, SELL when below, HOLD when gated") {
    val out = Indicators.signal(series(10, 10, 10, 10, 50, 1))
      .orderBy("event_id").select("signal").collect().map(_.getString(0))
    assert(out.take(4).forall(_ == "HOLD")) // < 5 rows in frame
    assert(out(4) == "SELL") // sma 18 < value 50
    assert(out(5) == "BUY")  // sma 16.2 > value 1
  }

  test("lastRow picks the latest row per series key") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, ts(1), "a", 1.0), (2L, ts(2), "a", 2.0),
      (3L, ts(1), "b", 3.0)).toDF("event_id", "ts", "event_type", "value")
    val out = Indicators.lastRow(df).orderBy("event_type")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 3L))
  }

  // Spark `round` is HALF_UP, not rint's half-even
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ema matches a local adjust=False fold over the bounded lookback") {
    val vals = Seq(10.0, 12.0, 9.5, 11.0, 14.0, 13.5, 12.2, 15.0)
    val n = 3 // lookback 9 rows > series length: full-history fold
    val alpha = 2.0 / (n + 1)
    val expected = vals.indices.map { i =>
      val w = vals.take(i + 1)
      round6(w.tail.foldLeft(w.head)((acc, v) => alpha * v + (1 - alpha) * acc))
    }
    val out = Indicators.ema(series(vals: _*), n).orderBy("event_id")
      .select("ema").collect().map(_.getDouble(0)).toSeq
    assert(out == expected, s"$out vs $expected")
  }

  test("ema lookback truncation: only the trailing 3n rows enter the fold") {
    val n = 2 // lookback 6
    val vals = (1 to 10).map(_.toDouble)
    val alpha = 2.0 / (n + 1)
    val last = {
      val w = vals.takeRight(3 * n)
      round6(w.tail.foldLeft(w.head)((acc, v) => alpha * v + (1 - alpha) * acc))
    }
    val out = Indicators.ema(series(vals: _*), n).orderBy("event_id")
      .select("ema").collect().map(_.getDouble(0))
    assert(out.last == last)
  }

  test("bollinger: gated until n rows, bands bracket the mid, %B in band") {
    val vals = Seq(10.0, 11.0, 9.0, 10.5, 10.0, 9.5)
    val out = Indicators.bollinger(series(vals: _*), n = 5)
      .orderBy("event_id")
      .select("bb_mid", "bb_upper", "bb_lower", "pct_b").collect()
    assert((0 until 4).forall(i => out(i).isNullAt(0)))
    (4 until 6).foreach { i =>
      val (mid, up, lo) = (out(i).getDouble(0), out(i).getDouble(1), out(i).getDouble(2))
      assert(lo < mid && mid < up)
      val b = out(i).getDouble(3)
      assert(b >= 0.0 && b <= 1.0) // these values sit inside the band
    }
  }

  test("macd: flat series gives zero macd/signal/histogram once settled") {
    val out = Indicators.macd(series(Seq.fill(30)(42.0): _*))
      .orderBy("event_id")
      .select("macd", "signal_line", "histogram").collect()
    out.foreach { r =>
      assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    }
  }

  test("rollingCorr: +1 on comoving series, -1 on opposing, gated below n") {
    val sp = spark
    import sp.implicits._
    // one click and one view per minute; x climbs 1, 2, 3...
    def mk(yOf: Int => Double) = (0 until 8).flatMap { i =>
      Seq((i * 2L, ts(i), "click", (i + 1).toDouble),
        (i * 2 + 1L, ts(i), "view", yOf(i)))
    }.toDF("event_id", "ts", "event_type", "value")
    val up = Indicators.rollingCorr(mk(i => 10.0 + 2 * i), n = 5)
      .orderBy("minute").collect()
    assert(up.take(4).forall(_.isNullAt(4)), "gated until 5 minutes")
    assert(up.drop(4).forall(_.getDouble(4) == 1.0))
    val down = Indicators.rollingCorr(mk(i => 10.0 - 2 * i), n = 5)
      .orderBy("minute").collect()
    assert(down.drop(4).forall(_.getDouble(4) == -1.0))
    // zero variance on y => zero denominator => null, not NaN
    val flat = Indicators.rollingCorr(mk(_ => 10.0), n = 5)
      .orderBy("minute").collect()
    assert(flat.forall(_.isNullAt(4)))
  }

  test("rollingCorr: bucket-and-carry output equals the sequential definition across weeks") {
    val sp = spark
    import sp.implicits._
    // rowsPerBucket=15: frames straddle one boundary; rowsPerBucket=2:
    // SPARSE series, the n=5 lookback must span several week buckets
    for (rowsPerBucket <- Seq(15, 2)) {
      val mins = 0 until 40
      def minuteTs(i: Int) =
        java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
          .plusDays((i / rowsPerBucket) * 7L).plusMinutes(i % rowsPerBucket))
      val xs = mins.map(i => 1.0 + 0.37 * i + (i % 7))
      val ys = mins.map(i => 5.0 - 0.21 * i + ((i * 3) % 5))
      val df = mins.flatMap { i =>
        Seq((i * 2L, minuteTs(i), "click", xs(i)), (i * 2 + 1L, minuteTs(i), "view", ys(i)))
      }.toDF("event_id", "ts", "event_type", "value")
      val n = 5
      val out = Indicators.rollingCorr(df, n).orderBy("minute").collect()
      assert(out.length == mins.length)
      for (i <- mins) {
        val r = out(i)
        assert(r.getLong(3) == math.min(i + 1, n), s"n_obs at $i (rpb=$rowsPerBucket)")
        if (i + 1 < n) assert(r.isNullAt(4), s"gated at $i (rpb=$rowsPerBucket)")
        else {
          val fx = xs.slice(i - n + 1, i + 1)
          val fy = ys.slice(i - n + 1, i + 1)
          val c = n.toDouble
          val (sx, sy) = (fx.sum, fy.sum)
          val sxy = fx.zip(fy).map { case (a, b) => a * b }.sum
          val den = math.sqrt(math.max(c * fx.map(v => v * v).sum - sx * sx, 0.0)) *
            math.sqrt(math.max(c * fy.map(v => v * v).sum - sy * sy, 0.0))
          val want = BigDecimal((c * sxy - sx * sy) / den)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getDouble(4) - want) < 1e-9, s"corr at $i (rpb=$rowsPerBucket)")
        }
      }
    }
  }

  test("rollingCorr plans NO unpartitioned corpus-scale window") {
    val sp = spark
    import sp.implicits._
    val df = (0 until 10).flatMap { i =>
      Seq((i * 2L, ts(i), "click", i.toDouble), (i * 2 + 1L, ts(i), "view", i * 2.0))
    }.toDF("event_id", "ts", "event_type", "value")
    val plan = Indicators.rollingCorr(df).queryExecution.executedPlan.toString
    // no window may order the corpus-scale minute stream without a
    // partition key: an unpartitioned ORDER BY minute window would show
    // as windowspecdefinition(minute#..., ...) with no leading partition
    // column (the carry ranking partitions by target, the co-moment
    // frames by bucket; both are fine)
    assert(plan.contains("windowspecdefinition("), s"expected windows in:\n$plan")
    assert(!plan.contains("windowspecdefinition(minute"),
      s"unpartitioned corpus-scale window found:\n$plan")
  }

  test("smaPartitioned carries the lookback across an EMPTY week bucket") {
    val s = spark
    import s.implicits._
    // weeks of 2024-01-01 and 2024-01-15, nothing in between: the
    // second bucket's first frames must still see the first bucket's
    // trailing rows, exactly like the sequential window
    val rows = (0 until 6).map(i =>
      (i.toLong, Timestamp.valueOf(s"2024-01-01 0$i:00:00"), "x", i * 10.0)) ++
      (0 until 3).map(i =>
        (10L + i, Timestamp.valueOf(s"2024-01-15 0$i:00:00"), "x", 100.0 + i))
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    val part = Indicators.smaPartitioned(df).orderBy("ts", "event_id")
      .select("event_id", "sma").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val seq = Indicators.sma(df).orderBy("ts", "event_id")
      .select("event_id", "sma").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(part == seq, s"partitioned SMA diverged: $part vs $seq")
    // the gap-jumping carry actually produced values, not nulls
    assert(part(10L).nonEmpty && part(12L).nonEmpty)
  }

  test("resample and cohort plans stay join-safe: no cartesian, no nested-loop") {
    val s = spark
    import s.implicits._
    val rows = (0 until 20).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i % 10}%02d:00"), (i % 3).toLong, "x", i * 1.0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    for ((name, plan) <- Seq(
      "resampleFfill" -> Indicators.resampleFfill(df.drop("user_id")),
      "resampleInterp" -> Indicators.resampleInterp(df.drop("user_id")),
      "cohortRetention" -> Indicators.cohortRetention(df))) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name plan degenerated:\n$p")
    }
  }

  test("cohortRetention: offsets count distinct actives against the first-seen cohort") {
    val s = spark
    import s.implicits._
    // users 1,2 first seen week of Jan 1 (Mon); user 1 returns next week
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-02 10:00:00"), 1L),
      (2L, Timestamp.valueOf("2024-01-03 10:00:00"), 2L),
      (3L, Timestamp.valueOf("2024-01-02 11:00:00"), 1L), // same week again
      (4L, Timestamp.valueOf("2024-01-09 10:00:00"), 1L)) // next week
      .map { case (id, t, u) => (id, t, u, "click", 1.0) }
    val out = Indicators.cohortRetention(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5)))
  }

  test("resampleInterp: gap minutes blend linearly between the neighboring closes") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:30"), "x", 12.0),
      (2L, Timestamp.valueOf("2024-01-01 00:03:00"), "x", 18.0))
    val out = Indicators.resampleInterp(rows.toDF("event_id", "ts", "event_type", "value"))
      .orderBy("minute").collect()
      .map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq((12.0, false), (14.0, true), (16.0, true), (18.0, false)))
  }

  test("resampleFfill: gaps synthesize forward-filled minutes; close is the last tick") {
    val s = spark
    import s.implicits._
    // minute 0 has two ticks (close = the later, 12.0); minutes 1-2 are
    // a GAP; minute 3 trades again
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:10"), "x", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 00:00:50"), "x", 12.0),
      (3L, Timestamp.valueOf("2024-01-01 00:03:00"), "x", 20.0))
    val out = Indicators.resampleFfill(rows.toDF("event_id", "ts", "event_type", "value"))
      .orderBy("minute").collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 12.0, false),
      ("2024-01-01 00:01:00.0", 12.0, true),
      ("2024-01-01 00:02:00.0", 12.0, true),
      ("2024-01-01 00:03:00.0", 20.0, false)))
  }
}
