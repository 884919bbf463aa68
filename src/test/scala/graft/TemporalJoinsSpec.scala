package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.relational.TemporalJoins

/** As-of join edge semantics: no-match nulls, at-or-before inclusivity,
  * latest-wins, per-key isolation.
  */
class TemporalJoinsSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def events(rows: (Long, Timestamp, Long, String, Double)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("as-of: picks latest purchase at-or-before each click, null when none") {
    val df = events(
      (1L, ts(5), 1L, "click", 0.1),     // before any purchase -> null
      (2L, ts(10), 1L, "purchase", 100), // p1
      (3L, ts(11), 1L, "click", 0.2),    // -> p1
      (4L, ts(20), 1L, "purchase", 200), // p2
      (5L, ts(20), 1L, "click", 0.3),    // equal ts -> p2 (at-or-before)
      (6L, ts(30), 1L, "click", 0.4),    // -> p2 (latest wins)
      (7L, ts(31), 2L, "click", 0.5))    // other user, no purchases -> null
    val out = TemporalJoins.asofClickPurchase(df)
      .orderBy("event_id").collect()
    def pv(i: Int) = Option(out(i).get(5)).map(_.asInstanceOf[Double])
    assert(pv(0).isEmpty)
    assert(pv(1).contains(100.0) && out(1).getTimestamp(4) == ts(10))
    assert(pv(2).contains(200.0))
    assert(pv(3).contains(200.0) && out(3).getTimestamp(4) == ts(20))
    assert(pv(4).isEmpty)
  }

  test("as-of: duplicate purchases at one instant dedupe to max value") {
    val df = events(
      (1L, ts(1), 1L, "purchase", 5.0),
      (2L, ts(1), 1L, "purchase", 9.0),
      (3L, ts(2), 1L, "click", 0.0))
    val out = TemporalJoins.asofClickPurchase(df).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(5) == 9.0)
  }

  test("native as-of exec: same edge semantics as the composed form") {
    val df = events(
      (1L, ts(5), 1L, "click", 0.1),
      (2L, ts(10), 1L, "purchase", 100),
      (3L, ts(11), 1L, "click", 0.2),
      (4L, ts(20), 1L, "purchase", 200),
      (5L, ts(20), 1L, "click", 0.3),
      (6L, ts(30), 1L, "click", 0.4),
      (7L, ts(31), 2L, "click", 0.5))
    val out = TemporalJoins.asofNative(df).orderBy("event_id").collect()
    def pv(i: Int) = Option(out(i).get(5)).map(_.asInstanceOf[Double])
    assert(pv(0).isEmpty)
    assert(pv(1).contains(100.0) && out(1).getTimestamp(4) == ts(10))
    assert(pv(2).contains(200.0))
    assert(pv(3).contains(200.0) && out(3).getTimestamp(4) == ts(20))
    assert(pv(4).isEmpty)
  }

  test("native as-of exec: parity with the composed form on a random mix") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i.toLong, ts(rnd.nextInt(59)), rnd.nextInt(8).toLong,
        if (rnd.nextBoolean()) "click" else "purchase", rnd.nextInt(1000) / 10.0)
    }
    val df = events(rows: _*)
    val native = TemporalJoins.asofNative(df)
      .collect().map(_.toSeq).toSet
    val composed = TemporalJoins.asofClickPurchase(df)
      .withColumnRenamed("purchase_value", "pv").collect().map(_.toSeq).toSet
    // same column arity/order by construction; compare as row sets
    assert(native == composed)
  }

  test("native as-of exec: null join keys never match") {
    val sp = spark
    import sp.implicits._
    val left = Seq((Some(1L), ts(10), 1L), (Option.empty[Long], ts(10), 2L))
      .toDF("k", "ts", "event_id")
    val right = Seq((Some(1L), ts(5), 50.0), (Option.empty[Long], ts(5), 99.0))
      .toDF("rk", "rts", "payload")
    val out = graft.plans.AsOfJoinOp.asof(left, right, "k", "rk", "ts", "rts")
      .orderBy("event_id").collect()
    assert(out(0).getDouble(5) == 50.0)   // non-null key matches
    assert(out(1).isNullAt(5))            // null key: no match, null-extended
  }

  test("native as-of exec: NULL times never match (either side)") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, Some(ts(10)), 1L), (1L, Option.empty[Timestamp], 2L))
      .toDF("k", "ts", "event_id")
    val right = Seq((1L, Some(ts(5)), 50.0), (1L, Option.empty[Timestamp], 99.0))
      .toDF("rk", "rts", "payload")
    val out = graft.plans.AsOfJoinOp.asof(left, right, "k", "rk", "ts", "rts")
      .orderBy("event_id").collect()
    assert(out(0).getDouble(5) == 50.0, "null-time right row must not be the candidate")
    assert(out(1).isNullAt(5), "null-time left row matches nothing")
  }

  test("native as-of exec: mismatched key/time types fail fast") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1, ts(1), 1L)).toDF("k", "ts", "event_id") // int key
    val right = Seq((1L, ts(0), 5.0)).toDF("rk", "rts", "payload") // long key
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinOp.asof(left, right, "k", "rk", "ts", "rts")
    }
    assert(e.getMessage.contains("key types differ"))
    val badTime = Seq((1L, 1.5, 1L)).toDF("k", "ts", "event_id") // double time
    val right2 = Seq((1L, 0.5, 5.0)).toDF("rk", "rts", "payload")
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinOp.asof(badTime, right2, "k", "rk", "ts", "rts")
    }
    assert(e2.getMessage.contains("time columns"))
  }

  test("native as-of exec: duplicate column names on one side fail fast, not first-match") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, ts(1), 1L)).toDF("k", "ts", "event_id")
    val dupLeft = left.select(col("k"), col("ts"), col("event_id"), col("event_id").as("k"))
    val right = Seq((1L, ts(0), 5.0)).toDF("rk", "rts", "payload")
    val e = intercept[RuntimeException] {
      graft.plans.AsOfJoinOp.asof(dupLeft, right, "k", "rk", "ts", "rts")
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("native as-of exec: plans as AsOfJoin with one exchange+sort per side") {
    val df = events((1L, ts(1), 1L, "click", 1.0), (2L, ts(0), 1L, "purchase", 2.0))
    val plan = TemporalJoins.asofNative(df).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 3, plan)
    // 2 join-side exchanges + 1 from the right-side pre-aggregation
  }

  test("funnel: converts iff the FIRST following purchase is inside the horizon") {
    val df = events(
      (1L, ts(0), 1L, "click", 0.0),     // first purchase at +10m -> converted
      (2L, ts(10), 1L, "purchase", 1.0),
      (3L, ts(15), 1L, "click", 0.0),    // next purchase at +45m > 30m -> not
      (4L, ts(58), 1L, "purchase", 1.0), // wait: 58-15=43m
      (5L, ts(5), 2L, "click", 0.0))     // no purchases at all -> not
    val out = TemporalJoins.funnel(df, horizonMin = 30)
      .orderBy("user_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 1)
    assert(out(0).getDouble(3) == 0.5)
    assert(out(1).getLong(1) == 1 && out(1).getLong(2) == 0 && out(1).getDouble(3) == 0.0)
  }

  test("range join: every event lands in exactly one session interval") {
    val df = events(
      (1L, ts(0), 1L, "click", 1.0), (2L, ts(10), 1L, "click", 1.0),
      (3L, ts(55), 1L, "click", 1.0)) // > 30m gap -> second session
    val out = TemporalJoins.eventSessionRange(df)
      .orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 2L && out(0).getLong(3) == 2L) // n_events == n_matched
    assert(out(1).getLong(2) == 1L && out(1).getLong(3) == 1L)
  }
}
