package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal joins Spark has no native operator for — as-of and range —
  * built by composition (preference order (a) of the design brief:
  * compose before custom Catalyst), with DuckDB's native ASOF/IEJoin
  * as the oracle.
  *
  * Scale shapes:
  *  - AS-OF via union+window: tag both sides, one shuffle on the key,
  *    one ordered window pass carrying the latest right payload forward
  *    (`last(..., ignoreNulls)`). No range-condition join explosion, no
  *    per-row binary search — O(n log n) in the partition, the standard
  *    distributed as-of.
  *  - RANGE via interval bucketing: explode each interval to the coarse
  *    time buckets it covers, equi-join on (key, bucket), then filter
  *    the exact containment. Turns an inequality join (quadratic
  *    worst-case) into an equi-join sized by interval/bucket ratio.
  */
object TemporalJoins {

  /** As-of join: for each 'click' event, the user's most recent
    * 'purchase' at-or-before it (backward as-of, key = user_id).
    * Right side pre-deduped to one row per (user, ts) so ties are
    * deterministic in both engines.
    */
  def asofClickPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
    val tagged = clicks
      .withColumn("is_left", lit(true))
      .withColumn("p_value", lit(null).cast("double"))
      .withColumn("p_ts", lit(null).cast("timestamp"))
      .unionByName(purchases.select(
        col("user_id"), col("ts"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"),
        lit(false).as("is_left"),
        col("p_value"),
        col("ts").as("p_ts")))
    // right rows sort BEFORE left rows at equal ts => ts >= p_ts matches
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_p_value", last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("last_p_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("last_p_ts").as("purchase_ts"),
        col("last_p_value").as("purchase_value"))
  }

  val asofClickPurchaseOracle: String =
    """SELECT c.event_id, c.user_id, c.ts, c.value,
      |       p.ts AS purchase_ts, p.p_value AS purchase_value
      |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, max(value) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |) p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  /** The SAME as-of query through the native whole-operator path:
    * `plans.AsOfJoin` (custom LogicalPlan + SparkStrategy + sort-merge
    * SparkPlan, preference order (c)) instead of the union+window
    * composition above. Both are oracle-checked against DuckDB's
    * native ASOF LEFT JOIN; the native exec shuffles/sorts each side
    * alone and carries O(1) state per partition where the composed
    * form windows over the union.
    */
  def asofNative(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("purchase_value"))
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("purchase_value"))
    graft.plans.AsOfJoinOp
      .asof(clicks, purchases, "user_id", "p_user", "ts", "purchase_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("purchase_ts"), col("purchase_value"))
  }

  val asofNativeOracle: String =
    """SELECT c.event_id, c.user_id, c.ts, c.value,
      |       p.ts AS purchase_ts, p.purchase_value
      |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, max(value) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |) p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  /** Conversion funnel: per user, how many clicks convert to a purchase
    * within `horizonMin` minutes. The click→first-following-purchase
    * step is a FORWARD as-of join, obtained from the native backward
    * `AsOfJoin` operator by negating the time axis (latest −p_ts ≤
    * −c_ts ⟺ earliest p_ts ≥ c_ts) — one operator, both directions.
    * Same sort-merge scale shape as `q_asof_native`; the oracle spells
    * the forward pick as a min-over-inequality-join.
    */
  def funnel(events: DataFrame, horizonMin: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("neg_ts", -unix_micros(col("ts")))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts")).distinct()
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withColumn("p_neg_ts", -unix_micros(col("p_ts")))
    graft.plans.AsOfJoinOp
      .asof(clicks, purchases, "user_id", "p_user", "neg_ts", "p_neg_ts")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_clicks"),
        count(when(col("p_ts") <=
          col("ts") + expr(s"INTERVAL $horizonMin MINUTES"), 1)).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_clicks"), 6))
  }

  def funnelOracle(horizonMin: Int = 30): String =
    s"""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
       |p AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'),
       |firstp AS (
       |  SELECT c.event_id, c.user_id, c.ts, min(p.ts) AS p_ts
       |  FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
       |  GROUP BY 1, 2, 3
       |)
       |SELECT user_id, count(*) AS n_clicks,
       |       count(CASE WHEN p_ts <= ts + INTERVAL $horizonMin MINUTE THEN 1 END) AS n_converted,
       |       round(CAST(count(CASE WHEN p_ts <= ts + INTERVAL $horizonMin MINUTE THEN 1 END) AS DOUBLE)
       |             / count(*), 6) AS conv_rate
       |FROM firstp GROUP BY 1""".stripMargin

  /** Range join: each event labeled with its enclosing session interval
    * (sessions from SilverAgg; intervals never overlap per user, so
    * exactly one match). Implemented as interval-to-hour-bucket explode
    * + equi-join + exact containment filter.
    */
  def eventSessionRange(events: DataFrame): DataFrame = {
    val sessions = graft.silver.SilverAgg.sessions(events)
    val buckets = sessions.withColumn("bucket",
      explode(sequence(
        date_trunc("hour", col("session_start")),
        date_trunc("hour", col("session_end")),
        expr("INTERVAL 1 HOUR"))))
    val ev = events.select(col("event_id"), col("user_id").as("u"), col("ts"))
      .withColumn("bucket", date_trunc("hour", col("ts")))
    ev.join(buckets,
        col("u") === col("user_id") && ev("bucket") === buckets("bucket"))
      .filter(col("ts") >= col("session_start") && col("ts") < col("session_end"))
      .groupBy(col("user_id"), col("session_start"), col("n_events"))
      .agg(count(lit(1)).as("n_matched"))
  }

  val eventSessionRangeOracle: String =
    """WITH sessions AS (
      |  SELECT min(ts) AS session_start,
      |         max(ts) + INTERVAL 30 MINUTE AS session_end,
      |         user_id, count(*) AS n_events
      |  FROM (
      |    SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                               ROWS UNBOUNDED PRECEDING) AS sid
      |    FROM (
      |      SELECT user_id, ts,
      |             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
      |                  THEN 1 ELSE 0 END AS new_s
      |      FROM events
      |    )
      |  )
      |  GROUP BY user_id, sid
      |)
      |SELECT s.user_id, s.session_start, s.n_events, count(*) AS n_matched
      |FROM events e JOIN sessions s
      |  ON e.user_id = s.user_id
      | AND e.ts >= s.session_start AND e.ts < s.session_end
      |GROUP BY 1, 2, 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s, d) => asofClickPurchase(Tables.events(s, d))),
    "q_asof_native" -> ((s, d) => asofNative(Tables.events(s, d))),
    "q_funnel" -> ((s, d) => funnel(Tables.events(s, d))),
    "q_range_join" -> ((s, d) => eventSessionRange(Tables.events(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> asofClickPurchaseOracle,
    "q_asof_native" -> asofNativeOracle,
    "q_funnel" -> funnelOracle(),
    "q_range_join" -> eventSessionRangeOracle
  )
}
