package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Remaining source/sink surface from SURVEY §2.1: CSV export (S14),
  * SQL-view CTAS materialization (S13, with GROUP BY / ORDER BY
  * ordinals A7/O2), raw-parquet directory scan (S11), and the
  * recency-limited scan (O3 — the dashboard's "newest 20 fragments"
  * cap, expressed as the row-level recency limit it approximates).
  *
  * The write-side queries round-trip through a real on-disk sink and
  * read the result back, so the driver's oracle actually checks the
  * sink encode/decode (CSV loses types ⇒ explicit schema on re-read —
  * same contract a lakehouse export/import pair has at scale).
  */
object Sinks {

  /** S14: CSV export + re-read (header, explicit schema on the way in). */
  def csvRoundtrip(spark: SparkSession, orders: DataFrame): DataFrame = {
    val out = Files.createTempDirectory("graft_csv").toString + "/orders_summary"
    val summary = orders.groupBy(col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
    summary.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
    spark.read.option("header", "true")
      .schema("o_orderstatus STRING, total DOUBLE, n BIGINT")
      .csv(out)
  }

  val csvRoundtripOracle: String =
    """SELECT o_orderstatus, round(sum(o_totalprice), 2) AS total, count(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** S13 + A7 + O2: temp-view CTAS with ordinal group-by/order-by via
    * the SQL entry point (spark.sql), materialized and re-read.
    */
  def sqlViewRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    val out = Files.createTempDirectory("graft_ctas").toString + "/flag_rollup"
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem_v
        |GROUP BY 1, 2
        |ORDER BY 2 DESC, 1""".stripMargin)
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  val sqlViewRollupOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY 2 DESC, 1""".stripMargin

  /** O3/S11: recency-limited scan — newest N rows by event time (the
    * transactional replacement for the reference's "newest 20 parquet
    * fragments" file-level cap; at scale this is a date-partition prune
    * + per-partition top-k, not a full sort).
    */
  def recentEvents(events: DataFrame, n: Int = 100): DataFrame =
    events.orderBy(col("ts").desc, col("event_id"))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .limit(n)

  def recentEventsOracle(n: Int = 100): String =
    s"""SELECT event_id, ts, event_type, value
       |FROM events
       |ORDER BY ts DESC, event_id
       |LIMIT $n""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_roundtrip" -> ((s, d) => csvRoundtrip(s, Tables.orders(s, d))),
    "q_sql_view_rollup" -> ((s, d) => sqlViewRollup(s, d)),
    "q_recent_events" -> ((s, d) => recentEvents(Tables.events(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_csv_roundtrip" -> csvRoundtripOracle,
    "q_sql_view_rollup" -> sqlViewRollupOracle,
    "q_recent_events" -> recentEventsOracle()
  )
}
