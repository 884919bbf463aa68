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
    val out = graft.Scratch.dir("graft_csv").toString + "/orders_summary"
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

  /** ORC export + re-read: the other mainstream columnar format a
    * lakehouse must speak (same pushdown/pruning contract as parquet —
    * ORC carries its own schema, so no explicit re-read schema needed).
    */
  def orcRoundtrip(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    val out = graft.Scratch.dir("graft_orc").toString + "/ship_summary"
    val summary = lineitem.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total"), count(lit(1)).as("n"))
    summary.write.mode("overwrite").orc(out)
    spark.read.orc(out)
  }

  val orcRoundtripOracle: String =
    """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS total, count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** JSON-lines export + schema'd re-read: the interchange format of the
    * ingest boundary (every row a standalone JSON object — the file-sink
    * twin of the Kafka-value `to_json` serialization in Bronze).
    */
  def jsonLinesRoundtrip(spark: SparkSession, customer: DataFrame): DataFrame = {
    val out = graft.Scratch.dir("graft_jsonl").toString + "/segment_summary"
    val summary = customer.groupBy(col("c_mktsegment"))
      .agg(round(avg(col("c_acctbal")), 6).as("avg_bal"), count(lit(1)).as("n"))
    summary.write.mode("overwrite").json(out)
    spark.read.schema("c_mktsegment STRING, avg_bal DOUBLE, n BIGINT").json(out)
  }

  val jsonLinesRoundtripOracle: String =
    """SELECT c_mktsegment, round(avg(c_acctbal), 6) AS avg_bal, count(*) AS n
      |FROM customer GROUP BY 1""".stripMargin

  /** S13 + A7 + O2: temp-view CTAS with ordinal group-by/order-by via
    * the SQL entry point (spark.sql), materialized and re-read.
    */
  def sqlViewRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    val out = graft.Scratch.dir("graft_ctas").toString + "/flag_rollup"
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

  /** Schema evolution: two ingest generations land in the same table
    * directory — an old batch WITHOUT `user_id`, a new batch WITH it —
    * and a `mergeSchema` read unions the schemas (missing columns read
    * as null). This is the add-a-column evolution path a long-lived
    * lakehouse table goes through; at 100 TB the merged-footer schema
    * resolution is why new columns cost nothing retroactively.
    */
  def schemaEvolution(spark: SparkSession, events: DataFrame): DataFrame = {
    val out = graft.Scratch.dir("graft_evolve").toString + "/events_evolved"
    events.filter(pmod(col("event_id"), lit(2)) === 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(out)
    events.filter(pmod(col("event_id"), lit(2)) === 1)
      .select(col("event_id"), col("event_type"), col("value"), col("user_id"))
      .write.mode("append").parquet(out)
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        count(col("user_id")).as("n_with_user"))
  }

  val schemaEvolutionOracle: String =
    """SELECT event_type, count(*) AS n,
      |       round(sum(value), 2) AS total_value,
      |       count(user_id) AS n_with_user
      |FROM (
      |  SELECT event_type, value, NULL::BIGINT AS user_id
      |  FROM events WHERE event_id % 2 = 0
      |  UNION ALL
      |  SELECT event_type, value, user_id
      |  FROM events WHERE event_id % 2 = 1
      |)
      |GROUP BY 1""".stripMargin

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

  /** Lakehouse upsert (MERGE INTO semantics without a Delta log):
    * updates = matched keys take the source row; inserts = unmatched
    * source keys append; untouched target rows pass through
    * (anti-join + union — the copy-on-write merge every table format
    * compiles MERGE into; with a date-partitioned target only the
    * touched partitions are rewritten). Here: 10% price raise for
    * custkey < 100 plus one synthetic new order, then a checksum agg
    * of the merged table.
    */
  def mergeUpsert(spark: SparkSession, orders: DataFrame): DataFrame = {
    val updates = orders.filter(col("o_custkey") < 100)
      .withColumn("o_totalprice", round(col("o_totalprice") * 1.1, 2))
    val inserts = orders.sparkSession.range(1).select(
      lit(999999999L).as("o_orderkey"), lit(1L).as("o_custkey"),
      lit("O").as("o_orderstatus"), lit(1234.56).as("o_totalprice"))
    val source = updates.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .unionByName(inserts)
    val target = orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val merged = target.join(source.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(source)
    merged.groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        max(col("o_orderkey")).as("max_key"))
  }

  val mergeUpsertOracle: String =
    """WITH source AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |         round(o_totalprice * 1.1, 2) AS o_totalprice
      |  FROM orders WHERE o_custkey < 100
      |  UNION ALL
      |  SELECT 999999999, 1, 'O', 1234.56
      |), merged AS (
      |  SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
      |  FROM orders o WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM source)
      |  UNION ALL
      |  SELECT * FROM source
      |)
      |SELECT o_orderstatus, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS total,
      |       max(o_orderkey) AS max_key
      |FROM merged
      |GROUP BY 1""".stripMargin

  /** CDC between two table states: full-outer join old vs new on the
    * key, classify each row insert / delete / update / unchanged —
    * the read-side audit of what a MERGE did (new state = the same
    * merged table `mergeUpsert` builds). At scale this is one shuffled
    * equi-join on the table key; with both sides bucketed by key it is
    * exchange-free.
    */
  def cdcDiff(spark: SparkSession, orders: DataFrame): DataFrame = {
    val target = orders.select(col("o_orderkey"), col("o_totalprice"))
    val updates = orders.filter(col("o_custkey") < 100)
      .withColumn("o_totalprice", round(col("o_totalprice") * 1.1, 2))
    val inserts = orders.sparkSession.range(1).select(
      lit(999999999L).as("o_orderkey"), lit(1L).as("o_custkey"),
      lit("O").as("o_orderstatus"), lit(1234.56).as("o_totalprice"))
    val source = updates.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .unionByName(inserts)
    val merged = orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .join(source.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(source)
      .select(col("o_orderkey"), col("o_totalprice").as("new_price"))
    target.join(merged, Seq("o_orderkey"), "full_outer")
      .withColumn("change_type",
        when(col("o_totalprice").isNull, "insert")
          .when(col("new_price").isNull, "delete")
          .when(col("new_price") =!= col("o_totalprice"), "update")
          .otherwise("unchanged"))
      .groupBy(col("change_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(coalesce(col("new_price"), lit(0.0)) -
          coalesce(col("o_totalprice"), lit(0.0))), 2).as("price_delta"))
  }

  val cdcDiffOracle: String =
    """WITH source AS (
      |  SELECT o_orderkey, round(o_totalprice * 1.1, 2) AS o_totalprice
      |  FROM orders WHERE o_custkey < 100
      |  UNION ALL
      |  SELECT 999999999, 1234.56
      |), merged AS (
      |  SELECT o.o_orderkey, o.o_totalprice
      |  FROM orders o WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM source)
      |  UNION ALL
      |  SELECT * FROM source
      |)
      |SELECT change_type, count(*) AS n,
      |       round(sum(coalesce(new_price, 0) - coalesce(o_totalprice, 0)), 2) AS price_delta
      |FROM (
      |  SELECT t.o_totalprice, m.new_price,
      |         CASE WHEN t.o_totalprice IS NULL THEN 'insert'
      |              WHEN m.new_price IS NULL THEN 'delete'
      |              WHEN m.new_price != t.o_totalprice THEN 'update'
      |              ELSE 'unchanged' END AS change_type
      |  FROM (SELECT o_orderkey, o_totalprice FROM orders) t
      |  FULL OUTER JOIN (SELECT o_orderkey, o_totalprice AS new_price FROM merged) m
      |    USING (o_orderkey)
      |)
      |GROUP BY 1""".stripMargin

  /** ANALYZE-style table profile in ONE aggregation pass: row count,
    * per-column null counts, exact distinct counts, numeric min/max/avg
    * — the statistics that drive pruning, join sizing, and data-quality
    * monitoring. Wide one-row output keeps every stat in its natural
    * type (no cross-engine string formatting).
    */
  def tableProfile(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("l_quantity"))).as("qty_nulls"),
      countDistinct(col("l_quantity")).as("qty_ndv"),
      min(col("l_quantity")).as("qty_min"),
      max(col("l_quantity")).as("qty_max"),
      round(avg(col("l_quantity")), 6).as("qty_avg"),
      countDistinct(col("l_returnflag")).as("flag_ndv"),
      min(col("l_extendedprice")).as("price_min"),
      max(col("l_extendedprice")).as("price_max"),
      round(avg(col("l_extendedprice")), 6).as("price_avg"),
      min(col("l_shipdate")).as("ship_min"),
      max(col("l_shipdate")).as("ship_max"))

  val tableProfileOracle: String =
    """SELECT count(*) AS n_rows,
      |       count(*) - count(l_quantity) AS qty_nulls,
      |       count(DISTINCT l_quantity) AS qty_ndv,
      |       min(l_quantity) AS qty_min,
      |       max(l_quantity) AS qty_max,
      |       round(avg(l_quantity), 6) AS qty_avg,
      |       count(DISTINCT l_returnflag) AS flag_ndv,
      |       min(l_extendedprice) AS price_min,
      |       max(l_extendedprice) AS price_max,
      |       round(avg(l_extendedprice), 6) AS price_avg,
      |       min(l_shipdate) AS ship_min,
      |       max(l_shipdate) AS ship_max
      |FROM lineitem""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_diff" -> ((s, d) => cdcDiff(s, Tables.orders(s, d))),
    "q_table_profile" -> ((s, d) => tableProfile(Tables.lineitem(s, d))),
    "q_merge_upsert" -> ((s, d) => mergeUpsert(s, Tables.orders(s, d))),
    "q_csv_roundtrip" -> ((s, d) => csvRoundtrip(s, Tables.orders(s, d))),
    "q_orc_roundtrip" -> ((s, d) => orcRoundtrip(s, Tables.lineitem(s, d))),
    "q_jsonl_roundtrip" -> ((s, d) => jsonLinesRoundtrip(s, Tables.customer(s, d))),
    "q_schema_evolution" -> ((s, d) => schemaEvolution(s, Tables.events(s, d))),
    "q_sql_view_rollup" -> ((s, d) => sqlViewRollup(s, d)),
    "q_recent_events" -> ((s, d) => recentEvents(Tables.events(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_cdc_diff" -> cdcDiffOracle,
    "q_table_profile" -> tableProfileOracle,
    "q_merge_upsert" -> mergeUpsertOracle,
    "q_csv_roundtrip" -> csvRoundtripOracle,
    "q_orc_roundtrip" -> orcRoundtripOracle,
    "q_jsonl_roundtrip" -> jsonLinesRoundtripOracle,
    "q_schema_evolution" -> schemaEvolutionOracle,
    "q_sql_view_rollup" -> sqlViewRollupOracle,
    "q_recent_events" -> recentEventsOracle()
  )
}
