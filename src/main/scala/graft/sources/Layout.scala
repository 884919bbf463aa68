package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Physical-layout operators — the 100 TB story made concrete at test
  * scale: date-partitioned writes with partition pruning, and bucketed
  * tables giving shuffle-free co-located joins.
  *
  * At 100 TB these two layouts are THE difference between scanning a
  * day and scanning a lake, and between a one-Exchange join and a
  * two-Exchange join; the queries below let the driver's oracle verify
  * the results stay correct under re-layout, and `.explain` shows
  * `PartitionFilters` / absent `Exchange` respectively.
  */
object Layout {

  private val prepared = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Write events date-partitioned once per sf dir (the bronze table's
    * production layout: `partitionBy(event_date)`).
    */
  private def partitionedEventsPath(spark: SparkSession, dir: String): String =
    prepared.getOrElseUpdate(s"part:$dir", {
      val out = graft.Scratch.dir("graft_part_events").toString
      Tables.events(spark, dir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      out
    })

  /** Partition pruning: filter on the partition column must prune the
    * scan to one directory (explain: PartitionFilters, one partition).
    */
  def partitionPruned(spark: SparkSession, dir: String): DataFrame = {
    val path = partitionedEventsPath(spark, dir)
    spark.read.parquet(path)
      .filter(col("event_date") === lit("2024-01-15"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("day_value"), count(lit(1)).as("n"))
  }

  val partitionPrunedOracle: String =
    """SELECT event_type, round(sum(value), 2) AS day_value, count(*) AS n
      |FROM events
      |WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      |GROUP BY 1""".stripMargin

  /** Bucketed join: orders and lineitem bucketed 8 ways on the join key
    * (datasource bucketing, external-table paths). Both sides arrive
    * pre-partitioned — the join plans with ZERO shuffle Exchanges.
    */
  private def bucketedTables(spark: SparkSession, dir: String): (String, String) = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val (to, tl) = (s"orders_b_$suffix", s"lineitem_b_$suffix")
    prepared.getOrElseUpdate(s"bucket:$dir", {
      val base = graft.Scratch.dir("graft_bucketed").toString
      Tables.orders(spark, dir).write.mode("overwrite")
        .option("path", s"$base/$to")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
      Tables.lineitem(spark, dir).write.mode("overwrite")
        .option("path", s"$base/$tl")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
      base
    })
    (to, tl)
  }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (to, tl) = bucketedTables(spark, dir)
    spark.table(tl).hint("merge") // force SMJ so bucketing (not a small-SF broadcast) carries the join
      .join(spark.table(to), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val bucketedJoinOracle: String =
    """SELECT o_orderstatus,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Small-file compaction — the lakehouse maintenance operator every
    * streaming ingest needs: a micro-batch sink leaves N-per-trigger
    * small files; compaction rewrites a partition's fragments into few
    * right-sized files (here: repartition(2) on a copy fragmented into
    * 64 pieces). Values must survive the rewrite byte-identically —
    * that is what the oracle checks; the spec checks the file counts.
    * At 100 TB this runs per partition-directory, driven off file-size
    * stats, never as one global job.
    */
  def compactedPath(spark: SparkSession, dir: String): String =
    prepared.getOrElseUpdate(s"compact:$dir", {
      val frag = graft.Scratch.dir("graft_frag").toString
      val out = graft.Scratch.dir("graft_compact").toString
      Tables.events(spark, dir).repartition(64).write.mode("overwrite").parquet(frag)
      spark.read.parquet(frag).repartition(2).write.mode("overwrite").parquet(out)
      out
    })

  def compactionQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(compactedPath(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        countDistinct(col("event_id")).as("n_ids"))

  val compactionOracle: String =
    """SELECT event_type, count(*) AS n,
      |       round(sum(value), 2) AS total_value,
      |       count(DISTINCT event_id) AS n_ids
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Z-order (Morton) clustering — multi-dimensional data skipping, the
    * layout move behind Delta/Iceberg `OPTIMIZE ZORDER BY`. A single
    * sort key can prune scans on ONE column; interleaving the bits of
    * two columns into a Morton code gives a 1-D key whose contiguous
    * ranges are compact 2-D tiles, so files written in z-key ranges
    * carry TIGHT min/max stats on BOTH dimensions and a 2-D box
    * predicate skips most files.
    *
    * Here: orders z-ordered on (o_custkey, days(o_orderdate)), 12 bits
    * each → 24-bit z-value; `file_id = z >> 17` models fixed-width
    * z-range files (at scale: `repartitionByRange(zv)` +
    * `sortWithinPartitions(zv)` + write, and the parquet footer min/max
    * do the skipping natively — a map-only derivation, no global sort).
    * Output is the per-file stats table a scan planner would consult,
    * with `hit` = whether the file survives the box predicate
    * custkey∈[100,199] × days-since-1995∈[365,729] (1996-01-01 through
    * 1996-12-30); the spec asserts most files DON'T (the locality win),
    * the oracle asserts the stats are exact.
    */
  private[sources] val zbits = 12

  private[sources] def zval(x: Column, y: Column): Column =
    (0 until zbits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  def zorderStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("bigint").as("y"))
      .withColumn("file_id", shiftright(zval(col("x"), col("y")), 17))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("hit",
        when(col("x_max") >= 100 && col("x_min") <= 199 &&
          col("y_max") >= 365 && col("y_min") <= 729, lit(1)).otherwise(lit(0)))

  val zorderStatsOracle: String = {
    val terms = (0 until zbits).map(i =>
      s"(((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i})").mkString(" + ")
    s"""WITH z AS (
       |  SELECT o_custkey AS x,
       |         (o_orderdate::DATE - DATE '1995-01-01')::BIGINT AS y
       |  FROM orders
       |)
       |SELECT file_id, count(*) AS n,
       |       min(x) AS x_min, max(x) AS x_max,
       |       min(y) AS y_min, max(y) AS y_max,
       |       CASE WHEN max(x) >= 100 AND min(x) <= 199
       |             AND max(y) >= 365 AND min(y) <= 729 THEN 1 ELSE 0 END AS hit
       |FROM (SELECT *, ($terms) >> 17 AS file_id FROM z)
       |GROUP BY 1""".stripMargin
  }

  /** Materialize the layouts (idempotent). Called by the bench warmup:
    * building the physical layout is ETL cost, not query cost.
    */
  def prepare(spark: SparkSession, dir: String): Unit = {
    partitionedEventsPath(spark, dir)
    bucketedTables(spark, dir)
    compactedPath(spark, dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_prune" -> partitionPruned _,
    "q_bucketed_join" -> bucketedJoin _,
    "q_compaction" -> compactionQuery _,
    "q_zorder_layout" -> zorderStats _
  )

  def oracles: Map[String, String] = Map(
    "q_partition_prune" -> partitionPrunedOracle,
    "q_bucketed_join" -> bucketedJoinOracle,
    "q_compaction" -> compactionOracle,
    "q_zorder_layout" -> zorderStatsOracle
  )
}
