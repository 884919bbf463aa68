package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** General relational capability over the driver's star schema: joins
  * (broadcast/shuffle, semi, anti), top-k, distinct, set ops, rollup,
  * filter pushdown.
  *
  * The reference itself contains zero joins (SURVEY §2.3) — this module is
  * the "general query surface" the rebuild ships so a lakehouse user can
  * run arbitrary analytics, and it is where the 100 TB design choices are
  * most visible:
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast — no shuffle of the fact table for star joins;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once,
  *    with AQE free to convert to broadcast when a filtered side shrinks;
  *  - aggregates ride map-side partial aggregation;
  *  - filters are literal predicates pushed into the parquet scan
  *    (verified via explain: PushedFilters).
  */
object StarQueries {

  /** TPC-H Q1-shaped pricing summary (scan → filter → agg, pushdown). */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val pricingSummaryOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  /** Revenue per market segment: broadcast dim ⋈ fact ⋈ fact chain. */
  def revenueBySegment(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  val revenueBySegmentOracle: String =
    """SELECT c_mktsegment,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Customers per region: 3-level broadcast dim chain. */
  def customersByRegion(region: DataFrame, nation: DataFrame, customer: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 6).as("avg_acctbal"))

  val customersByRegionOracle: String =
    """SELECT r_name, count(*) AS n_customers,
      |       round(avg(c_acctbal), 6) AS avg_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1""".stripMargin

  /** Left-semi: customers that have at least one order (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  val customersWithOrdersOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Left-anti: customers with no orders (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  val customersWithoutOrdersOracle: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Top-k with deterministic tie-break (TakeOrderedAndProject — no full
    * sort at scale: per-partition top-k then merge on the driver).
    */
  def topOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(k)

  def topOrdersOracle(k: Int = 10): String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice
       |FROM orders
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT $k""".stripMargin

  /** Distinct counts (exact). */
  def distinctCounts(orders: DataFrame): DataFrame =
    orders.agg(
      countDistinct(col("o_custkey")).as("n_buyers"),
      countDistinct(col("o_orderstatus")).as("n_statuses"),
      count(lit(1)).as("n_orders"))

  val distinctCountsOracle: String =
    """SELECT count(DISTINCT o_custkey) AS n_buyers,
      |       count(DISTINCT o_orderstatus) AS n_statuses,
      |       count(*) AS n_orders
      |FROM orders""".stripMargin

  /** Set operations: buyers (have orders) vs rich (acctbal > 5000).
    * All three counts from ONE full-outer join of the two key sets
    * (intersect = matched, except = left-only, union = all) — each
    * input scanned once, vs three scans per side for three separate
    * set-op branches. Unpivoted with `stack` to (op, n) rows.
    */
  def setOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val buyers = orders.select(col("o_custkey").as("custkey")).distinct()
      .withColumn("b", lit(1))
    val rich = customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey")).withColumn("r", lit(1))
    buyers.join(rich, Seq("custkey"), "full_outer")
      .agg(
        count(when(col("b").isNotNull && col("r").isNotNull, 1)).as("i"),
        count(when(col("b").isNotNull && col("r").isNull, 1)).as("e"),
        count(lit(1)).as("u"))
      .selectExpr("stack(3, 'intersect', i, 'except', e, 'union', u) AS (op, n)")
  }

  val setOpsOracle: String =
    """WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
      |     rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
      |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM buyers INTERSECT SELECT * FROM rich)
      |UNION ALL
      |SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM buyers EXCEPT SELECT * FROM rich)
      |UNION ALL
      |SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM buyers UNION SELECT * FROM rich)""".stripMargin

  /** UNION ALL (J1: multi-fragment concat) + group. */
  def unionAll(orders: DataFrame): DataFrame =
    orders.unionByName(orders)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))

  val unionAllOracle: String =
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders)
      |GROUP BY 1""".stripMargin

  /** Ranking window functions: top-3 orders per customer. */
  def topOrdersPerCustomer(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .filter(col("rn") <= 3)
  }

  val topOrdersPerCustomerOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       row_number() OVER w AS rn, rank() OVER w AS rnk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |QUALIFY row_number() OVER w <= 3""".stripMargin

  /** Analytic-function suite: the ranking/distribution window functions
    * beyond row_number/rank — ntile buckets, percent_rank, cume_dist,
    * dense_rank, nth_value, first/last in frame — over a fully
    * deterministic ordering (totalprice desc, orderkey). One window,
    * one shuffle; all functions share the same sort.
    */
  def analyticSuite(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders.select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("drank", dense_rank().over(w))
      .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(wf))
      .withColumn("top_price", first(col("o_totalprice")).over(wf))
  }

  val analyticSuiteOracle: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |       ntile(4) OVER w AS quartile,
      |       round(percent_rank() OVER w, 6) AS pct_rank,
      |       round(cume_dist() OVER w, 6) AS cume,
      |       dense_rank() OVER w AS drank,
      |       nth_value(o_totalprice, 3) OVER wf AS third_price,
      |       first_value(o_totalprice) OVER wf AS top_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey),
      |       wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** ROLLUP grouping sets over lineitem flags. */
  def flagRollup(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  val flagRollupOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE grouping sets (all 4 combinations of the two flags). */
  def flagCube(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  val flagCubeOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * per-flag totals, per-status totals, and the grand total — without
    * the cross combinations cube would add. One shuffle; Spark expands
    * the sets with a single Expand node before the aggregation.
    */
  def flagGroupingSets(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  val flagGroupingSetsOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  /** Filter + projection pushdown showcase (P3 shape). */
  def filteredRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1995-01-01 00:00:00'") &&
        col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice")), 2).as("filtered_revenue"),
        count(lit(1)).as("n"))

  val filteredRevenueOracle: String =
    """SELECT l_returnflag,
      |       round(sum(l_extendedprice), 2) AS filtered_revenue,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_quantity > 10
      |GROUP BY 1""".stripMargin

  /** Skew-mitigating two-phase (salted) aggregation: the grouping key
    * has only a handful of hot values (event_type ≈ 5), so a naive
    * groupBy sends each key to ONE reducer. Salting fans each key over
    * 16 partial groups, combines, then merges — the standard recipe
    * when one key dominates a 100 TB shuffle. (Spark's map-side partial
    * agg already does this implicitly for algebraic aggs; the explicit
    * form is the template for aggs where it can't, e.g. collect-like.)
    */
  def saltedAgg(events: DataFrame, salts: Int = 16): DataFrame =
    events
      .groupBy(col("event_type"), pmod(col("event_id"), lit(salts)).as("salt"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("s")), 2).as("total_value"),
        sum(col("c")).as("n"))

  val saltedAggOracle: String =
    """SELECT event_type, round(sum(value), 2) AS total_value, count(*) AS n
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Skew-mitigating SALTED JOIN template: when one join key dominates
    * (here event_type, ~5 hot values over the whole fact table), a
    * plain shuffle join sends each hot key to ONE reducer. Salting
    * splits the fact side into S sub-keys (deterministic pmod of a row
    * id — reproducible, unlike rand()) and replicates the dim side S
    * ways, so each hot key fans over S reducers. Result is identical to
    * the unsalted join — the oracle checks the plain join. (AQE's
    * skew-split handles sort-merge cases automatically; the explicit
    * form is the template for when it can't, e.g. aggregating joins.)
    */
  def saltedJoin(events: DataFrame, salts: Int = 16): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // tiny dim: per-event-type weight (stand-in for a config/rate table)
    val dim = Seq(("click", 1.0), ("view", 0.1), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0)).toDF("event_type", "weight")
    val saltedFact = events.withColumn("salt", pmod(col("event_id"), lit(salts)))
    val saltedDim = dim.withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("value") * col("weight")), 2).as("weighted_value"),
        count(lit(1)).as("n"))
  }

  val saltedJoinOracle: String =
    """SELECT event_type,
      |       round(sum(value * weight), 2) AS weighted_value,
      |       count(*) AS n
      |FROM events
      |JOIN (VALUES ('click', 1.0), ('view', 0.1), ('purchase', 10.0),
      |             ('signup', 5.0), ('error', 0.0)) AS dim(event_type, weight)
      |USING (event_type)
      |GROUP BY 1""".stripMargin

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`) — the distribution profile a data pipeline reports.
    */
  def pricePercentiles(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))

  val pricePercentilesOracle: String =
    """SELECT o_orderstatus,
      |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      |FROM orders
      |GROUP BY 1""".stripMargin

  /** Column profiling — the per-column stats report (null count,
    * distinct count, range, mean) a lakehouse data-quality gate runs
    * over every landed table. ONE scan: every per-column aggregate
    * computes in a single `agg` (the distinct counts share one Expand
    * + shuffle), and the wide one-row result is exploded into the
    * long (col_name, stats) report shape — no per-column re-scan, no
    * driver-side loop over columns.
    */
  def profileStats(lineitem: DataFrame,
      cols: Seq[String] = profileCols): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"),
        avg(col(c)).as(s"${c}_avg"))
    }
    lineitem.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          (col("n_rows") - col(s"${c}_nn")).cast("bigint").as("n_null"),
          col(s"${c}_nd").cast("bigint").as("n_distinct"),
          col(s"${c}_min").as("min_v"),
          col(s"${c}_max").as("max_v"),
          round(col(s"${c}_avg"), 6).as("avg_v"))
      }: _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("n_rows"),
        col("s.n_null").as("n_null"), col("s.n_distinct").as("n_distinct"),
        col("s.min_v").as("min_v"), col("s.max_v").as("max_v"),
        col("s.avg_v").as("avg_v"))
  }

  private val profileCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val profileStatsOracle: String = profileCols.map { c =>
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |       count(*) - count($c) AS n_null,
       |       count(DISTINCT $c) AS n_distinct,
       |       CAST(min($c) AS DOUBLE) AS min_v,
       |       CAST(max($c) AS DOUBLE) AS max_v,
       |       round(avg($c), 6) AS avg_v
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** PIVOT: order counts per (mktsegment × orderstatus) — wide-format
    * rollup. Spark's `pivot` compiles to the same grouped conditional
    * aggregation the oracle spells out (one shuffle; the pivot column
    * domain is enumerated so the plan stays static).
    */
  def pivotStatus(customer: DataFrame, orders: DataFrame): DataFrame =
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("O" -> "n_open", "F" -> "n_filled", "P" -> "n_partial"))

  val pivotStatusOracle: String =
    """SELECT c_mktsegment,
      |       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
      |       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Ordered list aggregation (collect_list + sort for determinism):
    * the per-group array materialization a feature pipeline uses.
    */
  def collectTopCustomers(orders: DataFrame): DataFrame =
    orders.filter(col("o_totalprice") > 400000)
      .groupBy(col("o_orderstatus"))
      .agg(sort_array(collect_list(col("o_custkey"))).as("big_buyers"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        concat_ws(",", col("big_buyers")).as("big_buyers"), col("n"))

  val collectTopCustomersOracle: String =
    """SELECT o_orderstatus,
      |       array_to_string(list(o_custkey ORDER BY o_custkey), ',') AS big_buyers,
      |       count(*) AS n
      |FROM orders
      |WHERE o_totalprice > 400000
      |GROUP BY 1""".stripMargin

  /** Map-typed aggregation: per-segment map of orderstatus → count
    * (map_from_entries over a sorted entry list), then map functions —
    * map_entries rendering, map_values fold — consume it. Maps are the
    * natural shape for sparse per-key stats columns in a wide pipeline
    * table; rendered to a sorted string at the boundary so the oracle
    * compare is representation-independent.
    */
  def segmentStatusMap(customer: DataFrame, orders: DataFrame): DataFrame = {
    val counts = orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("c_mktsegment"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("o_orderstatus"), col("n")))))
        .as("m"))
      .select(
        col("c_mktsegment"),
        concat_ws(",", transform(map_entries(col("m")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))).as("status_counts"),
        size(map_keys(col("m"))).as("n_statuses"),
        aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v).as("n_orders"))
  }

  val segmentStatusMapOracle: String =
    """SELECT c_mktsegment,
      |       string_agg(o_orderstatus || '=' || n, ',' ORDER BY o_orderstatus) AS status_counts,
      |       count(*) AS n_statuses,
      |       CAST(sum(n) AS BIGINT) AS n_orders
      |FROM (
      |  SELECT c_mktsegment, o_orderstatus, count(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |)
      |GROUP BY 1""".stripMargin

  /** HLL sketch distinct (approx_count_distinct): the sketch estimate is
    * not bit-comparable across engines, so the oracle-checked output is
    * the exact count plus a Spark-side tolerance assertion that the HLL
    * estimate (rsd=0.01) landed within 5% of it — the sketch still runs
    * in the plan, and the result is fully hash-checkable. Shipped because
    * a 100 TB pipeline counts distincts with sketches, not exact shuffles.
    */
  def approxDistinct(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.01).as("approx"),
        countDistinct(col("o_custkey")).as("exact_buyers"))
      .select(
        col("o_orderstatus"),
        col("exact_buyers"),
        (abs(col("approx") - col("exact_buyers")).cast("double") / col("exact_buyers") <= 0.05)
          .as("sketch_ok"))

  val approxDistinctOracle: String =
    """SELECT o_orderstatus,
      |       count(DISTINCT o_custkey) AS exact_buyers,
      |       TRUE AS sketch_ok
      |FROM orders
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => pricingSummary(Tables.lineitem(s, d))),
    "q_salted_agg" -> ((s, d) => saltedAgg(Tables.events(s, d))),
    "q_salted_join" -> ((s, d) => saltedJoin(Tables.events(s, d))),
    "q_percentiles" -> ((s, d) => pricePercentiles(Tables.orders(s, d))),
    "q_profile_stats" -> ((s, d) => profileStats(Tables.lineitem(s, d))),
    "q_approx_distinct" -> ((s, d) => approxDistinct(Tables.orders(s, d))),
    "q_pivot" -> ((s, d) => pivotStatus(Tables.customer(s, d), Tables.orders(s, d))),
    "q_collect_list" -> ((s, d) => collectTopCustomers(Tables.orders(s, d))),
    "q_map_agg" -> ((s, d) => segmentStatusMap(Tables.customer(s, d), Tables.orders(s, d))),
    "q_join_segment" -> ((s, d) => revenueBySegment(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_join_region" -> ((s, d) => customersByRegion(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d))),
    "q_semi_join" -> ((s, d) => customersWithOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_anti_join" -> ((s, d) => customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_topk" -> ((s, d) => topOrders(Tables.orders(s, d))),
    "q_distinct" -> ((s, d) => distinctCounts(Tables.orders(s, d))),
    "q_set_ops" -> ((s, d) => setOps(Tables.customer(s, d), Tables.orders(s, d))),
    "q_union_all" -> ((s, d) => unionAll(Tables.orders(s, d))),
    "q_window_rank" -> ((s, d) => topOrdersPerCustomer(Tables.orders(s, d))),
    "q_analytic_suite" -> ((s, d) => analyticSuite(Tables.orders(s, d))),
    "q_rollup" -> ((s, d) => flagRollup(Tables.lineitem(s, d))),
    "q_cube" -> ((s, d) => flagCube(Tables.lineitem(s, d))),
    "q_grouping_sets" -> ((s, d) => flagGroupingSets(s, Tables.lineitem(s, d))),
    "q_filter_pushdown" -> ((s, d) => filteredRevenue(Tables.lineitem(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> pricingSummaryOracle,
    "q_salted_agg" -> saltedAggOracle,
    "q_salted_join" -> saltedJoinOracle,
    "q_percentiles" -> pricePercentilesOracle,
    "q_profile_stats" -> profileStatsOracle,
    "q_approx_distinct" -> approxDistinctOracle,
    "q_pivot" -> pivotStatusOracle,
    "q_collect_list" -> collectTopCustomersOracle,
    "q_map_agg" -> segmentStatusMapOracle,
    "q_join_segment" -> revenueBySegmentOracle,
    "q_join_region" -> customersByRegionOracle,
    "q_semi_join" -> customersWithOrdersOracle,
    "q_anti_join" -> customersWithoutOrdersOracle,
    "q_topk" -> topOrdersOracle(),
    "q_distinct" -> distinctCountsOracle,
    "q_set_ops" -> setOpsOracle,
    "q_union_all" -> unionAllOracle,
    "q_window_rank" -> topOrdersPerCustomerOracle,
    "q_analytic_suite" -> analyticSuiteOracle,
    "q_rollup" -> flagRollupOracle,
    "q_cube" -> flagCubeOracle,
    "q_grouping_sets" -> flagGroupingSetsOracle,
    "q_filter_pushdown" -> filteredRevenueOracle
  )
}
