package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Runtime-filter join acceleration: build a bloom filter over the
  * small/filtered join side and probe it on the large side BEFORE the
  * exact join — Spark's own `InjectRuntimeFilter` optimization expressed
  * explicitly (`bloom_filter_agg` + `might_contain`, the same Catalyst
  * expressions the rule injects).
  *
  * Why it matters at 100 TB: a semi-join against a selective build side
  * normally shuffles every probe row; the bloom filter is a compact
  * (~MB) scalar that broadcasts to the probe scan and drops non-matching
  * rows AT THE SCAN, so the shuffle carries only likely matches. False
  * positives are fine — the exact semi-join behind it keeps the result
  * identical to the unfiltered plan (precision comes from the join, the
  * bloom only prunes work). The reference has no joins at all
  * (SURVEY §2.3); this is part of the general relational surface.
  */
object RuntimeFilters {

  /** Customers having a filtered (high-value open) order: bloom-prune
    * the customer probe side, then exact left-semi join. Result is
    * byte-identical to the plain EXISTS query — the oracle checks that.
    * The bloom expressions resolve via GraftExtensions; on a vanilla
    * session (no extension) the query degrades to the plain EXISTS —
    * same rows, no prune.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_rf")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_rf")
    val bloomPredicate =
      if (spark.catalog.functionExists("graft_might_contain"))
        """graft_might_contain(
          |        (SELECT graft_bloom_agg(xxhash64(o_custkey), 50000L, 500000L)
          |         FROM big_orders),
          |        xxhash64(c_custkey))
          |  AND """.stripMargin
      else ""
    spark.sql(
      s"""WITH big_orders AS (
         |  SELECT o_custkey FROM orders_rf
         |  WHERE o_orderstatus = 'O' AND o_totalprice > 200000
         |)
         |SELECT c_custkey, c_name, c_acctbal
         |FROM customer_rf
         |WHERE $bloomPredicate
         |  EXISTS (SELECT 1 FROM big_orders WHERE o_custkey = c_custkey)
         |""".stripMargin)
  }

  val bloomSemiJoinOracle: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderstatus = 'O' AND o_totalprice > 200000)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_semi_join" -> bloomSemiJoin _
  )

  def oracles: Map[String, String] = Map(
    "q_bloom_semi_join" -> bloomSemiJoinOracle
  )
}
