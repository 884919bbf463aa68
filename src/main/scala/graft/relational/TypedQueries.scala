package graft.relational

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed `Dataset[T]` surface: case-class encoders, typed filters, and
  * a custom `Aggregator[IN, BUF, OUT]` (SURVEY §2.10 — not required for
  * reference parity, shipped as the type-safe path a library user gets).
  *
  * The VWAP aggregator is the canonical algebraic custom agg: the
  * buffer is (Σ price·qty, Σ qty), merge is component-wise addition —
  * so Spark runs it with map-side partial aggregation exactly like a
  * built-in (one shuffle of 2 doubles per group per partition, 100 TB
  * safe).
  */
object TypedQueries {

  case class LineItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  /** Σ(price·qty)/Σ(qty) — volume-weighted average price. */
  object Vwap extends Aggregator[LineItem, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), l: LineItem): (Double, Double) =
      (b._1 + l.l_extendedprice * l.l_quantity, b._2 + l.l_quantity)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed pipeline: Dataset[LineItem] → typed filter → groupByKey →
    * custom Aggregator. Rounded 2dp (ratio of big sums: cross-engine
    * summation-order drift ≪ 1e-2 boundary spacing).
    */
  def vwapByFlag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.lineitem(spark, dir).as[LineItem]
    items
      .filter(_.l_quantity > 0)
      .groupByKey(_.l_returnflag)
      .agg(Vwap.toColumn.name("vwap_raw"))
      .select(col("key").as("l_returnflag"), round(col("vwap_raw"), 2).as("vwap"))
  }

  val vwapByFlagOracle: String =
    """SELECT l_returnflag,
      |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS vwap
      |FROM lineitem
      |WHERE l_quantity > 0
      |GROUP BY 1""".stripMargin

  /** Parts revenue by brand: dimension broadcast over the fact scan. */
  def brandRevenue(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        round(avg(col("p_retailprice")), 4).as("avg_retail"),
        count(lit(1)).as("n_lines"))

  val brandRevenueOracle: String =
    """SELECT p_brand,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       round(avg(p_retailprice), 4) AS avg_retail,
      |       count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin

  /** Supplier volume per region: full dim-chain star join over the
    * remaining tables (supplier→nation→region + lineitem fact).
    */
  def supplierRegionVolume(region: DataFrame, nation: DataFrame,
                           supplier: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_quantity")), 2).as("volume"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))

  val supplierRegionVolumeOracle: String =
    """SELECT r_name, n_name,
      |       round(sum(l_quantity), 2) AS volume,
      |       count(DISTINCT s_suppkey) AS n_suppliers
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_vwap" -> vwapByFlag _,
    "q_brand_revenue" -> ((s, d) => brandRevenue(Tables.part(s, d), Tables.lineitem(s, d))),
    "q_supplier_region" -> ((s, d) => supplierRegionVolume(
      Tables.region(s, d), Tables.nation(s, d), Tables.supplier(s, d), Tables.lineitem(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_typed_vwap" -> vwapByFlagOracle,
    "q_brand_revenue" -> brandRevenueOracle,
    "q_supplier_region" -> supplierRegionVolumeOracle
  )
}
