package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Every table is a single-directory parquet read: at 100 TB these become
  * partitioned/bucketed table reads, but the call sites stay identical —
  * Catalyst handles partition pruning + column pruning + filter pushdown
  * from the declarative plan built on top of these frames.
  */
object Tables {
  /** pathGlobFilter mirrors the reference's part-file predicate (P9,
    * `dashboard.py:31`): only *.parquet data files are scanned even if
    * stray sidecar files land in the table directory. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.option("pathGlobFilter", "*.parquet").parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 rejects by
    * default; read it as epoch-nanos long and floor-convert to a regular
    * microsecond timestamp. `div` (integer division) keeps full precision
    * — a double division would lose bits above 2^53.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
