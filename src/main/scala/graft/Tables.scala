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
  /** `events.ts` has shipped as two different physical types across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 rejects by default
    * — read as epoch-nanos long via `nanosAsLong` and floor-convert; `div`
    * integer division keeps full precision where a double division would
    * lose bits above 2^53) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (which Spark loads as TIMESTAMP_NTZ). Branch on
    * the loaded dtype so both generations normalize to the same
    * session-zoned TimestampType the rest of the engine (windows,
    * watermarks, date_trunc buckets) is built against. All entry points pin
    * the session timezone to UTC, so the NTZ→TZ cast is value-preserving.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(spark, dir, "events"))
  }

  /** Dtype-branch normalizer shared by the batch loader and the streaming
    * stagers (`Streams.eventsStream`, `Streams.runStreamDedup`): any events
    * frame — whatever physical ts generation it was read from — comes out
    * with a session-zoned TimestampType `ts`.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
