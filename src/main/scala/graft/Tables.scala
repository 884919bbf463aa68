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

  /** Scale-adaptive parallelism floor for CPU-heavy per-row kernels
    * (tokenize, n-gram shingling, minhash/simhash, quality regexes).
    *
    * A parquet scan's task count derives from file splits
    * (`maxPartitionBytes`), i.e. from BYTES — but these kernels cost
    * per-row CPU at ~1-10 MB/s-per-core, 10-100x the scan's own byte
    * rate, so a mid-size table that fits one split serializes minutes
    * of kernel CPU on one core while the rest of the cluster idles.
    * Redistribute by a deterministic unique key, with the partition
    * count DERIVED FROM THE INPUT SIZE (ceil(bytes / minBytesPerTask),
    * capped at the session's parallelism), not from a constant:
    *
    *  - tiny input (< one task's worth of kernel work): unchanged —
    *    an exchange + a 32-task stage costs more in scheduling, AQE
    *    stage-jobs and per-task constants than the kernel itself
    *    (measured on this box: +0.1-0.5 s per query at sf0.1, where
    *    the whole corpus is ~0.5 MB of parquet);
    *  - production-scale input (>= cores x maxPartitionBytes):
    *    unchanged — the scan already yields >= cores splits naturally
    *    and a forced exchange would only re-shuffle the corpus;
    *  - the in-between band (single- or few-split tables carrying
    *    seconds-to-minutes of kernel CPU): repartition to
    *    size/minBytesPerTask tasks.
    *
    * Size comes from the logical plan's stats (file bytes scaled by
    * projection — no physical planning, no job). The per-task floor is
    * `spark.graft.fanout.minBytesPerTask` (default 1 MiB of scan-stat
    * bytes ~= a few MB decompressed ~= O(1 s) of kernel CPU — a
    * production-sane task size for CPU-bound work, not a local-mode
    * tune). Streaming frames pass through untouched (micro-batch
    * sources size their own partitions). The explicit partition count
    * pins the exchange against AQE coalescing (which sizes by BYTES
    * and would fold a small-but-CPU-hot frame back to one partition).
    * Keyed (not round-robin) repartition keeps the row->partition map
    * deterministic under task retry and skips the local
    * sort-before-repartition a keyless repartition pays.
    */
  def fanOut(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming) return df
    val sess = df.sparkSession
    val cores = sess.sparkContext.defaultParallelism
    val minBytes = sess.sessionState.conf
      .getConfString("spark.graft.fanout.minBytesPerTask", (1L << 20).toString).toLong
    val natural = sess.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size >= BigInt(natural) * cores) return df // scan splits naturally
    val target = (size / minBytes).min(BigInt(cores)).toInt
    if (target <= 1) df else df.repartition(target, col(key))
  }
}
