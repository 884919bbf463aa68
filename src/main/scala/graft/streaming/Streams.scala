package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.Tables
import graft.silver.SilverAgg

/** Structured Streaming surface (SURVEY §2.8 T1–T9): the reference's
  * bronze→silver continuous pipeline re-expressed with Spark's native
  * streaming — file/memory sources standing in for Kafka (offline env;
  * the Kafka variant is the same plan with
  * `readStream.format("kafka").option("subscribe", topic)`).
  *
  * The transform functions are the SAME pure `DataFrame => DataFrame`
  * used by the batch queries (graft.ingest.Bronze, graft.silver
  * .SilverAgg) — Catalyst plans them identically; only the source and
  * sink differ. That is the design contract that makes streaming
  * correctness testable: replay the stream input as a batch, run the
  * identical transform, compare (see `runSilverAvailableNow` + its
  * DuckDB oracle, and StreamingSpec's MemoryStream tests).
  *
  * Scale notes: the windowed agg shuffles once on (window, key) with
  * partial aggregation before the exchange; state is per-(window,key)
  * in the state store, bounded by the watermark (T1) — late rows beyond
  * 1 minute are dropped, closed windows are evicted. At 100 TB/day the
  * knobs are shuffle partitions, RocksDB state store, and watermark
  * tightness; the plan shape is unchanged.
  */
object Streams {

  /** T2/T1: the reference's silver transform on a (possibly streaming)
    * frame: watermark + sliding window agg (`process_silver.py:50-57`).
    */
  def silverTransform(events: DataFrame): DataFrame =
    SilverAgg.silverBars(
      events.withWatermark("ts", "1 minute"),
      "ts", "event_type", "value")

  /** Streaming file source over the events parquet (S4/S6 analog —
    * tails a directory exactly like the Delta/Kafka source tails a log).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    // The file stream source tails a DIRECTORY (like a Kafka topic / Delta
    // log); stage the single-file fixture into one.
    val staged = Files.createTempDirectory("graft_stream_in")
    Files.copy(java.nio.file.Paths.get(path), staged.resolve("events.parquet"))
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** End-to-end streaming run, batch-equivalent by construction:
    * AvailableNow trigger (T5), complete-mode windowed agg rewritten by
    * `foreachBatch` (T8) into an overwrite parquet sink, checkpointed
    * (T6). Returns the sink contents re-read — which the DuckDB oracle
    * checks against the batch tumbling SQL, proving stream/batch parity.
    */
  def runSilverAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val bars = eventsStream(spark, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(
        round(coalesce(stddev_pop(col("value")), lit(0.0)), 6).as("volatility"),
        round(avg(col("value")), 6).as("average_price"),
        max(col("ts")).as("processed_time"),
        count(lit(1)).as("n_rows"))
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("volatility"), col("average_price"),
        col("processed_time"), col("n_rows"))
    val q = bars.writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  /** The watermarked append-mode variant (T3/T4/T7): emits only windows
    * the watermark has closed, appending per micro-batch — the
    * reference's bronze sink shape. Used by StreamingSpec; not
    * oracle-checkable (append withholds the final open windows by
    * design).
    */
  def runSilverAppend(spark: SparkSession, dir: String, out: String, ckpt: String): Unit = {
    val bars = silverTransform(eventsStream(spark, dir))
    val q = bars.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
    q.awaitTermination()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_silver" -> runSilverAvailableNow _
  )

  /** Same oracle as the batch tumbling silver agg — THE point: the
    * streaming pipeline must equal the batch query on replayed input.
    */
  def oracles: Map[String, String] = Map(
    "q_stream_silver" -> SilverAgg.tumblingOracle
  )
}
