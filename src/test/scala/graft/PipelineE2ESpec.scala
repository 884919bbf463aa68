package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.ingest.Bronze
import graft.silver.SilverAgg

/** End-to-end offline replay of the reference pipeline
  * (producer → Kafka → bronze → silver), with JSON-lines files standing
  * in for the Kafka topic: S2/S3 (JSON serialize), S4-ish (streaming
  * text source), P1/P2 (from_json + casts), A1–A3 (windowed agg).
  */
class PipelineE2ESpec extends SparkSpec {

  test("producer-sim JSON -> streaming bronze parse -> silver bars equals batch path") {
    val s = spark
    val dir = "/root/testdata/sf0.001"

    // "Producer": serialize events to JSON lines (the Kafka value payload).
    val topicDir = Files.createTempDirectory("graft_topic").toString
    Tables.events(s, dir)
      .select(to_json(struct(
        col("event_type").as("symbol"),
        col("value").as("price"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"))).as("value"))
      .coalesce(2)
      .write.mode("overwrite").text(topicDir)

    // "Consumer": stream the topic, parse with the declared trade schema.
    val raw = s.readStream
      .schema("value STRING")
      .text(topicDir)
    val bronze = Bronze.parseTrades(raw)
      .filter(col("timestamp").isNotNull)

    // Silver: the SAME windowed transform as batch, complete mode.
    val bars = bronze
      .groupBy(window(col("timestamp"), "1 minute").as("w"), col("symbol"))
      .agg(
        round(coalesce(stddev_pop(col("price")), lit(0.0)), 6).as("volatility"),
        round(avg(col("price")), 6).as("average_price"),
        count(lit(1)).as("n_rows"))

    val out = Files.createTempDirectory("graft_silver_out").toString
    val ckpt = Files.createTempDirectory("graft_silver_ckpt").toString
    val q = bars.writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(out)
      }.start()
    q.awaitTermination()

    val streamed = s.read.parquet(out)
      .select(col("w.start").as("ws"), col("symbol"), col("volatility"),
        col("average_price"), col("n_rows"))
      .orderBy("ws", "symbol").collect()

    // Batch equivalent straight from the parquet events.
    val batch = SilverAgg.tumbling(Tables.events(s, dir))
      .select(col("window_start").as("ws"), col("event_type").as("symbol"),
        col("volatility"), col("average_price"), col("n_rows"))
      .orderBy("ws", "symbol").collect()

    assert(streamed.length == batch.length)
    assert(streamed.zip(batch).forall { case (a, b) => a == b },
      "streamed JSON-replay silver must equal batch silver")
  }
}
