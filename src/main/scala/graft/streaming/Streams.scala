package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  /** State-store partition count for the end-to-end runs. A streaming
    * query's shuffle-partition setting is captured into its checkpoint
    * at first start and doubles as the state-store partition count —
    * size it to STATE VOLUME, not CPU count: every state partition pays
    * per-batch checkpoint file IO (delta + snapshot + commit per store;
    * a stream-stream join runs four stores), so oversized counts drown
    * small state in fsyncs. The corpus state here is tiny → 2 (measured
    * on the complete-mode silver replay: addBatch ≈ 0.65 s at 2
    * partitions vs ≈ 1.0 s at 4 and ≈ 1.1 s at 16 — state-commit IO
    * dominates compute at this volume, so fewer stores win); a
    * 100 TB/day stream raises this (and moves to RocksDB) — it is a
    * restart-time knob, not a plan change.
    */
  private val statePartitions = 2

  private def withStatePartitions[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** Streaming file source over the events parquet (S4/S6 analog —
    * tails a directory exactly like the Delta/Kafka source tails a log).
    */
  private val stagedDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Staged replay inputs are write-once, so their schema is immutable —
    * memoize the footer read instead of re-opening the parquet per
    * replay (it sits on every stream-query start path).
    */
  private val schemaMemo =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  private def stagedSchema(spark: SparkSession, staged: String): org.apache.spark.sql.types.StructType =
    schemaMemo.getOrElseUpdate(staged, spark.read.parquet(staged).schema)

  private def stageSingle(dir: String): String =
    stagedDirs.getOrElseUpdate(dir, {
      val d = graft.Scratch.dir("graft_stream_in")
      val src = java.nio.file.Paths.get(s"$dir/events.parquet")
      if (Files.isDirectory(src)) {
        // a multi-file corpus (scaled SFs write part sets): every part
        // becomes one arriving file in the landing dir — a naive
        // Files.copy of the directory would stage it EMPTY and the
        // replay would see no schema at all
        val s = Files.list(src)
        try {
          val it = s.iterator()
          var i = 0
          while (it.hasNext) {
            val p = it.next()
            val n = p.getFileName.toString
            if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) {
              Files.copy(p, d.resolve(f"events-$i%05d.parquet"))
              i += 1
            }
          }
        } finally s.close()
      } else Files.copy(src, d.resolve("events.parquet"))
      d.toString
    })

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    // The file stream source tails a DIRECTORY (like a Kafka topic / Delta
    // log); stage the single-file fixture into one (once per corpus dir).
    val staged = stageSingle(dir)
    val schema = spark.read.parquet(path).schema
    graft.Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(staged))
  }

  /** Pre-stages the streaming input directories for a corpus — the
    * "files arriving in a topic/landing zone" simulation, i.e. ETL
    * setup, not query work (the bench excludes it exactly like
    * `Layout.prepare`'s table builds).
    */
  def prepare(spark: SparkSession, dir: String): Unit = {
    stageSingle(dir)
    rangedDirs.getOrElseUpdate(dir, stageRanged(spark, dir))
    stageDuped(spark, dir)
    docRangedDirs.getOrElseUpdate(dir, stageRangedDocs(spark, dir))
    admissionIndex(spark, dir) // ingest-side index artifacts (see below)
    ()
  }

  // --------------------------------------------------------------- kafka

  /** S1/S4/T9: the reference's Kafka front door (`consumer_lake.py:37-42`)
    * as a real `.format("kafka")` code path — subscribe + startingOffsets
    * (default `latest` = no backfill, exactly `consumer_lake.py:41`),
    * value bytes parsed by the SAME `Bronze.parseTrades` every other
    * source uses. Swapping the offline file stand-in for the broker is
    * therefore CONFIGURATION, not code: the downstream transform plan
    * (`silverTransform`) is byte-identical. Offline (no connector jar /
    * broker) the call builds the full reader and fails only at Spark's
    * data-source lookup — StreamingSpec pins that boundary, and proves
    * the value-parse pipeline on a frame with Kafka's exact wire schema.
    */
  def kafkaEvents(spark: SparkSession, brokers: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    graft.ingest.Bronze.parseTrades(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())

  /** S1: live socket ingress — the in-engine analog of the reference's
    * WebSocket feed (`producer.py:35-41`: Binance trade JSON arriving on a
    * long-lived TCP connection). Spark's socket source delivers one string
    * row per line; the SAME `Bronze.parseTrades` used by the Kafka and
    * file paths parses the payload, so the live-ingress plan differs from
    * the replay plan only in its source node. (The socket source is
    * single-connection and checkpointless — a dev/live-tap front door, not
    * the durable one; production ingress stays `kafkaEvents`. That is the
    * reference's own split: its WebSocket client feeds Kafka.)
    */
  def socketTrades(spark: SparkSession, host: String, port: Int): DataFrame =
    graft.ingest.Bronze.parseTrades(
      spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load())

  /** S3: Kafka sink — the producer's `to_json(struct(*))` value
    * serialization (`producer.py:9-22`) feeding a `.format("kafka")`
    * writer. Returned unstarted so callers pick trigger/output mode.
    */
  def toKafkaSink(df: DataFrame, brokers: String, topic: String,
      ckpt: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", ckpt)

  /** End-to-end streaming run, batch-equivalent by construction:
    * AvailableNow trigger (T5), complete-mode windowed agg rewritten by
    * `foreachBatch` (T8) into an overwrite parquet sink, checkpointed
    * (T6). Returns the sink contents re-read — which the DuckDB oracle
    * checks against the batch tumbling SQL, proving stream/batch parity.
    */
  def runSilverAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft_stream_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_ckpt").toString
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
    withStatePartitions(spark) {
      val q = bars.writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
  }

  /** Stream-STATIC enrichment join — the third join class after
    * stream-stream (`runClickPurchaseJoin`) and batch-batch: a
    * streaming fact joined per micro-batch against a static dimension.
    * No state store is involved at all (the static side is re-planned
    * into each micro-batch as an ordinary broadcast hash join), which
    * is exactly why this is the default enrichment shape at 100 TB/day
    * — dimension churn costs nothing, state stays bounded to the
    * windowed agg downstream.
    *
    * Oracle: the identical batch join+rollup (`VALUES` dim in SQL).
    */
  def runStreamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft_stream_enr_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_enr_ckpt").toString
    val sp = spark
    import sp.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.1), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0)).toDF("event_type", "weight")
    val enriched = eventsStream(spark, dir)
      .join(broadcast(dim), Seq("event_type")) // stream-static join
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(round(sum(col("value") * col("weight")), 6).as("weighted_value"),
        count(lit(1)).as("n_rows"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("weighted_value"), col("n_rows"))
    withStatePartitions(spark) {
      val q = enriched.writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
  }

  val runStreamEnrichOracle: String =
    """SELECT date_trunc('minute', ts) AS window_start, event_type,
      |       round(sum(value * weight), 6) AS weighted_value,
      |       count(*) AS n_rows
      |FROM events
      |JOIN (VALUES ('click', 1.0), ('view', 0.1), ('purchase', 10.0),
      |             ('signup', 5.0), ('error', 0.0)) AS dim(event_type, weight)
      |USING (event_type)
      |GROUP BY 1, 2""".stripMargin

  /** Staged TIME-RANGED multi-file input for the append-mode run: the
    * events table written as `nFiles` range-partitioned parquet files
    * with increasing modification times, so `maxFilesPerTrigger=1`
    * replays them as separate micro-batches in event-time order. The
    * time ordering is what makes the append run deterministic: the
    * watermark can never close a window that still has rows in a later
    * file, so nothing is late-dropped and the final emitted set depends
    * only on the final watermark (max ts − delay) — exactly the batch
    * SQL restricted to closed windows, which is the oracle.
    */
  private val rangedDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Shared range-staged replay recipe: write `df` as `nFiles`
    * range-partitioned parquet files on `rangeCol` with ascending
    * modification times (part-file names sort in range order, so the
    * mtime stagger follows the range order). BOTH ranged replays —
    * events by ts, documents by doc_id — depend on this exact ordering
    * contract; keep it in one place.
    */
  private def stageRangedReplay(df: DataFrame, rangeCol: String, prefix: String,
      nFiles: Int): String = {
    val d = graft.Scratch.dir(prefix)
    df.repartitionByRange(nFiles, col(rangeCol))
      .write.mode("overwrite").parquet(d.toString)
    val parts = new java.io.File(d.toString).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    val base = System.currentTimeMillis() - 600000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 10000L) }
    d.toString
  }

  /** nFiles = 2 is the minimum that still exercises MULTI-batch
    * semantics (watermark advancing across batches, state merged across
    * a batch boundary, no-backfill arrival) — each extra replay file
    * costs a full micro-batch cycle (~0.5 s of planning + WAL + state
    * commit) per query per bench rep while proving nothing further; the
    * emitted set is batch-count-invariant by the time-ordered staging
    * contract above, so the oracle hashes are identical at any nFiles.
    * StreamingSpec drives its own many-batch fixtures for the semantic
    * edge cases (late drop, re-emit, restart-resume).
    */
  private def stageRanged(spark: SparkSession, dir: String, nFiles: Int = 2): String =
    stageRangedReplay(Tables.events(spark, dir), "ts", "graft_stream_ranged", nFiles)

  /** T3/T7/T9 end-to-end, oracle-checked: the watermarked APPEND run —
    * the shape that survives 100 TB/day (bounded state, each window
    * written exactly once when the watermark closes it; no complete-mode
    * rewrite of the whole result per batch). `maxFilesPerTrigger=1`
    * forces one micro-batch per staged range file, so the watermark
    * advances incrementally across batches and windows are emitted as
    * they close — multi-batch no-backfill semantics, not a single-batch
    * replay. The DuckDB oracle is the batch tumbling SQL restricted to
    * windows the final watermark closed.
    */
  def runSilverAppendChecked(spark: SparkSession, dir: String): DataFrame = {
    val staged = rangedDirs.getOrElseUpdate(dir, stageRanged(spark, dir))
    val out = graft.Scratch.dir("graft_stream_app_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_app_ckpt").toString
    val schema = stagedSchema(spark, staged)
    val bars = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .withWatermark("ts", "1 minute")
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
    withStatePartitions(spark) {
      val q = bars.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
  }

  /** Streaming OHLC candlestick bars — the payoff of formulating
    * open/close as lexicographic struct min/max (`GoldRollup.ohlcBars`):
    * order-dependent "first/last price" picks are illegal in a
    * streaming aggregation (rows arrive in arbitrary batch order, and
    * window/sort operators don't exist there), but a commutative
    * min/max over a (ts, event_id, value) struct aggregates
    * incrementally across micro-batches like any other agg — the state
    * store merges partial bars no matter how trades split across
    * batches. Oracle = the batch bars, proving the stream/batch parity.
    */
  def runStreamOhlc(spark: SparkSession, dir: String): DataFrame = {
    val staged = rangedDirs.getOrElseUpdate(dir, stageRanged(spark, dir))
    val out = graft.Scratch.dir("graft_stream_ohlc_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_ohlc_ckpt").toString
    val schema = stagedSchema(spark, staged)
    val pick = struct(col("ts").as("t"), col("event_id").as("i"),
      col("value").as("v"))
    val bars = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(
        min(pick).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(pick).getField("v").as("close"),
        count(lit(1)).as("n_trades"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n_trades"))
    withStatePartitions(spark) {
      val q = bars.writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
  }

  /** Streaming EXACT distinct users per (window, series) via the
    * mergeable set sketch (`functions/SetSketch.scala`) — the aggregate
    * streaming normally can't have: `count(distinct)` is unsupported in
    * a streaming aggregation (its state can't merge), and
    * `approx_count_distinct` drifts. The sketch's
    * TypedImperativeAggregate buffer IS the re-aggregatable form, so
    * the state store merges partial sketches across micro-batches like
    * any min/max — a user seen in batch 1 and re-seen in batch 7 counts
    * once — and the emitted cardinality is EXACT: the oracle is the
    * batch `count(DISTINCT)` over the same rows, hash-matched. State is
    * O(true distincts per group), the honest cost of exactness — cap
    * the group key domain (windowed, as here) or drop to HLL where that
    * bound can't hold.
    */
  def runStreamDistinct(spark: SparkSession, dir: String): DataFrame = {
    val staged = rangedDirs.getOrElseUpdate(dir, stageRanged(spark, dir))
    val out = graft.Scratch.dir("graft_stream_dist_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_dist_ckpt").toString
    val schema = stagedSchema(spark, staged)
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(call_function("graft_set_agg", col("user_id")).as("sketch"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        call_function("graft_set_card", col("sketch")).as("distinct_users"),
        col("n_events"))
    withStatePartitions(spark) {
      val q = agg.writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
  }

  val runStreamDistinctOracle: String =
    """SELECT date_trunc('minute', ts) AS window_start, event_type,
      |       count(DISTINCT user_id) AS distinct_users,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** EXACTLY-ONCE streaming ingest into the transactional table — the
    * lakehouse sink contract: each micro-batch commits through
    * `TxLog.commitAppendOnce` with (appId, batchId) as the
    * SetTransaction token, so a foreachBatch retry after a crash
    * between commit and checkpoint-advance lands ZERO duplicate rows
    * (stock Delta's `txn` mechanism, mirrored to `_delta_log` so
    * foreign engines see the same history). The harness PROVES the
    * dedup, not just runs it: after the stream drains, the LAST batch
    * is deliberately re-committed with its original batch id — the
    * crash-replay case — and the aggregate still hash-matches the
    * batch oracle, which double-counted rows would break.
    */
  def runStreamExactlyOnce(spark: SparkSession, dir: String): DataFrame = {
    val staged = rangedDirs.getOrElseUpdate(dir, stageRanged(spark, dir))
    val tbl = graft.Scratch.dir("graft_stream_eo_tbl").toString
    val ckpt = graft.Scratch.dir("graft_stream_eo_ckpt").toString
    val schema = stagedSchema(spark, staged)
    val appId = "graft-eo-ingest"
    @volatile var lastBatch = -1L
    withStatePartitions(spark) {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.TxLog.commitAppendOnce(batch, tbl, appId, batchId)
          lastBatch = batchId
          ()
        }
        .start()
      q.awaitTermination()
    }
    // crash-replay simulation: the checkpoint "lost" the last commit,
    // so the writer re-runs the SAME (appId, batchId) — must skip
    val replayed = graft.sources.TxLog.commitAppendOnce(
      spark.read.schema(schema).parquet(staged), tbl, appId, lastBatch)
    require(replayed.isEmpty,
      s"replaying batch $lastBatch must be skipped, got $replayed")
    graft.sources.TxLog.snapshot(spark, tbl)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val runStreamExactlyOnceOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Streaming FROM the transactional table (`format("graft-txlog")`,
    * [[TxLogStreamProvider]]): offsets are commit versions, so run 1
    * (AvailableNow) consumes the table's history as its first batch,
    * and run 2 — SAME checkpoint, started after one more commit —
    * consumes ONLY the new commit's files (the changes-between read,
    * O(new data)). The sink appends raw rows, so double-consumption of
    * the history or a missed delta both flip the oracle hash. This is
    * the medallion hand-off: silver streams from bronze's COMMITS, not
    * from raw file arrival.
    */
  def runStreamTableSource(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val tbl = graft.Scratch.dir("graft_stream_src_tbl").toString
    val out = graft.Scratch.dir("graft_stream_src_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_src_ckpt").toString
    graft.sources.TxLog.commitAppend(ev.filter(col("event_id") < 400), tbl)
    graft.sources.TxLog.commitAppend(
      ev.filter(col("event_id").between(400, 699)), tbl)
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog").option("path", tbl)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      q.awaitTermination()
    }
    drain() // run 1: history (versions 1-2) in one batch
    graft.sources.TxLog.commitAppend(ev.filter(col("event_id") >= 700), tbl)
    drain() // run 2: resumes at version 2, reads ONLY commit 3's files
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val runStreamTableSourceOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** FOREIGN Delta tail ([[graft.sources.ForeignDeltaLog]]): the same
    * `format("graft-txlog")` source over a table that has ONLY a stock
    * `_delta_log` — no graft manifests — i.e. a table some OTHER Delta
    * writer owns, the most common production streaming read. Offsets
    * are commit versions derived from log replay; run 1 drains the
    * two-commit history, a third commit lands between runs and run 2
    * resumes from the checkpoint reading ONLY it; a foreign
    * merge-on-read DELETE (the spec's remove + re-add(same path, new
    * deletionVector) pair) then commits, and run 3 delivers NOTHING
    * for it — an append stream never re-delivers or retracts over a DV
    * commit, exactly the native-table semantics. The final snapshot
    * read applies the foreign DVs. Oracle = the full corpus with the
    * deleted band REMOVED from the snapshot half and PRESENT in the
    * streamed half (both aggregated), so a re-delivered batch, a
    * missed resume, or an unapplied DV each flip a different half. */
  def runStreamForeignDelta(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{DeletionVectors, DeltaLog}
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_foreign_tbl")
    val out = graft.Scratch.dir("graft_stream_foreign_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_foreign_ckpt").toString
    val schema = ev.schema.json
    def mirrorBatch(df: DataFrame, name: String): String = {
      val tmp = graft.Scratch.dir(s"graft_stream_foreign_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val st = java.nio.file.Files.list(tmp)
      val part = try st.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally st.close()
      java.nio.file.Files.move(part, root.resolve(s"$name.parquet"))
      s"$name.parquet"
    }
    DeltaLog.mirrorCommit(root, 1L,
      Seq(mirrorBatch(ev.filter(col("event_id") < 400), "b0")),
      Seq.empty, schema)
    DeltaLog.mirrorCommit(root, 2L,
      Seq(mirrorBatch(ev.filter(col("event_id").between(400, 699)), "b1")),
      Seq.empty, schema)
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString).load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    drain() // run 1: delta history 0-1 as one batch
    DeltaLog.mirrorCommit(root, 3L,
      Seq(mirrorBatch(ev.filter(col("event_id") >= 700), "b2")),
      Seq.empty, schema)
    drain() // run 2: resumes from the checkpoint, reads ONLY commit 2
    // a foreign merge-on-read DELETE hiding ids < 100 of b0
    val doomed = spark.read.parquet(root.resolve("b0.parquet").toString)
      .select(col("_metadata.row_index"), col("event_id"))
      .filter(col("event_id") < 100)
      .collect().map(_.getLong(0)).toSeq.sorted
    val bitmap = DeletionVectors.serialize(doomed)
    val uuid = java.util.UUID.nameUUIDFromBytes(
      "graft-stream-foreign-dv".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val off = DeletionVectors.writeDvFile(
      root.resolve(s"deletion_vector_$uuid.bin"), Seq(bitmap)).head
    val desc = s"""{"storageType":"u","pathOrInlineDv":"${
      DeletionVectors.z85Encode(bb.array())}","offset":$off,""" +
      s""""sizeInBytes":${bitmap.length},"cardinality":${doomed.size}}"""
    DeltaLog.mirrorCommit(root, 4L, Seq.empty, Seq.empty, schema,
      operation = "DELETE",
      dvUpdates = Map("b0.parquet" -> ((desc, None))))
    drain() // run 3: the DV commit delivers nothing (native semantics)
    val streamed = spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("streamed"))
    val snap = spark.read.format("graft-txlog")
      .option("path", root.toString).load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("snapshot"))
    streamed.unionByName(snap)
  }

  val runStreamForeignDeltaOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
      |       'streamed' AS side
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
      |       'snapshot' AS side
      |FROM events WHERE event_id >= 100 GROUP BY 1""".stripMargin

  /** FOREIGN Iceberg tail ([[graft.sources.ForeignIcebergLog]]): the
    * same `format("graft-txlog")` source over a STOCK Apache Iceberg
    * tree — `metadata/` JSON + avro manifests, no graft manifests, no
    * Delta log — i.e. a table some other Iceberg writer owns. Offsets
    * are the table's sequence numbers; run 1 drains the two-snapshot
    * history, a third append lands between runs and run 2 resumes from
    * the checkpoint reading ONLY it; a merge-on-read POSITION DELETE
    * (a new delete manifest, data files untouched) then commits, and
    * run 3 delivers NOTHING for it — identical to the Delta-DV
    * semantics, because the position-delete file folds into the same
    * per-file bitmap machinery. The final snapshot read applies the
    * deletes. Shares [[runStreamForeignDeltaOracle]]: the two foreign
    * formats must behave identically under the same history. */
  def runStreamForeignIceberg(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IcebergLog
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_ficeberg_tbl")
    val out = graft.Scratch.dir("graft_stream_ficeberg_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_ficeberg_ckpt").toString
    val b0 = IcebergLog.writeDataFile(
      ev.filter(col("event_id") < 400), root, "b0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b0))
    val b1 = IcebergLog.writeDataFile(
      ev.filter(col("event_id").between(400, 699)), root, "b1.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b1))
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString).load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    drain() // run 1: snapshots 1-2 as one batch
    val b2 = IcebergLog.writeDataFile(
      ev.filter(col("event_id") >= 700), root, "b2.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b2))
    drain() // run 2: resumes from the checkpoint, reads ONLY snapshot 3
    // a merge-on-read position delete hiding ids < 100 of b0
    val doomed = spark.read.parquet(root.resolve(b0).toString)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"), col("event_id"))
      .filter(col("event_id") < 100)
      .select("file_path", "pos")
    val del = IcebergLog.writeDataFile(doomed, root, "del0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq.empty, Seq(del),
      operation = "delete")
    drain() // run 3: the delete snapshot delivers nothing (DV semantics)
    val streamed = spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("streamed"))
    val snap = spark.read.format("graft-txlog")
      .option("path", root.toString).load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("snapshot"))
    streamed.unionByName(snap)
  }

  /** FOREIGN Delta tail over a CHECKPOINT-COMPACTED log — the shape of
    * virtually every production table (stock writers checkpoint every
    * 10 commits and age the JSON prefix out on `logRetentionDuration`):
    * two commits land, a classic checkpoint compacts them, and the
    * JSON prefix is DELETED before the stream ever starts. Run 1 must
    * deliver the checkpoint-seeded snapshot as its first batch (stock
    * initial-snapshot semantics — no JSON describes that history
    * anymore); a post-checkpoint commit lands and run 2 resumes reading
    * ONLY its JSON; a merge-on-read DV DELETE (remove + re-add with a
    * descriptor) commits after the checkpoint and run 3 delivers
    * NOTHING for it, while the final snapshot read folds checkpoint
    * seed + JSON tail and applies the DV. Oracle = streamed full
    * corpus vs snapshot minus the deleted band — a dropped seed file,
    * a double-delivered history, or an unapplied post-checkpoint DV
    * each flip one half. */
  def runStreamForeignCkpt(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{DeletionVectors, DeltaLog}
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_fckpt_tbl")
    val out = graft.Scratch.dir("graft_stream_fckpt_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_fckpt_ckpt").toString
    val schema = ev.schema.json
    def mirrorBatch(df: DataFrame, name: String): String = {
      val tmp = graft.Scratch.dir(s"graft_stream_fckpt_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val st = java.nio.file.Files.list(tmp)
      val part = try st.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally st.close()
      java.nio.file.Files.move(part, root.resolve(s"$name.parquet"))
      s"$name.parquet"
    }
    DeltaLog.mirrorCommit(root, 1L,
      Seq(mirrorBatch(ev.filter(col("event_id") < 400), "b0")),
      Seq.empty, schema)
    DeltaLog.mirrorCommit(root, 2L,
      Seq(mirrorBatch(ev.filter(col("event_id").between(400, 699)), "b1")),
      Seq.empty, schema)
    // compact: classic checkpoint at delta version 1, then AGE OUT the
    // JSON prefix — exactly what logRetentionDuration does in production
    DeltaLog.checkpoint(spark, root.toString)
    Seq(0L, 1L).foreach(v => java.nio.file.Files.delete(
      root.resolve("_delta_log").resolve(f"$v%020d.json")))
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString).load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    drain() // run 1: the CHECKPOINT-SEEDED snapshot as the first batch
    DeltaLog.mirrorCommit(root, 3L,
      Seq(mirrorBatch(ev.filter(col("event_id") >= 700), "b2")),
      Seq.empty, schema)
    drain() // run 2: resumes past the checkpoint, reads ONLY commit 2
    // a post-checkpoint merge-on-read DELETE hiding ids < 100 of b0
    val doomed = spark.read.parquet(root.resolve("b0.parquet").toString)
      .select(col("_metadata.row_index"), col("event_id"))
      .filter(col("event_id") < 100)
      .collect().map(_.getLong(0)).toSeq.sorted
    val bitmap = DeletionVectors.serialize(doomed)
    val uuid = java.util.UUID.nameUUIDFromBytes(
      "graft-stream-fckpt-dv".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val off = DeletionVectors.writeDvFile(
      root.resolve(s"deletion_vector_$uuid.bin"), Seq(bitmap)).head
    val desc = s"""{"storageType":"u","pathOrInlineDv":"${
      DeletionVectors.z85Encode(bb.array())}","offset":$off,""" +
      s""""sizeInBytes":${bitmap.length},"cardinality":${doomed.size}}"""
    DeltaLog.mirrorCommit(root, 4L, Seq.empty, Seq.empty, schema,
      operation = "DELETE",
      dvUpdates = Map("b0.parquet" -> ((desc, None))))
    drain() // run 3: the DV commit delivers nothing (native semantics)
    val streamed = spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("streamed"))
    val snap = spark.read.format("graft-txlog")
      .option("path", root.toString).load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("snapshot"))
    streamed.unionByName(snap)
  }

  /** FOREIGN Iceberg tail over EQUALITY DELETES — the Flink-CDC shape
    * (the dominant Iceberg streaming writer emits eq-deletes on every
    * upsert): b0 lands at sequence 1 and streams; an eq-delete on
    * `event_type` commits at sequence 2 as a pure-delete snapshot and
    * the append stream delivers NOTHING for it; b1 lands at sequence 3
    * and streams. The final snapshot read resolves the delete's VALUES
    * to positions under the strictly-older rule — b0's 'error' rows
    * vanish, b1's SURVIVE (they postdate the delete). The oracle's
    * residue split is the batch eq-delete query's own
    * ([[graft.sources.IcebergLog.eqDeleteQueryOracle]]): only a tail
    * honoring both the equality join and the sequence rule matches. */
  def runStreamForeignIcebergEq(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IcebergLog
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_ficeberg_eq_tbl")
    val out = graft.Scratch.dir("graft_stream_ficeberg_eq_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_ficeberg_eq_ckpt").toString
    val b0 = IcebergLog.writeDataFile(
      ev.filter(pmod(col("event_id"), lit(2)) === 0), root, "b0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b0)) // seq 1
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString).load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    drain() // run 1: b0
    // seq 2: a PURE equality-delete snapshot naming event_type='error'
    // (field ids are 1-based over the schema, the metadataJson rule)
    val delRel = IcebergLog.writeDataFile(
      ev.select("event_type").filter(col("event_type") === "error").limit(1),
      root, "eqdel0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq.empty,
      operation = "delete", newEqDeletes = Seq(delRel),
      equalityIds = Seq(ev.schema.fieldIndex("event_type") + 1))
    drain() // run 2: the eq-delete delivers nothing on an append stream
    val b1 = IcebergLog.writeDataFile(
      ev.filter(pmod(col("event_id"), lit(2)) === 1), root, "b1.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b1)) // seq 3
    drain() // run 3: b1 (its rows POSTDATE the delete and must survive)
    val streamed = spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("streamed"))
    val snap = spark.read.format("graft-txlog")
      .option("path", root.toString).load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .withColumn("side", lit("snapshot"))
    streamed.unionByName(snap)
  }

  /** FLINK-UPSERT CDC TAIL, oracle-checked: a stock Iceberg tree takes
    * one overwrite snapshot carrying the new row versions AND an
    * equality delete on their keys — the exact shape Flink CDC writes
    * per upsert batch. The streaming CDF drain must emit stock
    * Iceberg's changelog for it: sequence 1's corpus as `insert` rows
    * at version 1, the upsert as `delete` rows carrying the OLD values
    * (position-resolved from the eq-delete, read from the unchanged
    * file) plus `insert` rows carrying the NEW values, all labeled
    * version 2. The oracle derives all three legs from the residue
    * split — an unresolved eq-delete, a postimage mislabel, or a
    * version smear each flip a different group. */
  def runStreamIcebergUpsertCdf(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IcebergLog
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_fice_upsert_tbl")
    val out = graft.Scratch.dir("graft_stream_fice_upsert_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_fice_upsert_ckpt").toString
    val b0 = IcebergLog.writeDataFile(
      ev.filter(col("event_id") < 500), root, "b0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b0)) // seq 1
    val upsert = ev.filter(col("event_id").between(400, 599))
      .withColumn("value", round(col("value") * 2, 2))
    val b1 = IcebergLog.writeDataFile(upsert, root, "b1.parquet")
    val del = IcebergLog.writeDataFile(
      upsert.select("event_id"), root, "del0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b1),
      operation = "overwrite", newEqDeletes = Seq(del),
      equalityIds = Seq(ev.schema.fieldIndex("event_id") + 1)) // seq 2
    withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString)
        .option("readChangeFeed", "true").load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  /** Streaming tail of a HIVE-LAYOUT foreign Iceberg tree (the
    * `add_files`-migrated shape: data files do NOT carry the partition
    * column — its values live only in the manifests' partition
    * tuples): the scan appends them per file, so every group key in
    * the result came from a manifest tuple. Two snapshots drain
    * incrementally through one checkpoint; a missed attach nulls the
    * keys, a crossed file→tuple map scrambles the groups, and either
    * flips the oracle hash. */
  def runStreamIcebergHive(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IcebergLog
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_fice_hive_tbl")
    val out = graft.Scratch.dir("graft_stream_fice_hive_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_fice_hive_ckpt").toString
    val types = ev.select("event_type").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val pcols = Seq(("event_type", org.apache.spark.sql.types.StringType))
    def landSnap(pred: org.apache.spark.sql.Column, tag: String): Unit = {
      val rels = types.map { t =>
        IcebergLog.writeDataFile(
          ev.filter(pred && col("event_type") === t).drop("event_type"),
          root, s"$tag-$t.parquet") -> Map("event_type" -> t)
      }
      IcebergLog.appendForeignSnapshot(root, ev.schema, rels.map(_._1),
        partitions = rels.toMap, partitionCols = pcols)
      ()
    }
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString).load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    landSnap(col("event_id") < 500, "a")
    drain()
    landSnap(col("event_id") >= 500, "b") // only snapshot 2's files stream
    drain()
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val runStreamIcebergHiveOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1""".stripMargin

  /** CDF over the COPY-ON-WRITE rewrite shape (Spark-on-Iceberg
    * MERGE/DELETE/UPDATE: remove data files, re-house survivors, no cdc
    * in the format): seq 1 appends b0; seq 2 REWRITES it — survivors
    * carried into a new file plus a batch of fresh rows. Stock
    * Iceberg's changelog resolves this with CARRYOVER ANALYSIS, and so
    * does the feed: survivors are suppressed, the feed emits exactly
    * the net `delete` (dropped) and `insert` (fresh) rows. The oracle
    * derives both sets from the residue split — a carryover leaking
    * through (survivors re-emitted as inserts, or worse as deletes)
    * flips the hash. */
  def runStreamIcebergRewriteCdf(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IcebergLog
    val ev = graft.Tables.events(spark, dir)
    val root = graft.Scratch.dir("graft_stream_fice_rewrite_tbl")
    val out = graft.Scratch.dir("graft_stream_fice_rewrite_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_fice_rewrite_ckpt").toString
    val b0 = IcebergLog.writeDataFile(
      ev.filter(col("event_id") < 600), root, "b0.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b0)) // seq 1
    // seq 2, the CoW MERGE: b0 removed; survivors (id % 7 != 3)
    // re-housed; a fresh batch (600..699) lands alongside
    val b0r = IcebergLog.writeDataFile(
      ev.filter(col("event_id") < 600 && pmod(col("event_id"), lit(7)) =!= 3),
      root, "b0r.parquet")
    val b1 = IcebergLog.writeDataFile(
      ev.filter(col("event_id").between(600, 699)), root, "b1.parquet")
    IcebergLog.appendForeignSnapshot(root, ev.schema, Seq(b0r, b1),
      operation = "overwrite", removedData = Seq(b0))
    withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog")
        .option("path", root.toString)
        .option("readChangeFeed", "true").load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val runStreamIcebergRewriteCdfOracle: String =
    """SELECT CAST(1 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id < 600
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'delete', count(*), round(sum(value), 2)
      |FROM events WHERE event_id < 600 AND event_id % 7 = 3
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'insert', count(*), round(sum(value), 2)
      |FROM events WHERE event_id BETWEEN 600 AND 699""".stripMargin

  val runStreamIcebergUpsertCdfOracle: String =
    """SELECT CAST(1 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id < 500
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'delete', count(*), round(sum(value), 2)
      |FROM events WHERE event_id BETWEEN 400 AND 499
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'insert', count(*),
      |       round(sum(round(value * 2, 2)), 2)
      |FROM events WHERE event_id BETWEEN 400 AND 599""".stripMargin

  val runStreamForeignIcebergEqOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
      |       'streamed' AS side
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
      |       'snapshot' AS side
      |FROM events WHERE NOT (event_id % 2 = 0 AND event_type = 'error')
      |GROUP BY 1""".stripMargin

  /** Streaming CHANGE DATA FEED read (`.option("readChangeFeed",
    * "true")` on the `graft-txlog` source — stock Delta's CDF-stream
    * contract): every micro-batch emits the commits' change rows
    * tagged `_change_type` / `_commit_version`. Appends surface as
    * `insert` rows carrying their EXACT commit version — the CDF read
    * always replays PER VERSION, never the first-batch snapshot
    * shortcut, so versions stay accurate; a bytes-only OPTIMIZE emits
    * nothing (no row changed); and run 2 on the same checkpoint picks
    * up only the commits after the pin. The reference's silver layer
    * is exactly such a change consumer (`process_silver.py:43-45`);
    * this is its lakehouse-native form. The oracle derives each row's
    * commit version from the fixture's residue split — any snapshot
    * shortcut, double replay, or surfaced compaction flips the hash.
    */
  def runStreamCdf(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val tbl = graft.Scratch.dir("graft_stream_cdf_tbl").toString
    val out = graft.Scratch.dir("graft_stream_cdf_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_cdf_ckpt").toString
    graft.sources.TxLog.commitAppend(
      ev.filter(pmod(col("event_id"), lit(3)) === 0), tbl)
    graft.sources.TxLog.commitAppend(
      ev.filter(pmod(col("event_id"), lit(3)) === 1), tbl)
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog").option("path", tbl)
        .option("readChangeFeed", "true").load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    drain() // run 1: versions 1-2, replayed per version
    graft.sources.TxLog.optimize(spark, tbl) // v3: bytes-only, no change rows
    graft.sources.TxLog.commitAppend(
      ev.filter(pmod(col("event_id"), lit(3)) === 2), tbl) // v4
    drain() // run 2: only v4's inserts
    spark.read.parquet(out)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val runStreamCdfOracle: String =
    """SELECT CAST(CASE event_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END
      |            AS BIGINT) AS _commit_version,
      |       'insert' AS _change_type,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Streaming CDF over a MERGE-ON-READ history through the native
    * connector: a DV DELETE and a DV UPDATE land between two
    * checkpointed AvailableNow drains, and the feed must label every
    * version — v1's inserts RAW (a later delete must not erase
    * delivered history), the delete's rows as typed `delete` WITH
    * their deleted values (executors read the newly-hidden ordinals
    * back from unchanged files via the row-index path), the update as
    * preimage/postimage pairs, the final append as `insert`. The
    * second drain resumes the SAME checkpoint across the DV commits —
    * offset tracking, the DV-diff synthesis, and the labels all have
    * to hold for the hash to match. */
  def runStreamCdfDv(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val tbl = graft.Scratch.dir("graft_stream_cdfdv_tbl").toString
    val out = graft.Scratch.dir("graft_stream_cdfdv_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_cdfdv_ckpt").toString
    graft.sources.TxLog.commitAppend(
      ev.repartitionByRange(4, col("event_id")), tbl)                // v1
    graft.sources.TxLog.setTableProperties(spark, tbl,
      Map("delta.enableDeletionVectors" -> "true"))                  // v2
    graft.sources.TxLog.deleteWhereDv(spark, tbl,
      col("event_id") <= 300,
      Seq(("event_id", null, java.lang.Long.valueOf(300L))))         // v3
    def drain(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog").option("path", tbl)
        .option("readChangeFeed", "true").load()
        .writeStream.option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }
    drain() // run 1: v1 inserts + v3 deletes
    graft.sources.TxLog.updateWhereDv(spark, tbl,
      col("event_id").between(400L, 500L),
      Map("value" -> (col("value") + 10)),
      Seq(("event_id", java.lang.Long.valueOf(400L),
        java.lang.Long.valueOf(500L))))                              // v4
    graft.sources.TxLog.commitAppend(
      ev.filter(col("event_id").between(900L, 1000L)), tbl)          // v5
    drain() // run 2: resumes the checkpoint across the DV commits
    spark.read.parquet(out)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val runStreamCdfDvOracle: String =
    """SELECT _commit_version, _change_type, count(*) AS n,
      |       round(sum(v), 2) AS total_value
      |FROM (
      |  SELECT CAST(1 AS BIGINT) AS _commit_version,
      |         'insert' AS _change_type, value AS v FROM events
      |  UNION ALL SELECT 3, 'delete', value FROM events
      |    WHERE event_id <= 300
      |  UNION ALL SELECT 4, 'update_preimage', value FROM events
      |    WHERE event_id BETWEEN 400 AND 500
      |  UNION ALL SELECT 4, 'update_postimage', value + 10 FROM events
      |    WHERE event_id BETWEEN 400 AND 500
      |  UNION ALL SELECT 5, 'insert', value FROM events
      |    WHERE event_id BETWEEN 900 AND 1000
      |) GROUP BY 1, 2""".stripMargin

  /** The MEDALLION LOOP end to end, table to table — SYMMETRIC on the
    * native connector: bronze is a committed TxLog table; silver
    * STREAMS FROM IT (`format("graft-txlog")` source — commits become
    * micro-batches), applies the enrichment transform, and lands each
    * batch through the NATIVE SINK (`writeStream.format("graft-txlog")`,
    * [[TxLogSink]]) — exactly-once via the (txnAppId, batchId)
    * SetTransaction token the sink stamps internally. The harness then
    * commits MORE bronze data and resumes on the same checkpoint —
    * the steady-state ingest cycle — and deliberately re-commits the
    * last batch token (crash replay). The silver aggregate
    * hash-matches the batch oracle only if every piece held: offset
    * tracking, delta-only batches, token dedup, and the transform
    * itself.
    */
  def runStreamPipeline(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val bronze = graft.Scratch.dir("graft_pipe_bronze").toString
    val silver = graft.Scratch.dir("graft_pipe_silver").toString
    val ckpt = graft.Scratch.dir("graft_pipe_ckpt").toString
    val appId = "graft-pipe-silver"
    graft.sources.TxLog.commitAppend(ev.filter(col("event_id") < 500), bronze)
    @volatile var lastBatch = -1L
    def cycle(): Unit = withStatePartitions(spark) {
      val q = spark.readStream.format("graft-txlog").option("path", bronze)
        .load()
        // the silver transform: typed enrichment, stateless per batch
        .withColumn("day", col("ts").cast("date"))
        .withColumn("value_band",
          when(col("value") >= 50, "hi").otherwise("lo"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("graft-txlog")
        .option("path", silver)
        .option("txnAppId", appId)
        .start()
      q.awaitTermination()
      lastBatch = math.max(lastBatch,
        q.recentProgress.map(_.batchId).foldLeft(lastBatch)(math.max))
    }
    cycle() // run 1: bronze history
    graft.sources.TxLog.commitAppend(ev.filter(col("event_id") >= 500), bronze)
    cycle() // run 2: only the new bronze commit
    // crash replay of the final token: must skip, not duplicate
    val replay = graft.sources.TxLog.commitAppendOnce(
      graft.sources.TxLog.snapshot(spark, bronze)
        .withColumn("day", col("ts").cast("date"))
        .withColumn("value_band",
          when(col("value") >= 50, "hi").otherwise("lo")),
      silver, appId, lastBatch)
    require(replay.isEmpty, s"pipeline replay must skip, got $replay")
    graft.sources.TxLog.snapshot(spark, silver)
      .groupBy(col("day"), col("value_band"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("day"), col("value_band"))
  }

  val runStreamPipelineOracle: String =
    """SELECT CAST(ts AS DATE) AS day,
      |       CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS value_band,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Streaming heavy hitters with BOUNDED state — the SpaceSaving
    * sketch, salt-parallelized: keys hash into `buckets` groups, each
    * group's state is a counter map capped at `capacity` entries, and
    * a full bucket evicts its (count, key)-minimum counter to adopt a
    * new key at count+1 (the SpaceSaving over-estimate). State is
    * O(buckets × capacity) FOREVER — independent of stream length and
    * key cardinality, which is the property that distinguishes this
    * from Spark's native streaming agg (state = O(distinct keys), an
    * OOM on an unbounded key domain).
    *
    * Guarantees (classic SpaceSaving): counts exact while a bucket's
    * distinct keys ≤ capacity — the test-SF regime, which is what
    * makes the exact-count oracle hash-match — and over-estimates
    * bounded by bucketN/capacity past it, with the true heavy hitters
    * always retained. Eviction picks the (count, key) minimum, so the
    * sketch is deterministic; emitted counts are monotone per key,
    * so the final count is the MAX over a key's appended emissions.
    */
  /** One SpaceSaving counter update: increment a tracked key, insert
    * while below capacity, else evict the (count, key) minimum and
    * adopt the newcomer at its count + 1.
    */
  private[graft] def spaceSavingStep(m: Map[Long, Long], u: Long,
      capacity: Int): Map[Long, Long] =
    m.get(u) match {
      case Some(c) => m.updated(u, c + 1)
      case None if m.size < capacity => m.updated(u, 1L)
      case None =>
        val (ek, ec) = m.minBy { case (key, c) => (c, key) }
        (m - ek).updated(u, ec + 1)
    }

  def runStreamTopK(spark: SparkSession, dir: String,
      buckets: Int = 4, capacity: Int = 512, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val staged = rangedDirs.getOrElseUpdate(dir, stageRanged(spark, dir))
    val out = graft.Scratch.dir("graft_stream_topk_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_topk_ckpt").toString
    val sp = spark
    import sp.implicits._
    val schema = stagedSchema(spark, staged)
    val users = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .select(col("user_id"),
        pmod(hash(col("user_id")), lit(buckets)).as("bucket"))
      .as[(Long, Int)]
    val emitted = users.groupByKey(_._2)
      .flatMapGroupsWithState[Map[Long, Long], (Long, Long)](
        OM.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          val touched = scala.collection.mutable.TreeSet.empty[Long]
          rows.foreach { case (u, _) =>
            m = spaceSavingStep(m, u, capacity)
            touched += u
          }
          state.update(m)
          // keys evicted mid-batch emit nothing this batch (their last
          // counts were appended in earlier batches; max-merge keeps them)
          touched.iterator.filter(m.contains).map(u => (u, m(u)))
      }
      .toDF("user_id", "cnt")
    withStatePartitions(spark) {
      val q = emitted.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .groupBy(col("user_id"))
      .agg(max(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(k)
  }

  /** Oracle: exact per-key counts (the sketch is exact in the ≤capacity
    * regime), same (count desc, key asc) top-k boundary rule.
    */
  def runStreamTopKOracle(k: Int = 10): String =
    s"""SELECT user_id, count(*) AS cnt
       |FROM events
       |GROUP BY 1
       |ORDER BY cnt DESC, user_id
       |LIMIT $k""".stripMargin

  /** Oracle: batch tumbling bars restricted to windows closed by the
    * final watermark (max event time − 1 minute, at Spark's millisecond
    * watermark precision).
    */
  val runSilverAppendCheckedOracle: String =
    """WITH wm AS (
      |  SELECT make_timestamp((epoch_ms(max(ts)) - 60000) * 1000) AS w FROM events
      |), bars AS (
      |  SELECT date_trunc('minute', ts) AS window_start,
      |         date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
      |         event_type,
      |         round(coalesce(stddev_pop(value), 0), 6) AS volatility,
      |         round(avg(value), 6) AS average_price,
      |         max(ts) AS processed_time,
      |         count(*) AS n_rows
      |  FROM events GROUP BY 1, 2, 3
      |)
      |SELECT window_start, window_end, event_type, volatility,
      |       average_price, processed_time, n_rows
      |FROM bars, wm WHERE bars.window_end <= wm.w""".stripMargin

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

  /** The reference's FULL silver composition (`process_silver.py:60-89`):
    * streaming window agg → foreachBatch { empty-batch guard (P7) →
    * null-fill (P4) → cached-model inference with 0.0 fallback (M3/M5)
    * → batch append (S7) }. The model is the daily-bars OLS trained by
    * graft.ml.PriceModel (S9/S10); predictions land next to each bar
    * exactly as the reference's silver rows carry `predicted_price`.
    */
  def runSilverInference(spark: SparkSession, dir: String): DataFrame = {
    import graft.ml.PriceModel
    val model = PriceModel.model(spark, dir)
    val out = graft.Scratch.dir("graft_stream_ml_out").toString
    val ckpt = graft.Scratch.dir("graft_stream_ml_ckpt").toString
    val bars = eventsStream(spark, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(
        stddev_pop(col("value")).as("volatility"),
        avg(col("value")).as("average_price"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("volatility"), col("average_price"))
    withStatePartitions(spark) {
      val q = bars.writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) { // P7 guard (isEmpty, not the reference's extra count())
            val filled = batch.na.fill(0.0, Seq("volatility")) // P4
            graft.ml.PriceModel.withPrediction(filled, Some(model)) // M3 + M5 fallback
              .write.mode("overwrite").parquet(out) // S7 (overwrite: complete mode)
          }
        }
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out).select(
      col("window_start"), col("event_type"),
      round(col("volatility"), 6).as("volatility"),
      round(col("average_price"), 6).as("average_price"),
      round(col("predicted_price"), 2).as("predicted_price"))
  }

  /** Oracle: minute bars + the closed-form OLS fit over DAILY bars
    * (the trained model), prediction = icept + slope · volatility.
    */
  val runSilverInferenceOracle: String =
    """WITH daily AS (
      |  SELECT coalesce(stddev_pop(value), 0) AS volatility,
      |         avg(value) AS average_price
      |  FROM events GROUP BY date_trunc('day', ts), event_type
      |  HAVING avg(value) > 0 AND coalesce(stddev_pop(value), 0) >= 0
      |), fit AS (
      |  SELECT regr_slope(average_price, volatility) AS slope,
      |         regr_intercept(average_price, volatility) AS icept
      |  FROM daily
      |), bars AS (
      |  SELECT date_trunc('minute', ts) AS window_start, event_type,
      |         coalesce(stddev_pop(value), 0) AS volatility,
      |         avg(value) AS average_price
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT window_start, event_type,
      |       round(volatility, 6) AS volatility,
      |       round(average_price, 6) AS average_price,
      |       round(icept + slope * volatility, 2) AS predicted_price
      |FROM bars CROSS JOIN fit""".stripMargin

  /** Stream-stream interval join (the flagship stateful binary operator
    * Structured Streaming adds over the reference's surface): click
    * events join the same user's purchases landing within 30 minutes
    * AFTER the click. Both sides are watermarked; the time-bound lets
    * Spark evict join state once the watermark passes click_ts + 30 min
    * — unbounded-state joins don't survive a 100 TB/day stream, the
    * interval condition is what makes the state finite.
    *
    * Pure DataFrame => DataFrame over two streaming inputs — the same
    * composition runs in batch, which is how the oracle checks it.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(
      col("user_id").as("c_user"), col("ts").as("click_ts"),
      col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 minute")
    val p = purchases.select(
      col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "1 minute")
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
  }

  /** End-to-end streaming run of the stream-stream join: both sides tail
    * the same staged events dir, AvailableNow, append sink; the emitted
    * pairs are re-read and compacted to a per-user summary in batch
    * (inner-join emission doesn't wait on watermarks, so the replayed
    * result equals the batch interval join — the DuckDB oracle).
    */
  def runClickPurchaseJoin(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft_ssj_out").toString
    val ckpt = graft.Scratch.dir("graft_ssj_ckpt").toString
    val ev = eventsStream(spark, dir)
    val joined = clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
    withStatePartitions(spark) {
      val q = joined.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("p_value")), 2).as("purchase_value"))
  }

  val runClickPurchaseJoinOracle: String =
    """SELECT c.user_id, count(*) AS n_pairs,
      |       round(sum(p.value), 2) AS purchase_value
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |GROUP BY 1""".stripMargin

  /** Streaming exact dedup: drop re-deliveries of the same event id
    * within the watermark horizon (state is bounded by the watermark —
    * the streaming form of the batch exact-dedup operator; at-least-once
    * sources => exactly-once rows).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("event_id")

  /** At-least-once input fixture: the events table plus a re-delivery
    * of every 7th event (byte-identical copies) — what a Kafka source
    * hands you after a producer retry / consumer rebalance.
    */
  private val dupedDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stageDuped(spark: SparkSession, dir: String): String =
    dupedDirs.getOrElseUpdate(dir, {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val d = graft.Scratch.dir("graft_stream_dup").toString
      val raw = spark.read.option("pathGlobFilter", "*.parquet").parquet(s"$dir/events.parquet")
      raw.union(raw.filter(pmod(col("event_id"), lit(7)) === 0))
        .write.mode("overwrite").parquet(d)
      d
    })

  /** End-to-end oracle-checked streaming dedup: replay the duplicated
    * input through `dedupStream` into an append sink; the per-type
    * summary of the sink must equal the ORIGINAL table's — at-least-once
    * in, exactly-once out, with state bounded by the watermark (the
    * shape that holds on an unbounded 100 TB/day stream; batch-global
    * `dropDuplicates` state would not).
    */
  def runStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageDuped(spark, dir)
    val out = graft.Scratch.dir("graft_sdd_out").toString
    val ckpt = graft.Scratch.dir("graft_sdd_ckpt").toString
    val schema = stagedSchema(spark, staged)
    val deduped = dedupStream(graft.Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(staged)))
    withStatePartitions(spark) {
      val q = deduped.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("event_id")).as("n_ids"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Oracle = the original (never-duplicated) table: row counts AND
    * distinct-id counts match only if every re-delivery was dropped
    * exactly once.
    */
  val runStreamDedupOracle: String =
    """SELECT event_type, count(*) AS n_rows,
      |       count(DISTINCT event_id) AS n_ids,
      |       round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------- streaming near-dup

  /** Staged doc_id-ranged documents for the near-dup stream: `nFiles`
    * range files with ascending modification times, replayed one file
    * per micro-batch in doc_id order. Arrival order is SEMANTIC for
    * on-arrival dedup — "first seen wins" — and the ordered replay
    * makes first == min(doc_id), which is what a batch SQL oracle can
    * express.
    */
  private val docRangedDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stageRangedDocs(spark: SparkSession, dir: String, nFiles: Int = 2): String =
    stageRangedReplay(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "doc_id", "graft_stream_docs", nFiles) // nFiles=2: see stageRanged

  /** Streaming NEAR-duplicate flagging — the LLM-dedup stack composed
    * with arbitrary streaming state: every arriving document derives
    * its LSH band buckets (the SAME native MinHash banding the batch
    * dedup pipeline uses, stateless so it plans identically over the
    * stream), and per-(band, bucket) state remembers the first doc_id
    * seen; a document whose bucket was already claimed by an earlier
    * doc is flagged on arrival — duplicate filtering BEFORE the write
    * to the lake, not as a nightly batch after it.
    *
    * Scale shape: one shuffle per micro-batch on (band, bucket) — the
    * same key the batch LSH join uses — and O(distinct buckets) state.
    * On an unbounded corpus the state store is RocksDB and the state
    * needs a TTL (dedup against a recent horizon, the standard
    * trade-off); the bounded replay here keeps NoTimeout so the oracle
    * equality is exact.
    *
    * Within a batch each group is sorted by doc_id before the state
    * fold, so emission is deterministic regardless of task scheduling;
    * across batches the doc_id-ranged staging guarantees lower ids
    * arrive first. The per-group sort buffer is bounded by the
    * micro-batch admission knobs (maxFilesPerTrigger /
    * maxBytesPerTrigger), so a boilerplate-hot bucket costs one
    * in-memory sort of at most a batch's rows, never corpus-sized.
    * Result: per doc, how many of its bands hit an earlier doc's
    * bucket, and the boolean flag.
    */
  def runStreamNearDup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val staged = docRangedDirs.getOrElseUpdate(dir, stageRangedDocs(spark, dir))
    val out = graft.Scratch.dir("graft_snd_out").toString
    val ckpt = graft.Scratch.dir("graft_snd_ckpt").toString
    val sp = spark
    import sp.implicits._
    val schema = stagedSchema(spark, staged)
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val bands = graft.ext.Dedup.bandedDocs(docs)
      .select(col("band").cast("int").as("band"), col("bucket"), col("doc_id"))
      .as[(Int, String, Long)]
    val flagged = bands.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Int, Int)](
        OM.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), rows, state: GroupState[Long]) =>
          val ds = rows.map(_._3).toArray.sorted // deterministic in-batch order
          var seen = state.getOption
          val outRows = ds.map { d =>
            val hit = seen.exists(_ < d)
            seen = Some(seen.fold(d)(math.min(_, d)))
            (d, band, if (hit) 1 else 0)
          }
          seen.foreach(state.update)
          outRows.iterator
      }
      .toDF("doc_id", "band", "hit")
    withStatePartitions(spark) {
      val q = flagged.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .groupBy(col("doc_id"))
      .agg(sum(col("hit")).cast("bigint").as("n_hit_bands"))
      .withColumn("is_neardup", col("n_hit_bands") > 0)
  }

  /** The PRODUCTION form of the near-dup state: dedup against a recent
    * event-time HORIZON instead of all history. Per-(band, bucket)
    * state holds only the last-seen event time; a doc hits iff some
    * band's bucket was last seen within `horizonMin` of its own event
    * time (gap-based, like sessionization), and the state EXPIRES via
    * event-time timeout once the watermark passes last_seen + horizon —
    * so state is O(buckets active in the horizon), not O(every bucket
    * ever), which is what makes the operator runnable on an unbounded
    * 100 TB/day stream. The hit decision reads the STORED timestamp
    * (last_seen >= ts − horizon), so timeout granularity — state GC
    * happens at batch boundaries — never changes the output; eviction
    * is purely the memory bound.
    *
    * Input: a streaming (doc_id, text, ts) frame. Output: one
    * (doc_id, band, hit) row per band, appended as buckets are probed.
    */
  def nearDupWithinHorizon(docs: DataFrame, horizonMin: Int = 90): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val sp = docs.sparkSession
    import sp.implicits._
    val horizonMs = horizonMin * 60000L
    val bands = graft.ext.Dedup.bandedDocsWith(
        docs.withWatermark("ts", "1 minute"), Seq("ts"))
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("doc_id"), col("ts"))
      .as[(Int, String, Long, java.sql.Timestamp)]
    bands.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Int, Int)](
        OM.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ds = rows.toArray.sortBy(r => (r._4.getTime, r._3))
            var last = state.getOption
            val outRows = ds.map { r =>
              val t = r._4.getTime
              val hit = last.exists(_ >= t - horizonMs)
              last = Some(last.fold(t)(math.max(_, t)))
              (r._3, band, if (hit) 1 else 0)
            }
            last.foreach { l =>
              state.update(l)
              // the timeout ts must be past the current watermark
              state.setTimeoutTimestamp(
                math.max(l + horizonMs, state.getCurrentWatermarkMs + 1))
            }
            outRows.iterator
          }
      }
      .toDF("doc_id", "band", "hit")
  }

  /** Oracle: a band row "hits" iff an earlier (smaller-id) doc shares
    * its (band, bucket) — expressible in batch SQL precisely because
    * the ordered replay makes stream arrival order = doc_id order.
    */
  def runStreamNearDupOracle: String =
    s"""WITH ${graft.ext.Dedup.bandsCteSql.replace("\n", "\n      |")},
      |m AS (
      |  SELECT band, bucket, min(doc_id) AS first_doc FROM bands GROUP BY 1, 2
      |)
      |SELECT b.doc_id,
      |       CAST(sum(CASE WHEN m.first_doc < b.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_bands,
      |       sum(CASE WHEN m.first_doc < b.doc_id THEN 1 ELSE 0 END) > 0 AS is_neardup
      |FROM bands b JOIN m ON b.band = m.band AND b.bucket = m.bucket
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------- streaming admission

  /** STREAMED incremental cross-corpus admission — the crawl loop's
    * steady state as a stream: new documents arrive in micro-batches
    * and each batch is admitted against the STATIC indexed corpus via
    * `Dedup.incrementalDedupFromBands`. The index band table is
    * computed ONCE before the stream starts and reused across every
    * trigger (the write-once frame a production service persists at
    * ingest) — per micro-batch work is the batch slice's signatures,
    * the bucket join, and candidate-only verification.
    *
    * Stateless by construction: admission only consults the static
    * index, so each doc's decision is independent of which micro-batch
    * carried it — which is exactly why the replay must hash-match the
    * BATCH `incrementalDedup` oracle (stream/batch parity for the
    * admission operator). The hot-bucket cap is evaluated per trigger
    * against index + that batch's docs; at test SF the cap never
    * trips, so capped stream and global-batch results coincide (at
    * corpus scale a tripped cap makes admission order-dependent —
    * inherent to incremental operation, documented not hidden).
    */
  /** One-time admission-index artifacts per corpus: the band table
    * PRE-CAPPED per bucket and the shingle table, localCheckpoint-
    * materialized. This is what a production admission service PERSISTS
    * AT INGEST and every batch merely reads — so index construction is
    * ingest-side ETL staged by `prepare()` (the same timing exclusion as
    * Layout/TxLog/stream-landing staging), and the replayed query
    * measures admission itself, not index rebuilds. Evicted by
    * [[clearCaches]].
    */
  private val admissionIdx =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame)]

  private def admissionIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    admissionIdx.getOrElseUpdate(dir, {
      val index = graft.Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(5)) =!= 4)
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket")).orderBy(col("doc_id"))
      val idxBands = graft.ext.Dedup.indexBandTable(index)
        .withColumn("bpos", row_number().over(wB))
        .filter(col("bpos") <= graft.ext.Dedup.hotBucketCap)
        .select(col("bucket"), col("doc_id"))
        .localCheckpoint()
      val idxShingles = graft.ext.Dedup.indexShingleTable(index).localCheckpoint()
      (idxBands, idxShingles)
    })

  /** Evict the per-corpus admission-index memo (see [[graft.Caches]]). */
  private[graft] def clearCaches(): Unit = admissionIdx.clear()

  def runStreamAdmission(spark: SparkSession, dir: String): DataFrame = {
    val staged = docRangedDirs.getOrElseUpdate(dir, stageRangedDocs(spark, dir))
    val out = graft.Scratch.dir("graft_adm_out").toString
    val ckpt = graft.Scratch.dir("graft_adm_ckpt").toString
    val (idxBands, idxShingles) = admissionIndex(spark, dir)
    val schema = stagedSchema(spark, staged)
    val newDocs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .filter(pmod(col("doc_id"), lit(5)) === 4)
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.ext.Dedup.incrementalDedupPrepared(idxBands, idxShingles, batch)
            .write.mode("append").parquet(out)
        }
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  // ------------------------------------------- transformWithState (v2 API)

  /** Accumulator state for `RunningTypeStats`. */
  case class RunningAgg(n: Long, total: Double)

  /** Output row of the transformWithState demo operator. */
  case class TypeStats(event_type: String, n: Long, total_value: Double)

  /** Spark 4's second-generation arbitrary-state operator
    * (`transformWithState` + `StatefulProcessor`): a per-key running
    * accumulator with explicit `ValueState`. Compared to
    * `flatMapGroupsWithState` this is the API the engine is moving to —
    * typed state handles (value/list/map), TTL, timers, and it REQUIRES
    * the RocksDB state store (the 100 TB state backend), which the
    * runner below configures. State is O(keys); each batch touches only
    * the keys it contains.
    */
  class RunningTypeStats extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Double), TypeStats] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var state: ValueState[RunningAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningAgg]("agg",
        org.apache.spark.sql.Encoders.product[RunningAgg], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[TypeStats] = {
      var acc = if (state.exists()) state.get() else RunningAgg(0L, 0.0)
      rows.foreach { case (_, v) => acc = RunningAgg(acc.n + 1, acc.total + v) }
      state.update(acc)
      Iterator(TypeStats(key, acc.n, acc.total))
    }
  }

  /** End-to-end oracle-checked transformWithState run: the running
    * accumulator over the full replay must equal the batch aggregate.
    * Configures the RocksDB state store for the query (transformWithState
    * rejects the default HDFS-backed provider).
    */
  def runRunningStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    val out = graft.Scratch.dir("graft_tws_out").toString
    val ckpt = graft.Scratch.dir("graft_tws_ckpt").toString
    val sp = spark
    import sp.implicits._
    val src = eventsStream(spark, dir)
      .select(col("event_type"), col("value")).as[(String, Double)]
    val res = src.groupByKey(_._1)
      .transformWithState(new RunningTypeStats, TimeMode.None(), OM.Update())
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withStatePartitions(spark) {
      val q = res.toDF().writeStream
        .outputMode(OM.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        // single staged file => single batch: the one emission per key IS
        // the final running total (multi-batch append semantics are
        // covered by q_stream_append/q_stream_dedup)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    } finally prevProvider match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
    spark.read.parquet(out).select(
      col("event_type"), col("n"),
      round(col("total_value"), 2).as("total_value"))
  }

  val runRunningStatsOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Per-user session accumulator for `sessionizeStateful`. */
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  /** T10: custom stateful sessionizer via flatMapGroupsWithState —
    * the escape hatch for session semantics `session_window` can't
    * express (e.g. emitting session summaries with custom close rules).
    * Event-time timeout: a group's state closes when the watermark
    * passes last-event + gap; emits one row per closed session.
    */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, (Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)](
        OM.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)], state: GroupState[SessionState]) =>
          def emit(s: SessionState) =
            (user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last + gapMs), s.n, s.sum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(s))
          } else {
            val sorted = rows.map { case (_, t, v) => (t.getTime, v) }.toSeq.sortBy(_._1)
            var closed = List.empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
            var cur = state.getOption
            sorted.foreach { case (t, v) =>
              cur match {
                case Some(s) if t <= s.last + gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1, sum = s.sum + v))
                case Some(s) =>
                  closed ::= emit(s)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
      .toDF("user_id", "session_start", "session_end", "n_events", "session_value")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_silver" -> runSilverAvailableNow _,
    "q_stream_append" -> runSilverAppendChecked _,
    "q_stream_inference" -> runSilverInference _,
    "q_stream_join" -> runClickPurchaseJoin _,
    "q_stream_dedup" -> runStreamDedup _,
    "q_stream_neardup" -> runStreamNearDup _,
    "q_stream_enrich" -> runStreamEnrich _,
    "q_stream_topk" -> ((s, d) => runStreamTopK(s, d)),
    "q_stream_ohlc" -> runStreamOhlc _,
    "q_stream_distinct" -> runStreamDistinct _,
    "q_stream_exactly_once" -> runStreamExactlyOnce _,
    "q_stream_table_source" -> runStreamTableSource _,
    "q_stream_foreign_delta" -> runStreamForeignDelta _,
    "q_stream_foreign_ckpt" -> runStreamForeignCkpt _,
    "q_stream_foreign_iceberg" -> runStreamForeignIceberg _,
    "q_stream_foreign_iceberg_eq" -> runStreamForeignIcebergEq _,
    "q_stream_iceberg_upsert_cdf" -> runStreamIcebergUpsertCdf _,
    "q_stream_iceberg_rewrite_cdf" -> runStreamIcebergRewriteCdf _,
    "q_stream_iceberg_hive" -> runStreamIcebergHive _,
    "q_stream_cdf" -> runStreamCdf _,
    "q_stream_cdf_dv" -> runStreamCdfDv _,
    "q_stream_pipeline" -> runStreamPipeline _,
    "q_stream_admission" -> runStreamAdmission _,
    "q_stream_tws" -> runRunningStats _
  )

  /** Same oracle as the batch tumbling silver agg — THE point: the
    * streaming pipeline must equal the batch query on replayed input.
    */
  def oracles: Map[String, String] = Map(
    "q_stream_silver" -> SilverAgg.tumblingOracle,
    "q_stream_append" -> runSilverAppendCheckedOracle,
    "q_stream_inference" -> runSilverInferenceOracle,
    "q_stream_join" -> runClickPurchaseJoinOracle,
    "q_stream_dedup" -> runStreamDedupOracle,
    "q_stream_neardup" -> runStreamNearDupOracle,
    "q_stream_enrich" -> runStreamEnrichOracle,
    "q_stream_topk" -> runStreamTopKOracle(),
    "q_stream_ohlc" -> graft.gold.GoldRollup.ohlcBarsOracle,
    "q_stream_distinct" -> runStreamDistinctOracle,
    "q_stream_exactly_once" -> runStreamExactlyOnceOracle,
    "q_stream_table_source" -> runStreamTableSourceOracle,
    "q_stream_foreign_delta" -> runStreamForeignDeltaOracle,
    "q_stream_foreign_ckpt" -> runStreamForeignDeltaOracle,
    "q_stream_foreign_iceberg" -> runStreamForeignDeltaOracle,
    "q_stream_foreign_iceberg_eq" -> runStreamForeignIcebergEqOracle,
    "q_stream_iceberg_upsert_cdf" -> runStreamIcebergUpsertCdfOracle,
    "q_stream_iceberg_rewrite_cdf" -> runStreamIcebergRewriteCdfOracle,
    "q_stream_iceberg_hive" -> runStreamIcebergHiveOracle,
    "q_stream_cdf" -> runStreamCdfOracle,
    "q_stream_cdf_dv" -> runStreamCdfDvOracle,
    "q_stream_pipeline" -> runStreamPipelineOracle,
    "q_stream_admission" -> graft.ext.Dedup.incrementalDedupOracle(),
    "q_stream_tws" -> runRunningStatsOracle
  )
}
