package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.Schemas

/** Bronze-layer ingest: JSON payload parsing + type normalization.
  *
  * Reference ops covered: P1/P2 (`consumer_lake.py:44`,
  * `process_silver.py:47`), F2–F6 (json parse, casts), F4 (epoch↔ts,
  * `producer.py:20`), F9 (+3h display shift, `dashboard.py:43`),
  * F11 (time formatting, `dashboard.py:109`).
  *
  * The same column transform works in batch and under `readStream` — it is
  * a pure `DataFrame => DataFrame` with no actions, so Catalyst plans it
  * identically in both modes (map-only pipeline: no shuffle, stays inside
  * one WholeStageCodegen stage, filters/pruning push to the source scan).
  */
object Bronze {

  /** Kafka-value JSON lines → typed trade rows.
    * Exactly `consumer_lake.py:44` + the cast at `process_silver.py:47`:
    * from_json with the declared schema (permissive: malformed → nulls),
    * flatten, string→timestamp cast.
    */
  def parseTrades(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), Schemas.tradeSchema).as("data"))
      .select(col("data.*"))
      .withColumn("timestamp", col("timestamp").cast("timestamp"))

  /** Driver-corpus analog: parse `events.props` (the stand-in Kafka
    * payload) and surface the typed field alongside the event columns.
    */
  def parseEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"),
      from_json(col("props"), Schemas.propsSchema).getField("k").as("prop_k"))

  val parseEventsOracle: String =
    """SELECT event_id, ts, user_id, event_type, value,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      |FROM events""".stripMargin

  /** Time conversions: epoch-millis extraction, millis round-trip,
    * ISO formatting, HH:mm:ss display, fixed +3h display shift.
    */
  def timeConvert(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      unix_millis(col("ts")).as("epoch_ms"),
      timestamp_millis(unix_millis(col("ts"))).as("ts_ms"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso_str"),
      date_format(col("ts"), "HH:mm:ss").as("time_str"),
      (col("ts") + expr("INTERVAL 3 HOURS")).as("display_time"))

  val timeConvertOracle: String =
    """SELECT event_id,
      |       epoch_ms(ts) AS epoch_ms,
      |       make_timestamp(epoch_ms(ts) * 1000) AS ts_ms,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_str,
      |       strftime(ts, '%H:%M:%S') AS time_str,
      |       ts + INTERVAL 3 HOUR AS display_time
      |FROM events""".stripMargin

  /** F1/F2 roundtrip: to_json(struct(...)) — the producer's Kafka-value
    * serialization (`producer.py:11`) — then parse a field back out.
    */
  def jsonRoundtrip(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      to_json(struct(col("event_id"), col("event_type"))).as("payload"))
      .withColumn("parsed_type",
        get_json_object(col("payload"), "$.event_type"))

  val jsonRoundtripOracle: String =
    """SELECT event_id,
      |       to_json(struct_pack(event_id := event_id, event_type := event_type)) AS payload,
      |       json_extract_string(to_json(struct_pack(event_id := event_id, event_type := event_type)), '$.event_type') AS parsed_type
      |FROM events""".stripMargin

  /** Semi-structured ingestion via the VARIANT type (Spark 4's
    * lakehouse-native JSON representation): `parse_json` converts the
    * payload once into the binary variant encoding, `variant_get`
    * extracts typed fields by path. Unlike per-field `get_json_object`,
    * the parse cost is paid once per row regardless of how many fields
    * are later read — the shape to store open schemas at 100 TB (parquet
    * writes variant columns natively with shredding).
    */
  def variantExtract(events: DataFrame): DataFrame =
    events
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"), variant_get(col("v"), "$.k", "bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 6).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  val variantExtractOracle: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 6) AS avg_k,
      |       min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY 1""".stripMargin

  /** Malformed-payload resilience (the reference's implicit error path,
    * SURVEY §1.3): `from_json` is PERMISSIVE by default — a corrupt
    * payload yields nulls, the pipeline keeps flowing, and the nulls are
    * countable for a data-quality report. Every 10th payload is
    * deterministically corrupted to exercise the path.
    */
  def malformedJson(events: DataFrame): DataFrame =
    events
      .withColumn("payload",
        when(pmod(col("event_id"), lit(10)) === 0, lit("{not json"))
          .otherwise(col("props")))
      .withColumn("k", from_json(col("payload"), Schemas.propsSchema).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("k")).as("n_parsed"),
        (count(lit(1)) - count(col("k"))).as("n_malformed"),
        sum(col("k")).as("sum_k"))

  val malformedJsonOracle: String =
    """SELECT event_type, count(*) AS n,
      |       count(k) AS n_parsed,
      |       count(*) - count(k) AS n_malformed,
      |       CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (
      |  SELECT event_type,
      |         CASE WHEN event_id % 10 = 0 THEN NULL
      |              ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      |  FROM events
      |)
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_malformed_json" -> ((s, dir) => malformedJson(Tables.events(s, dir))),
    "q_variant_extract" -> ((s, dir) => variantExtract(Tables.events(s, dir))),
    "q_bronze_parse" -> ((s, dir) => parseEvents(Tables.events(s, dir))),
    "q_time_convert" -> ((s, dir) => timeConvert(Tables.events(s, dir))),
    "q_json_roundtrip" -> ((s, dir) => jsonRoundtrip(Tables.events(s, dir)))
  )

  def oracles: Map[String, String] = Map(
    "q_malformed_json" -> malformedJsonOracle,
    "q_variant_extract" -> variantExtractOracle,
    "q_bronze_parse" -> parseEventsOracle,
    "q_time_convert" -> timeConvertOracle,
    "q_json_roundtrip" -> jsonRoundtripOracle
  )
}
