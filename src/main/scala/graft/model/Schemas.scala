package graft.model

import org.apache.spark.sql.types._

/** Shared schema constants + case classes for typed Dataset paths.
  *
  * Mirrors the reference's declared ingest schema — the hand-written
  * 4-field StructType driving from_json at `consumer_lake.py:29-34` —
  * and the silver/gold row shapes derived at `process_silver.py:50-57`
  * and `dbt_project/models/gold_market_summary.sql:3-16`.
  */
object Schemas {

  /** Raw trade payload (reference `consumer_lake.py:29-34`): the Kafka
    * `value` JSON. Money stays DoubleType to match reference semantics
    * (SURVEY §1.2 — do not "fix" to decimal).
    */
  val tradeSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("quantity", DoubleType),
    StructField("timestamp", StringType)
  ))

  /** The `events.props` JSON payload in the driver corpus — the stand-in
    * for the Kafka value (FIXTURES.md §A): `{"k": <int>}`.
    */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", LongType)
  ))
}

/** One trade tick (reference bronze row, `consumer_lake.py:29-34`). */
final case class Trade(symbol: String, price: Double, quantity: Double, timestamp: java.sql.Timestamp)

/** One silver aggregate row (reference `process_silver.py:50-57,75-80`). */
final case class SilverBar(
    symbol: String,
    volatility: Double,
    average_price: Double,
    processed_time: java.sql.Timestamp,
    predicted_price: Double)

/** One event row from the driver corpus (FIXTURES.md §A). */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)
