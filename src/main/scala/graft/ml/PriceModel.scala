package graft.ml

import scala.util.Try

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ML surface of the reference (SURVEY §2.9): OLS `average_price ~
  * volatility` trained on the silver bars, persisted, re-loaded, and
  * applied inside the pipeline with a 0.0 fallback.
  *
  * Reference: `train_model.py:42-50` (VectorAssembler + LinearRegression
  * fit + save), `process_silver.py:27-41,64-80` (lazy cached load,
  * transform, try/except → lit(0.0) fallback), `train_model.py:30-36`
  * (training filter + min-rows guard), `train_model.py:48` (coefficient
  * introspection).
  *
  * Oracle: with `solver=normal, regParam=0` the fit is exact least
  * squares, so DuckDB's closed-form `regr_slope`/`regr_intercept`
  * reproduces the coefficients; predictions are `intercept + slope·x`.
  * Outputs are rounded (2dp predictions, 4dp coefficients) so the two
  * engines' different summation orders cannot flip a compare bit.
  *
  * Scale notes (100 TB): training reduces to X'X/X'y statistics — one
  * map-side-combined aggregation pass, no iteration with the normal
  * solver; inference is a pure projection (no shuffle), and the model is
  * broadcast to executors by spark.ml automatically. The model directory
  * is written once from the driver (S9) and memoized per-JVM (S10).
  */
object PriceModel {

  /** Training set: tumbling 1-min silver bars, unrounded, with the
    * reference's training filter (`train_model.py:30`). Shared verbatim
    * by the Spark query and (re-expressed) by the oracle SQL.
    */
  def trainingSet(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("day", col("ts")).as("window_start"), col("event_type"))
      .agg(
        coalesce(stddev_pop(col("value")), lit(0.0)).as("volatility"),
        avg(col("value")).as("average_price"))
      .filter(col("average_price") > 0 && col("volatility") >= 0)

  private val assembler = new VectorAssembler()
    .setInputCols(Array("volatility")).setOutputCol("features")

  /** M1+M2: assemble features, exact-OLS fit (min-rows guard as the
    * reference's `train_model.py:31-36`).
    */
  def train(bars: DataFrame): LinearRegressionModel = {
    require(bars.count() >= 5, "need >= 5 training rows")
    new LinearRegression()
      .setFeaturesCol("features").setLabelCol("average_price")
      .setSolver("normal").setRegParam(0.0)
      .fit(assembler.transform(bars))
  }

  /** S9+S10: persist then lazily re-load the model, memoized per JVM
    * keyed by path (the reference's global `ml_model`). `model` is
    * by-name so a cache hit skips the fit too — the reference trains
    * once out-of-band and every consumer only loads (`train_model.py`
    * run manually; `process_silver.py:27-41` loads into a global).
    */
  private val cache = scala.collection.concurrent.TrieMap.empty[String, LinearRegressionModel]

  /** Evict the per-path model memo (see [[graft.Caches]]): driver-heap
    * objects only; the next consumer re-loads from the persisted path.
    */
  private[graft] def clearCache(): Unit = cache.clear()
  def saveAndLoad(model: => LinearRegressionModel, path: String): LinearRegressionModel =
    cache.getOrElseUpdate(path, {
      model.write.overwrite().save(path)
      LinearRegressionModel.load(path)
    })

  /** The dir's trained+persisted+reloaded model (train-once-per-JVM). */
  def model(spark: SparkSession, dir: String): LinearRegressionModel =
    saveAndLoad(train(trainingSet(Tables.events(spark, dir))), modelPath(dir))

  /** M3+M5: inference with the reference's fault-tolerant fallback —
    * any failure yields `predicted_price = 0.0` (`process_silver.py:70-80`).
    */
  def withPrediction(bars: DataFrame, model: Option[LinearRegressionModel]): DataFrame = {
    val predicted = Try {
      val m = model.getOrElse(sys.error("no model"))
      m.transform(assembler.transform(bars))
        .withColumnRenamed("prediction", "predicted_price")
        .drop("features")
    }
    predicted.getOrElse(bars.withColumn("predicted_price", lit(0.0)))
  }

  /** End-to-end: train on the dir's events, persist+reload, predict. */
  def predictQuery(spark: SparkSession, dir: String): DataFrame = {
    val bars = trainingSet(Tables.events(spark, dir))
    withPrediction(bars, Some(model(spark, dir)))
      .select(
        col("window_start"), col("event_type"),
        round(col("volatility"), 6).as("volatility"),
        round(col("average_price"), 6).as("average_price"),
        round(col("predicted_price"), 2).as("predicted_price"))
  }

  private def modelPath(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_price_model_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  val predictOracle: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', ts)::TIMESTAMP AS window_start, event_type,
      |         coalesce(stddev_pop(value), 0) AS volatility,
      |         avg(value) AS average_price
      |  FROM events GROUP BY 1, 2
      |  HAVING avg(value) > 0 AND coalesce(stddev_pop(value), 0) >= 0
      |), fit AS (
      |  SELECT regr_slope(average_price, volatility) AS slope,
      |         regr_intercept(average_price, volatility) AS icept
      |  FROM bars
      |)
      |SELECT window_start, event_type,
      |       round(volatility, 6) AS volatility,
      |       round(average_price, 6) AS average_price,
      |       round(icept + slope * volatility, 2) AS predicted_price
      |FROM bars CROSS JOIN fit""".stripMargin

  /** M4: coefficient introspection (`model.coefficients`). */
  def coeffQuery(spark: SparkSession, dir: String): DataFrame = {
    val m = model(spark, dir)
    import spark.implicits._
    Seq((m.coefficients(0), m.intercept)).toDF("slope", "icept")
      .select(round(col("slope"), 4).as("slope"), round(col("icept"), 4).as("icept"))
  }

  val coeffOracle: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', ts)::TIMESTAMP AS window_start, event_type,
      |         coalesce(stddev_pop(value), 0) AS volatility,
      |         avg(value) AS average_price
      |  FROM events GROUP BY 1, 2
      |  HAVING avg(value) > 0 AND coalesce(stddev_pop(value), 0) >= 0
      |)
      |SELECT round(regr_slope(average_price, volatility), 4) AS slope,
      |       round(regr_intercept(average_price, volatility), 4) AS icept
      |FROM bars""".stripMargin

  /** M5 fallback path surfaced as its own query: no model ⇒ 0.0. */
  def fallbackQuery(spark: SparkSession, dir: String): DataFrame =
    withPrediction(trainingSet(Tables.events(spark, dir)), None)
      .groupBy(col("predicted_price"))
      .agg(count(lit(1)).as("n"))

  val fallbackOracle: String =
    """SELECT 0.0::DOUBLE AS predicted_price, count(*) AS n
      |FROM (
      |  SELECT 1 FROM events
      |  GROUP BY date_trunc('day', ts), event_type
      |  HAVING avg(value) > 0 AND coalesce(stddev_pop(value), 0) >= 0
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_predict" -> predictQuery _,
    "q_ml_coeffs" -> coeffQuery _,
    "q_ml_fallback" -> fallbackQuery _
  )

  def oracles: Map[String, String] = Map(
    "q_ml_predict" -> predictOracle,
    "q_ml_coeffs" -> coeffOracle,
    "q_ml_fallback" -> fallbackOracle
  )
}
