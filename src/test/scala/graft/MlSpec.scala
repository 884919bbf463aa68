package graft

import org.apache.spark.sql.DataFrame

import graft.ml.PriceModel

/** ML train/infer semantics (SURVEY §2.9): exact OLS recovery on
  * noiseless data, the min-rows guard, and the 0.0 fallback.
  */
class MlSpec extends SparkSpec {

  private def bars(rows: (Double, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("volatility", "average_price")
  }

  test("exact OLS: recovers y = 2x + 5 from noiseless points") {
    val m = PriceModel.train(bars((1.0, 7.0), (2.0, 9.0), (3.0, 11.0), (4.0, 13.0), (5.0, 15.0)))
    assert(math.abs(m.coefficients(0) - 2.0) < 1e-9)
    assert(math.abs(m.intercept - 5.0) < 1e-9)
  }

  test("min-rows guard refuses tiny training sets (train_model.py:34-36)") {
    intercept[IllegalArgumentException] {
      PriceModel.train(bars((1.0, 2.0), (2.0, 3.0)))
    }
  }

  test("prediction fallback fills 0.0 when no model exists") {
    val out = PriceModel.withPrediction(bars((1.0, 7.0)), None).head()
    assert(out.getDouble(out.fieldIndex("predicted_price")) == 0.0)
  }

  test("transform adds predictions matching intercept + slope * x") {
    val m = PriceModel.train(bars((1.0, 7.0), (2.0, 9.0), (3.0, 11.0), (4.0, 13.0), (5.0, 15.0)))
    val out = PriceModel.withPrediction(bars((10.0, 0.0)), Some(m)).head()
    assert(math.abs(out.getDouble(out.fieldIndex("predicted_price")) - 25.0) < 1e-6)
  }
}
