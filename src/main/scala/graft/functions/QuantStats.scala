package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native int8-quantization statistics over an `array<double>` vector:
  * returns `[qscale, nmse]` where qscale = max(‖x‖∞, 1e-12)/127 and
  * nmse = Σ(x − round(x/qscale)·qscale)² / (n·qscale²) — one tight JVM
  * pass (codegen via the static `QuantStats.compute` call) instead of
  * two interpreted higher-order folds per row. At corpus scale the
  * interpreted lambdas are a per-element dispatch over every vector —
  * the same HOF hotspot `graft_simhash64`/`graft_minhash8` eliminated.
  *
  * Arithmetic mirrors the HOF formulation exactly: left-to-right max
  * then sum, the 1e-12 zero-vector guard, and HALF_UP rounding of the
  * code (the same BigDecimal op Spark's `round` applies to doubles),
  * so the DuckDB oracle comparison is unchanged.
  */
case class QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_quantstats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantstats expects array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    QuantStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantStats {

  /** The whole per-vector computation; static so generated code can
    * call it directly.
    */
  def compute(e: ArrayData): ArrayData = {
    val n = e.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val v = math.abs(e.getDouble(i)); if (v > m) m = v; i += 1 }
    if (m < 1e-12) m = 1e-12
    val scale = m / 127
    var sse = 0.0
    i = 0
    while (i < n) {
      val x = e.getDouble(i)
      val q = java.math.BigDecimal.valueOf(x / scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      val d = x - q * scale
      sse += d * d
      i += 1
    }
    val nmse = if (n == 0) 0.0 else sse / (n * scale * scale)
    new GenericArrayData(Array(scale, nmse))
  }

  private[graft] val quantUdf = udf((e: Seq[Double]) => {
    val n = e.length
    var m = 0.0
    var i = 0
    while (i < n) { val v = math.abs(e(i)); if (v > m) m = v; i += 1 }
    if (m < 1e-12) m = 1e-12
    val scale = m / 127
    var sse = 0.0
    i = 0
    while (i < n) {
      val q = java.math.BigDecimal.valueOf(e(i) / scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      val d = e(i) - q * scale
      sse += d * d
      i += 1
    }
    Seq(scale, if (n == 0) 0.0 else sse / (n * scale * scale))
  })

  /** Native expression when the session has graft's extensions, JVM-UDF
    * fallback otherwise (same pattern as `VectorOps.dot`).
    */
  def quantStats(spark: SparkSession, e: Column): Column =
    if (spark.catalog.functionExists("graft_quantstats")) call_function("graft_quantstats", e)
    else quantUdf(e)
}
