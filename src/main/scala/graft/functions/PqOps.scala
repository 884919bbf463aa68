package graft.functions

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native product-quantization kernels. The composed-column forms they
  * replace (`transform`-HOF argmin per subspace, `map_from_entries`
  * lookup per candidate) evaluate interpreted per codebook entry and
  * rebuild per-row maps; with m=8 subspaces × K codes × 8 dims that is
  * ~640 interpreted steps per row, and the unrolled expression tree is
  * wide enough that analysis + codegen dominate the whole query at
  * small SF. One JVM call per row replaces each tree — the same
  * HOF→native move as `graft_rankcells` / `graft_simhash64`.
  *
  * Determinism contract (shared with the DuckDB oracle and the column
  * form it replaces): per-subspace squared-L2 sums add left-to-right
  * over dimensions; subspace distance is rounded HALF_UP to 6 dp
  * exactly like Spark's `round`; the argmin tie-breaks on the smaller
  * code; the reconstruction error is the rounded sum of the rounded
  * per-subspace minima (s-major order). Distances are sums of squares,
  * so −0.0/NaN orderings never arise for finite inputs.
  */
object PqKernel {

  private[functions] def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Squared L2 of `e`'s subspace `s` against `cent`, left-to-right. */
  private def subDist(e: ArrayData, s: Int, sub: Int, cent: ArrayData): Double = {
    var dp = 0.0
    var i = 0
    while (i < sub) {
      val diff = e.getDouble(s * sub + i) - cent.getDouble(i)
      dp += diff * diff
      i += 1
    }
    dp
  }

  /** All m subspace assignments in one pass: codes[s] = argmin code by
    * (rounded dist, code), err = round6(Σ_s round6(min dist_s)).
    *
    * NaN rule (shared with `assignSeq` so the native expression and the
    * UDF fallback can never diverge): a NaN distance never wins the
    * argmin (strict comparisons are false for NaN); if EVERY distance
    * in a subspace is NaN the sentinel code Int.MaxValue is emitted and
    * err is +Infinity — a loud, greppable marker rather than an
    * arbitrary codebook entry.
    */
  def assign(e: ArrayData, cbs: ArrayData): InternalRow = {
    val m = cbs.numElements()
    val sub = e.numElements() / m
    val codes = new Array[Any](m)
    var errSum = 0.0
    var s = 0
    while (s < m) {
      val cb = cbs.getArray(s)
      val k = cb.numElements()
      var bestD = Double.PositiveInfinity
      var bestCode = Int.MaxValue
      var j = 0
      while (j < k) {
        val entry = cb.getStruct(j, 2)
        val d = round6(subDist(e, s, sub, entry.getArray(1)))
        val c = entry.getInt(0)
        if (d < bestD || (d == bestD && c < bestCode)) { bestD = d; bestCode = c }
        j += 1
      }
      codes(s) = bestCode
      errSum += bestD
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), round6(errSum)))
  }

  /** Asymmetric distance: Σ_s squaredL2(qe subspace s, sub-centroid of
    * codes[s]), s-major, UNROUNDED (callers round like the column form
    * they replace). Lookup is by code VALUE, not array position — a
    * code absent from a codebook yields null exactly like
    * `element_at(map_from_entries(cb), code)` would.
    */
  def adc(qe: ArrayData, codes: ArrayData, cbs: ArrayData): java.lang.Double = {
    val m = cbs.numElements()
    val sub = qe.numElements() / m
    var total = 0.0
    var s = 0
    while (s < m) {
      val cb = cbs.getArray(s)
      val k = cb.numElements()
      val want = codes.getInt(s)
      var cent: ArrayData = null
      var j = 0
      while (j < k && cent == null) {
        val entry = cb.getStruct(j, 2)
        if (entry.getInt(0) == want) cent = entry.getArray(1)
        j += 1
      }
      if (cent == null) return null
      total += subDist(qe, s, sub, cent)
      s += 1
    }
    total
  }

  // ---- JVM-collection twins for the UDF fallback path ----

  /** Mirrors `assign`'s argmin loop exactly — including the NaN rule
    * (skip NaN distances; all-NaN subspace → Int.MaxValue, +Infinity) —
    * a `.min` over (dist, code) tuples would instead pick a
    * NaN-distance code via total ordering when every distance is NaN.
    */
  def assignSeq(e: Seq[Double], cbs: Seq[Seq[(Int, Seq[Double])]]): (Seq[Int], Double) = {
    val m = cbs.length
    val sub = e.length / m
    var errSum = 0.0
    val codes = (0 until m).map { s =>
      var bestD = Double.PositiveInfinity
      var bestCode = Int.MaxValue
      cbs(s).foreach { case (code, cent) =>
        var dp = 0.0
        var i = 0
        while (i < sub) { val diff = e(s * sub + i) - cent(i); dp += diff * diff; i += 1 }
        val d = round6(dp)
        if (d < bestD || (d == bestD && code < bestCode)) { bestD = d; bestCode = code }
      }
      errSum += bestD
      bestCode
    }
    (codes, round6(errSum))
  }

  def adcSeq(qe: Seq[Double], codes: Seq[Int],
      cbs: Seq[Seq[(Int, Seq[Double])]]): Option[Double] = {
    val m = cbs.length
    val sub = qe.length / m
    var total = 0.0
    var s = 0
    while (s < m) {
      cbs(s).find(_._1 == codes(s)) match {
        case Some((_, cent)) =>
          var dp = 0.0
          var i = 0
          while (i < sub) { val diff = qe(s * sub + i) - cent(i); dp += diff * diff; i += 1 }
          total += dp
        case None => return None
      }
      s += 1
    }
    Some(total)
  }
}

/** `graft_pqassign(e, cbs)` → struct<codes: array<int>, err: double>.
  * `cbs` is the array of m code-ordered subspace codebooks, each
  * `array<struct<code: int, c: array<double>>>`.
  */
case class PqAssign(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = PqAssign.outType
  override def prettyName: String = "graft_pqassign"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(StructType(f), _), _))
        if f.length == 2 && f(0).dataType == IntegerType &&
          (f(1).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pqassign expects (array<double>, array<array<struct<int, array<double>>>>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.assign(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernel.assign($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAssign {
  val outType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err", DoubleType, nullable = false)))
}

/** `graft_pqadc(qe, codes, cbs)` → double (null on a code miss). */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pqadc"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _),
          ArrayType(ArrayType(StructType(f), _), _))
          if f.length == 2 && f(0).dataType == IntegerType &&
            (f(1).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_pqadc expects (array<double>, array<int>, array<array<struct<int, " +
          s"array<double>>>>), got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqKernel.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      // freshName: nullSafeExec emits this UNWRAPPED for non-nullable
      // children, so a fixed name would collide when one projection
      // holds two graft_pqadc calls
      val res = ctx.freshName("adcRes")
      s"""
         |java.lang.Double $res = graft.functions.PqKernel.adc($a, $b, $c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level entry points with the native-vs-fallback split. */
object PqOps {

  private def rowCbs(cbs: Seq[Seq[Row]]): Seq[Seq[(Int, Seq[Double])]] =
    cbs.map(_.map(r => (r.getInt(0), r.getSeq[Double](1))))

  private val assignUdf = udf((e: Seq[Double], cbs: Seq[Seq[Row]]) =>
    PqKernel.assignSeq(e, rowCbs(cbs)) match {
      case (codes, err) => PqPicked(codes, err)
    })

  private val adcUdf = udf((qe: Seq[Double], codes: Seq[Int], cbs: Seq[Seq[Row]]) =>
    PqKernel.adcSeq(qe, codes, rowCbs(cbs)))

  def pqAssign(spark: SparkSession, e: Column, cbs: Column): Column =
    if (spark.catalog.functionExists("graft_pqassign"))
      call_function("graft_pqassign", e, cbs)
    else assignUdf(e, cbs)

  def pqAdc(spark: SparkSession, qe: Column, codes: Column, cbs: Column): Column =
    if (spark.catalog.functionExists("graft_pqadc"))
      call_function("graft_pqadc", qe, codes, cbs)
    else adcUdf(qe, codes, cbs)
}

/** UDF-fallback result shape — field names mirror `PqAssign.outType`. */
case class PqPicked(codes: Seq[Int], err: Double)
