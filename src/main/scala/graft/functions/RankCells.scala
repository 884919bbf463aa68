package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native codebook ranking for IVF/k-means cell routing: given a row's
  * vector and the broadcast codebook (`array<struct<cell, ce, cnrm>>`),
  * returns the cell ids ordered by (rounded cosine DESC, cell ASC) —
  * the whole 25-cell × 64-dim scoring loop as ONE JVM call per row
  * inside whole-stage codegen.
  *
  * Why not `sort_array(transform(cb, ...))`: Spark's higher-order
  * functions evaluate interpreted — a lambda dispatch per codebook
  * entry, with the dot product re-entering the interpreter per element.
  * Per corpus pass that is rows × cells × dim interpreted steps; this
  * expression was measured 2-3× faster on the k-means bench (the same
  * HOF→native move as `graft_simhash64` / `graft_minhash8`).
  *
  * Determinism contract (shared with the DuckDB oracle): cosine =
  * dot(e, ce) / (||e|| · cnrm) with left-to-right summation, rounded
  * HALF_UP to 6 dp exactly like Spark's `round`, ranked with a cell-id
  * tie-break; −0.0 normalizes to 0.0 so the sort matches SQL's
  * −0.0 == 0.0 total order. A NaN cosine (zero-norm vector or
  * centroid) ranks FIRST — both Spark SQL and DuckDB treat NaN as
  * greater than every value in an ORDER BY cos DESC, so the native
  * comparator must too.
  */
case class RankCells(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rankcells"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(StructType(f), _))
        if f.length == 3 && f(0).dataType == LongType &&
          (f(1).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
          f(2).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_rankcells expects (array<double>, array<struct<bigint, array<double>, double>>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RankCells.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.RankCells.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RankCells {

  /** Spark `round(x, 6)` twin: HALF_UP over the double's decimal
    * (shortest-string) representation; NaN/±Infinity pass through like
    * Spark's round (BigDecimal.valueOf would throw on them — a
    * zero-norm vector or centroid must degrade gracefully, not kill
    * the job).
    */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Ascending sort key for a NEGATED cosine `v = -cos`, reproducing
    * SQL's `ORDER BY cos DESC` total order: NaN above +Infinity above
    * every finite value (both Spark SQL and DuckDB), so here NaN → −∞,
    * cos = +∞ (v = −∞) → just above it, and −0.0 normalizes to 0.0 to
    * match SQL's −0.0 == 0.0.
    */
  private[functions] def sortKey(v: Double): Double =
    if (java.lang.Double.isNaN(v)) Double.NegativeInfinity
    else if (v == Double.NegativeInfinity) -Double.MaxValue
    else if (v == 0.0) 0.0
    else v

  /** Called from generated code — scores and ranks the codebook in one
    * pass over compact primitive arrays.
    */
  def compute(e: ArrayData, cb: ArrayData): ArrayData = {
    val n = e.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = e.getDouble(i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val m = cb.numElements()
    val neg = new Array[Double](m)
    val cells = new Array[Long](m)
    var j = 0
    while (j < m) {
      val row = cb.getStruct(j, 3)
      val ce = row.getArray(1)
      val d = math.min(n, ce.numElements())
      var dp = 0.0
      var t = 0
      while (t < d) { dp += e.getDouble(t) * ce.getDouble(t); t += 1 }
      val v = -round6(dp / (nrm * row.getDouble(2)))
      neg(j) = RankCells.sortKey(v)
      cells(j) = row.getLong(0)
      j += 1
    }
    val idx = new Array[java.lang.Integer](m)
    j = 0
    while (j < m) { idx(j) = j; j += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[java.lang.Integer] {
      override def compare(a: java.lang.Integer, b: java.lang.Integer): Int = {
        val c = java.lang.Double.compare(neg(a), neg(b))
        if (c != 0) c else java.lang.Long.compare(cells(a), cells(b))
      }
    })
    val out = new Array[Any](m)
    j = 0
    while (j < m) { out(j) = cells(idx(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** JVM-collection twin for the UDF fallback path. */
  def computeSeq(e: Seq[Double], cb: Seq[(Long, Seq[Double], Double)]): Seq[Long] = {
    val nrm = math.sqrt(e.foldLeft(0.0)((acc, x) => acc + x * x))
    cb.map { case (cell, ce, cnrm) =>
      val d = math.min(e.length, ce.length)
      var dp = 0.0
      var t = 0
      while (t < d) { dp += e(t) * ce(t); t += 1 }
      val v = -round6(dp / (nrm * cnrm))
      (sortKey(v), cell)
    }.sortBy(identity).map(_._2)
  }
}

/** Column-level entry point with the same native-vs-fallback split as
  * `VectorOps.dot`.
  */
object RankCellsOps {

  private val rankUdf = udf((e: Seq[Double], cb: Seq[Row]) =>
    RankCells.computeSeq(e,
      cb.map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))))

  def rankCells(spark: SparkSession, e: Column, cb: Column): Column =
    if (spark.catalog.functionExists("graft_rankcells"))
      call_function("graft_rankcells", e, cb)
    else rankUdf(e, cb)
}
