package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst dot-product over two `array<double>` columns, with
  * whole-stage codegen — the hot inner loop of every cosine-similarity
  * operator.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * are evaluated on the interpreted path (a lambda dispatch per array
  * element); at N² candidate pairs × 64 dims that is billions of
  * interpreted calls. This expression generates a tight primitive
  * `double` loop inside WholeStageCodegen instead (preference order per
  * the design brief: built-in < custom codegen Expression < UDF).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering graft's native functions — wire with
  * `SparkSession.builder.withExtensions(GraftExtensions.register)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.register(ext)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  /** Registers graft's native functions plus public names for Spark's
    * internal runtime-filter expressions (`BloomFilterAggregate` /
    * `BloomFilterMightContain` — the exact expressions
    * `InjectRuntimeFilter` plants), so queries can build explicit
    * bloom-pruned joins (see relational.RuntimeFilters).
    */
  val register: SparkSessionExtensions => Unit = { ext =>
    ext.injectOptimizerRule(_ => graft.plans.PushTimeFilter)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash8"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash8"),
      (children: Seq[Expression]) => MinHashSigs(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "graft_ngrams"),
      (children: Seq[Expression]) => NGrams(children(0), children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"graft_ngrams n must be an int literal, got $other")
      })))
    ext.injectFunction((
      new FunctionIdentifier("graft_minmd5"),
      new ExpressionInfo(classOf[MinMd5].getName, "graft_minmd5"),
      (children: Seq[Expression]) => MinMd5(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantstats"),
      new ExpressionInfo(classOf[QuantStats].getName, "graft_quantstats"),
      (children: Seq[Expression]) => QuantStats(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_qvec"),
      new ExpressionInfo(classOf[QuantizeVec].getName, "graft_qvec"),
      (children: Seq[Expression]) => QuantizeVec(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_rankcells"),
      new ExpressionInfo(classOf[RankCells].getName, "graft_rankcells"),
      (children: Seq[Expression]) => RankCells(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pqassign"),
      new ExpressionInfo(classOf[PqAssign].getName, "graft_pqassign"),
      (children: Seq[Expression]) => PqAssign(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pqadc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pqadc"),
      (children: Seq[Expression]) => PqAdc(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_set_agg"),
      new ExpressionInfo(classOf[SetSketchAgg].getName, "graft_set_agg"),
      (children: Seq[Expression]) => SetSketchAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_set_merge"),
      new ExpressionInfo(classOf[SetSketchMergeAgg].getName, "graft_set_merge"),
      (children: Seq[Expression]) => SetSketchMergeAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_set_card"),
      new ExpressionInfo(classOf[SetSketchCard].getName, "graft_set_card"),
      (children: Seq[Expression]) => SetSketchCard(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "graft_iceberg_bucket"),
      (children: Seq[Expression]) => IcebergBucket(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_iceberg_truncate"),
      new ExpressionInfo(classOf[IcebergTruncate].getName, "graft_iceberg_truncate"),
      (children: Seq[Expression]) => IcebergTruncate(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_iceberg_hours"),
      new ExpressionInfo(classOf[IcebergHours].getName, "graft_iceberg_hours"),
      (children: Seq[Expression]) => IcebergHours(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_iceberg_months"),
      new ExpressionInfo(classOf[IcebergMonths].getName, "graft_iceberg_months"),
      (children: Seq[Expression]) => IcebergMonths(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_iceberg_years"),
      new ExpressionInfo(classOf[IcebergYears].getName, "graft_iceberg_years"),
      (children: Seq[Expression]) => IcebergYears(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dv_agg"),
      new ExpressionInfo(classOf[DvBitmapAgg].getName, "graft_dv_agg"),
      (children: Seq[Expression]) => DvBitmapAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new BloomFilterAggregate(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))))
  }
}

/** Column-level vector math. Uses the native `graft_dot` expression when
  * the session has graft's extensions; falls back to a JVM UDF (still
  * ~100× faster than interpreted higher-order lambdas) when handed a
  * vanilla session (e.g. the driver's own smoke harness).
  */
object VectorOps {

  private[graft] val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  })

  def dot(spark: SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_dot")) call_function("graft_dot", a, b)
    else dotUdf(a, b)

  /** L2 norm. Callers should materialize this as its OWN projected
    * column per row so each pairwise cosine costs a single dot product
    * (dot(a,b)/(na·nb)) instead of three.
    */
  def norm(spark: SparkSession, e: Column): Column = sqrt(dot(spark, e, e))
}
