package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native word n-gram generation over a token array: all grams at
  * positions 0..max(len−n, 0), space-joined with nulls skipped — the
  * exact semantics of the column formulation
  * `transform(sequence(0, greatest(size(arr)-n, 0)), i -> concat_ws(' ',
  * get(arr, i), …))`, which pays an interpreted lambda dispatch (plus a
  * fresh concat) per gram per document. One JVM pass per row instead;
  * order-preserving and non-distinct so callers choose between
  * `array_distinct(...)` (decontamination collision sets) and raw gram
  * counts (repetition ratios).
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects (array<string>, n >= 1), got (${other.simpleString}, $n)")
  }

  override protected def nullSafeEval(a: Any): Any =
    NGrams.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGrams {

  /** Called from generated code — one pass over the token array. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val last = math.max(len - n, 0)
    val out = new Array[Any](last + 1)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder
      var k = 0
      var first = true
      while (k < n) {
        if (i + k < len && !arr.isNullAt(i + k)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(i + k).toString)
          first = false
        }
        k += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** JVM-collection twin for the UDF fallback path. */
  def computeSeq(tokens: Seq[String], n: Int): Seq[String] = {
    val len = tokens.length
    (0 to math.max(len - n, 0)).map { i =>
      (0 until n).flatMap(k =>
        if (i + k < len && tokens(i + k) != null) Some(tokens(i + k)) else None)
        .mkString(" ")
    }
  }
}

/** Column-level entry point with the native-vs-fallback split. */
object NGramsOps {

  private def ngramsUdf(n: Int) = udf((ts: Seq[String]) => NGrams.computeSeq(ts, n))

  def ngrams(spark: SparkSession, tokens: Column, n: Int): Column =
    if (spark.catalog.functionExists("graft_ngrams"))
      call_function("graft_ngrams", tokens, lit(n))
    else ngramsUdf(n)(tokens)
}
