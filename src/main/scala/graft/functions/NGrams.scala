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

/** Native minimum-md5 over an `array<string>`: the winnowing min-sketch
  * reduction (`list_min(list_transform(arr, md5))` in the oracle) as
  * one JVM pass — replaces an interpreted md5 lambda per element per
  * document. Returns null for an empty array.
  */
case class MinMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minmd5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minmd5 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    MinMd5.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinMd5.compute($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinMd5 {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Called from generated code — one md5 + compare per element. */
  def compute(arr: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    var min: String = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Hex(arr.getUTF8String(i).toString)
        if (min == null || h.compareTo(min) < 0) min = h
      }
      i += 1
    }
    if (min == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(min)
  }

  def computeSeq(xs: Seq[String]): Option[String] =
    xs.iterator.filter(_ != null).map(md5Hex).minOption
}

object MinMd5Ops {

  private val minMd5Udf = udf((xs: Seq[String]) => MinMd5.computeSeq(xs))

  def minMd5(spark: SparkSession, arr: Column): Column =
    if (spark.catalog.functionExists("graft_minmd5"))
      call_function("graft_minmd5", arr)
    else minMd5Udf(arr)
}
