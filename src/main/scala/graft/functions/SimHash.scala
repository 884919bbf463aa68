package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `array<string>` token column: one md5
  * per token, 64 majority-vote counters, all inside a single tight JVM
  * loop per row — zero exchanges, whole-stage codegen (the generated
  * code calls the static `SimHash64.compute`).
  *
  * Bit definition (shared with the DuckDB oracle): for token t let
  * h1 = first 8 hex chars of md5(t) as uint32 and h2 = hex chars 9–16;
  * the token's 64-bit hash is h = h1·2³² + h2, and signature bit b is
  * the majority vote of bit b of h across the document's distinct
  * tokens (+1 if set, −1 if clear, set iff the sum is > 0).
  *
  * Why an Expression and not `aggregate(...)` folds: Spark's
  * higher-order functions evaluate on the interpreted path (a lambda
  * dispatch per element); 64 bits × tokens per doc made the previous
  * fold formulation the round-2 bench regression. This is the
  * preference order the design brief mandates: built-in < custom
  * codegen Expression < UDF.
  *
  * Why 64 bits and not 16: a 16-bit signature has 65,536 possible
  * values — at LLM-corpus scale (10⁸–10⁹ docs) every signature bucket
  * holds thousands of unrelated docs and hamming-distance near-dup
  * lookup stops discriminating. 64 bits gives 2⁶⁴ key cardinality, so
  * banded piece-joins stay selective at any corpus size.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 64-bit token hash = first 8 bytes of md5(bytes), big-endian (the
    * value a reader of the first 16 hex chars would parse).
    */
  private def tokenHash(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  private def finish(counts: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Called from generated code — one pass over the token array. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    finish(counts)
  }

  /** JVM-collection twin for the UDF fallback path. */
  def computeSeq(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      if (t != null) {
        val h = tokenHash(t.getBytes(StandardCharsets.UTF_8))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    finish(counts)
  }
}

/** Native MinHash signature bank over a token array: builds the
  * document's distinct word 3-gram shingles and all `numHashes` min-md5
  * signatures in ONE JVM pass per row (md5(shingle || "#i") for each
  * hash index, exactly the portable definition the DuckDB oracle
  * evaluates). Replaces `numHashes` interpreted
  * `array_min(transform(...))` lambdas per document — the same
  * interpreted-HOF hotspot the SimHash expression eliminated, and it
  * also removes any need to materialize (or cache) corpus-wide shingle
  * arrays just to derive signatures.
  *
  * Returns `array<string>` of length `MinHashSigs.numHashes` (sig_i at
  * position i+1).
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash8 expects array<string> tokens, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    MinHashSigs.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {

  val numHashes = 8   // k min-hash functions (bands derive from these)
  val shingleWidth = 3

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct word `shingleWidth`-grams, exactly mirroring the column
    * formulation: positions 0..max(len-width, 0), missing tokens
    * skipped (concat_ws semantics), order-preserving dedup.
    */
  def shingles(tokens: IndexedSeq[String]): IndexedSeq[String] = {
    val n = math.max(tokens.length - shingleWidth, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= n) {
      val sb = new StringBuilder
      var k = 0
      var first = true
      while (k < shingleWidth) {
        if (i + k < tokens.length && tokens(i + k) != null) {
          if (!first) sb.append(' ')
          sb.append(tokens(i + k))
          first = false
        }
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out.toIndexedSeq
  }

  def computeSeq(tokens: IndexedSeq[String]): Array[String] = {
    val md = mdLocal.get()
    val mins = new Array[String](numHashes)
    shingles(tokens).foreach { sh =>
      var i = 0
      while (i < numHashes) {
        val h = md5Hex(md, sh + "#" + i)
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
    }
    mins
  }

  /** Called from generated code — one pass over the token array. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val tokens = new Array[String](n)
    var i = 0
    while (i < n) {
      tokens(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    val res = computeSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(tokens))
    val out = new Array[Any](res.length)
    var j = 0
    while (j < res.length) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(res(j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-level entry point: native `graft_simhash64` when the session
  * has graft's extensions, JVM UDF fallback otherwise (same arithmetic,
  * still one tight loop per row — only loses codegen fusion).
  */
object SimHashOps {

  private val simhashUdf = udf((ts: Seq[String]) => SimHash64.computeSeq(ts))

  def simhash64(spark: SparkSession, tokens: Column): Column =
    if (spark.catalog.functionExists("graft_simhash64"))
      call_function("graft_simhash64", tokens)
    else simhashUdf(tokens)

  private val minhashUdf = udf((ts: Seq[String]) =>
    MinHashSigs.computeSeq(ts.toIndexedSeq).toSeq)

  def minhash8(spark: SparkSession, tokens: Column): Column =
    if (spark.catalog.functionExists("graft_minhash8"))
      call_function("graft_minhash8", tokens)
    else minhashUdf(tokens)
}
