package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg PARTITION TRANSFORMS as native codegen expressions — the
  * value-domain halves of the spec's `bucket[N]` / `truncate[W]` /
  * `hours` / `months` / `years` transforms
  * (iceberg.apache.org/spec — Appendix B "32-bit Hash Requirements" for
  * bucket, "Partition Transforms" for the rest). A graft table declares
  * its partition column GENERATED as one of these (e.g.
  * `uid_bucket GENERATED ALWAYS AS (graft_iceberg_bucket(8, user_id))`,
  * the same pattern `event_day = CAST(ts AS DATE)` uses for `days`);
  * the Iceberg mirror then recognizes the generation expression and
  * records the REAL transform spec, so any spec-conformant planner can
  * derive partition pruning from predicates on the SOURCE column — the
  * key move for Flink-style bucket-distributed upsert tables.
  *
  * Everything evaluates inside whole-stage codegen (a static-call
  * `defineCodeGen` per expression, the [[SimHash64]] pattern) — these
  * run once per written row on 100 TB ingest paths.
  *
  * Hash conformance: `bucketHash` is canonical murmur3_x86_32 (seed 0)
  * over the spec's single-value byte serializations (int/long/date/
  * timestamp widen to 8-byte little-endian; strings hash their UTF-8
  * bytes). Pinned by the spec's own Appendix B test vectors in
  * IcebergSpec: 34L → 2017239379, "iceberg" → 1210000089,
  * date 2017-11-16 → −653330422, ts 2017-11-16T22:31:08 → −2047944441.
  */
object IcebergTransforms {

  /** Canonical murmur3_x86_32, seed 0 — the spec's required hash. */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = data.length & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Spec hash of an integral value (int/long/date-days/timestamp-
    * micros all widen to long, 8-byte little-endian). */
  def bucketHashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  /** Spec hash of a string (UTF-8 bytes, no length prefix). */
  def bucketHashUtf8(s: UTF8String): Int = murmur3(s.getBytes)

  def bucketLong(n: Int, v: Long): Int =
    (bucketHashLong(v) & Integer.MAX_VALUE) % n

  def bucketUtf8(n: Int, s: UTF8String): Int =
    (bucketHashUtf8(s) & Integer.MAX_VALUE) % n

  /** Driver-side bucket of an already-decoded predicate value, typed by
    * the SOURCE column — the read path's half (prune a `src = X`
    * predicate to the one matching bucket tuple). None when the value's
    * runtime shape does not match the source type's spec serialization
    * (never prunes — sound): a string-SPELLED predicate on a date/long
    * bucket column (a spelling cmpBound accepts for ranges) must not
    * hash the string's bytes and prune the wrong bucket. */
  def bucketOf(n: Int, value: Any, dt: DataType): Option[Int] = value match {
    case null => None
    case v: Number => dt match {
      case IntegerType | LongType | DateType | TimestampType
          | TimestampNTZType => Some(bucketLong(n, v.longValue))
      case _ => None // float/double buckets are spec'd but meaningless keys
    }
    case s: String if dt == StringType => Some((murmur3(
      s.getBytes(StandardCharsets.UTF_8)) & Integer.MAX_VALUE) % n)
    case s: UTF8String if dt == StringType => Some(bucketUtf8(n, s))
    case _ => None
  }

  /** `truncate[W]` of an integral: `v - (((v % W) + W) % W)` — floor to
    * a multiple of W, negative-correct (the spec's definition). */
  def truncateLong(w: Int, v: Long): Long = v - (((v % w) + w) % w)

  /** `truncate[W]` of a string: the first W CODEPOINTS (the spec is
    * explicit that W counts Unicode codepoints, not UTF-16 chars). */
  def truncateUtf8(w: Int, s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.codePointCount(0, str.length) <= w) s
    else UTF8String.fromString(
      str.substring(0, str.offsetByCodePoints(0, w)))
  }

  /** `hours(ts)`: hours from 1970-01-01 00:00:00 UTC, floor division
    * (negative-correct for pre-epoch timestamps). */
  def hoursOf(micros: Long): Int =
    Math.floorDiv(micros, 3600000000L).toInt

  /** `months(ts)`: months from 1970-01, UTC calendar arithmetic. */
  def monthsOfMicros(micros: Long): Int = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
    (ldt.getYear - 1970) * 12 + (ldt.getMonthValue - 1)
  }

  def monthsOfDays(epochDays: Int): Int = {
    val ld = java.time.LocalDate.ofEpochDay(epochDays.toLong)
    (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
  }

  /** `years(ts)`: years from 1970, UTC calendar arithmetic. */
  def yearsOfMicros(micros: Long): Int =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
      .getYear - 1970

  def yearsOfDays(epochDays: Int): Int =
    java.time.LocalDate.ofEpochDay(epochDays.toLong).getYear - 1970

  /** The UTC micros range `[start, end)` a temporal-transform tuple
    * value covers — the read path's pruning half for predicates on the
    * SOURCE timestamp ("days" dates serialize as epoch-days ints, so
    * days shares the int domain). */
  def temporalRangeMicros(transform: String, v: Long): Option[(Long, Long)] =
    transform match {
      case "hours" | "hour" =>
        Some((v * 3600000000L, (v + 1) * 3600000000L))
      case "days" | "day" =>
        Some((v * 86400000000L, (v + 1) * 86400000000L))
      case "months" | "month" =>
        val start = java.time.LocalDate.of(
          1970 + Math.floorDiv(v, 12L).toInt,
          Math.floorMod(v, 12L).toInt + 1, 1)
        Some((start.toEpochDay * 86400000000L,
          start.plusMonths(1).toEpochDay * 86400000000L))
      case "years" | "year" =>
        val start = java.time.LocalDate.of(1970 + v.toInt, 1, 1)
        Some((start.toEpochDay * 86400000000L,
          start.plusYears(1).toEpochDay * 86400000000L))
      case _ => None
    }

  private[functions] def requireIntegralWidth(e: Expression,
      what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType)
        if v > 0 => v
    case _ => sys.error(s"$what expects a positive integer literal width")
  }

  /** ANALYSIS-time width validation shared by bucket/truncate: the
    * interpreted and codegen paths must agree, and a zero/negative or
    * non-literal width must fail at plan time, not per-row (codegen
    * embeds the operand directly — `% 0` would throw mid-query). */
  private[functions] def checkWidth(e: Expression,
      what: String): Option[TypeCheckResult] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) =>
      if (v > 0) None
      else Some(TypeCheckResult.TypeCheckFailure(
        s"$what expects a POSITIVE width, got $v"))
    case _ => Some(TypeCheckResult.TypeCheckFailure(
      s"$what expects an integer LITERAL width"))
  }
}

/** `graft_iceberg_bucket(N, col)` → int: the spec's `bucket[N]`
  * partition value. Sources: int/long/date/timestamp (widen to long)
  * and string. */
case class IcebergBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val n = IcebergTransforms.requireIntegralWidth(
    left, "graft_iceberg_bucket")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_iceberg_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType | LongType | DateType | TimestampType
          | TimestampNTZType | StringType) =>
        IcebergTransforms.checkWidth(left, "graft_iceberg_bucket")
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_iceberg_bucket expects (int literal N, " +
          s"int/long/date/timestamp/string), got (${l.simpleString}, " +
          s"${r.simpleString})")
    }

  override protected def nullSafeEval(nv: Any, v: Any): Any =
    right.dataType match {
      case StringType =>
        IcebergTransforms.bucketUtf8(n, v.asInstanceOf[UTF8String])
      case _ => IcebergTransforms.bucketLong(n, v.asInstanceOf[Number].longValue)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    right.dataType match {
      case StringType => defineCodeGen(ctx, ev, (nc, c) =>
        s"graft.functions.IcebergTransforms.bucketUtf8($nc, $c)")
      case _ => defineCodeGen(ctx, ev, (nc, c) =>
        s"graft.functions.IcebergTransforms.bucketLong($nc, (long) $c)")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `graft_iceberg_truncate(W, col)` → same type: the spec's
  * `truncate[W]` partition value (ints floor to a multiple of W,
  * strings keep their first W codepoints). */
case class IcebergTruncate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = right.dataType
  override def prettyName: String = "graft_iceberg_truncate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType | LongType | StringType) =>
        IcebergTransforms.checkWidth(left, "graft_iceberg_truncate")
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_iceberg_truncate expects (int literal W, int/long/string), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  private lazy val w = IcebergTransforms.requireIntegralWidth(
    left, "graft_iceberg_truncate")

  override protected def nullSafeEval(wv: Any, v: Any): Any =
    right.dataType match {
      case StringType => IcebergTransforms.truncateUtf8(w, v.asInstanceOf[UTF8String])
      case IntegerType => IcebergTransforms.truncateLong(w, v.asInstanceOf[Int].toLong).toInt
      case _ => IcebergTransforms.truncateLong(w, v.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    right.dataType match {
      case StringType => defineCodeGen(ctx, ev, (wc, c) =>
        s"graft.functions.IcebergTransforms.truncateUtf8($wc, $c)")
      case IntegerType => defineCodeGen(ctx, ev, (wc, c) =>
        s"(int) graft.functions.IcebergTransforms.truncateLong($wc, (long) $c)")
      case _ => defineCodeGen(ctx, ev, (wc, c) =>
        s"graft.functions.IcebergTransforms.truncateLong($wc, $c)")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Shared shape of the temporal transforms: timestamp (or date, where
  * the spec allows) → int in the transform's epoch-unit domain. */
abstract class IcebergTemporal extends UnaryExpression {
  override def dataType: DataType = IntegerType
  protected def allowDate: Boolean
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case DateType if allowDate => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a timestamp${if (allowDate) " or date" else ""}, " +
        s"got ${other.simpleString}")
  }
}

/** `graft_iceberg_hours(ts)` → int epoch-hours: the spec's `hours`. */
case class IcebergHours(child: Expression) extends IcebergTemporal {
  override def prettyName: String = "graft_iceberg_hours"
  override protected def allowDate: Boolean = false
  override protected def nullSafeEval(v: Any): Any =
    IcebergTransforms.hoursOf(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IcebergTransforms.hoursOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_iceberg_months(ts|date)` → int months-from-1970-01. */
case class IcebergMonths(child: Expression) extends IcebergTemporal {
  override def prettyName: String = "graft_iceberg_months"
  override protected def allowDate: Boolean = true
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType => IcebergTransforms.monthsOfDays(v.asInstanceOf[Int])
    case _ => IcebergTransforms.monthsOfMicros(v.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergTransforms.monthsOfDays($c)")
      case _ => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergTransforms.monthsOfMicros($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_iceberg_years(ts|date)` → int years-from-1970. */
case class IcebergYears(child: Expression) extends IcebergTemporal {
  override def prettyName: String = "graft_iceberg_years"
  override protected def allowDate: Boolean = true
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType => IcebergTransforms.yearsOfDays(v.asInstanceOf[Int])
    case _ => IcebergTransforms.yearsOfMicros(v.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergTransforms.yearsOfDays($c)")
      case _ => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergTransforms.yearsOfMicros($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
