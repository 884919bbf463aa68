package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable EXACT distinct sketch — the re-aggregatable rollup
  * primitive (Kylin/Druid's "exact count-distinct bitmap", done
  * Spark-natively).
  *
  * The 100 TB pattern this enables: materialize a fine-grain cube ONCE
  * (e.g. per (dimension, hour): `graft_set_agg(user_id)`), then answer
  * distinct-counts at ANY coarser grain — day, month, whole dimension —
  * by merging the stored partials (`graft_set_card(graft_set_merge(
  * sketch))`) without ever rescanning the fact table. Plain
  * `count(distinct)` results can't be re-aggregated (distinct counts
  * don't add); the sketch is the re-aggregatable form, and unlike HLL
  * it is EXACT, so cube answers hash-match a direct query.
  *
  * Representation: a value is a 64-bit key (callers hash wider types
  * first — `xxhash64` — the standard practice; ids that are already
  * integral stay exact). In-flight state is an open-addressing long
  * hash set; the serialized sketch is `[varint n][zigzag-varint v0]
  * [varint delta...]` over the SORTED values — deltas of sorted ids
  * compress to ~1–2 bytes each on dense id spaces, and cardinality is
  * the header varint, O(1) to read. Map-side partial aggregation
  * applies as with any ImperativeAggregate (ObjectHashAggregate), so
  * the shuffle carries one sketch per group per partition, not rows.
  */
object SetSketch {

  // -------------------------------------------------- varint codec

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Unsigned LEB128 read; returns (value, next offset). */
  private def readVarint(bytes: Array[Byte], offset: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = offset
    while (true) {
      val b = bytes(i)
      v |= (b & 0x7fL) << shift
      i += 1
      if ((b & 0x80) == 0) return (v, i)
      shift += 7
    }
    sys.error("unreachable")
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Serialize a buffer: sorted values, zigzag head + positive deltas. */
  def encode(s: LongHashSet): Array[Byte] = {
    val vals = s.toSortedArray
    val out = new java.io.ByteArrayOutputStream(vals.length * 2 + 8)
    writeVarint(out, vals.length.toLong)
    var i = 0
    var prev = 0L
    while (i < vals.length) {
      if (i == 0) writeVarint(out, zigzag(vals(0)))
      else writeVarint(out, vals(i) - prev) // sorted distinct: >= 1
      prev = vals(i)
      i += 1
    }
    out.toByteArray
  }

  /** O(1): the cardinality is the sketch's header varint. Called from
    * generated code — keep the signature static-friendly. */
  def cardinality(bytes: Array[Byte]): Long = readVarint(bytes, 0)._1

  /** Decode every value into `into` (merge path). */
  def decodeInto(bytes: Array[Byte], into: LongHashSet): Unit = {
    val (n, o0) = readVarint(bytes, 0)
    var off = o0
    var prev = 0L
    var i = 0L
    while (i < n) {
      val (raw, next) = readVarint(bytes, off)
      off = next
      prev = if (i == 0L) unzigzag(raw) else prev + raw
      into.add(prev)
      i += 1
    }
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val s = new LongHashSet()
    decodeInto(bytes, s)
    s.toSortedArray
  }
}

/** Open-addressing long hash set (0 kept out-of-table behind a flag so
  * the empty slot sentinel stays cheap). Linear probing, load ≤ 0.5,
  * splitmix-style finalizer for the probe hash.
  */
final class LongHashSet(initCap: Int = 16) extends Serializable {
  private var cap = Integer.highestOneBit(math.max(16, initCap) * 2 - 1)
  private var table = new Array[Long](cap)
  private var hasZero = false
  private var n = 0

  private def slot(x: Long): Int = {
    var h = x * -0x61c8864680b583ebL // splitmix64 multiplier
    h ^= h >>> 32
    (h & (cap - 1)).toInt
  }

  def add(v: Long): Unit = {
    if (v == 0L) { hasZero = true; return }
    var i = slot(v)
    while (true) {
      val cur = table(i)
      if (cur == v) return
      if (cur == 0L) {
        table(i) = v
        n += 1
        if (n * 2 > cap) grow()
        return
      }
      i = (i + 1) & (cap - 1)
    }
  }

  private def grow(): Unit = {
    val old = table
    cap <<= 1
    table = new Array[Long](cap)
    n = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
  }

  def merge(other: LongHashSet): Unit = {
    if (other.hasZero) hasZero = true
    var i = 0
    while (i < other.table.length) {
      if (other.table(i) != 0L) add(other.table(i))
      i += 1
    }
  }

  def size: Int = n + (if (hasZero) 1 else 0)

  def toSortedArray: Array[Long] = {
    val out = new Array[Long](size)
    var k = 0
    if (hasZero) { out(0) = 0L; k = 1 }
    var i = 0
    while (i < table.length) {
      if (table(i) != 0L) { out(k) = table(i); k += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }
}

/** `graft_set_agg(longCol)` → binary sketch of the group's distinct
  * values. Shared base for the build and merge aggregates (they differ
  * only in how `update` feeds the buffer).
  */
abstract class SetSketchAggBase extends TypedImperativeAggregate[LongHashSet]
    with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false // empty group → empty sketch
  override def createAggregationBuffer(): LongHashSet = new LongHashSet()
  override def merge(buffer: LongHashSet, other: LongHashSet): LongHashSet = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: LongHashSet): Any = SetSketch.encode(buffer)
  override def serialize(buffer: LongHashSet): Array[Byte] = SetSketch.encode(buffer)
  override def deserialize(bytes: Array[Byte]): LongHashSet = {
    val s = new LongHashSet()
    SetSketch.decodeInto(bytes, s)
    s
  }
}

case class SetSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends SetSketchAggBase {
  override def prettyName: String = "graft_set_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_set_agg expects an integral key (hash wider types first, " +
        s"e.g. xxhash64), got ${other.simpleString}")
  }
  override def update(buffer: LongHashSet, input: InternalRow): LongHashSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].longValue)
    buffer
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): SetSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SetSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SetSketchAgg =
    copy(child = newChild)
}

/** `graft_set_merge(sketchCol)` → binary sketch: re-aggregates STORED
  * sketches to a coarser grain — the cube-rollup half of the pair.
  */
case class SetSketchMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends SetSketchAggBase {
  override def prettyName: String = "graft_set_merge"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_set_merge expects a binary sketch, got ${other.simpleString}")
  }
  override def update(buffer: LongHashSet, input: InternalRow): LongHashSet = {
    val v = child.eval(input)
    if (v != null) SetSketch.decodeInto(v.asInstanceOf[Array[Byte]], buffer)
    buffer
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): SetSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SetSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SetSketchMergeAgg =
    copy(child = newChild)
}

/** `graft_set_card(sketch)` → bigint: O(1) — reads the header varint,
  * never decodes the values. */
case class SetSketchCard(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_set_card"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_set_card expects a binary sketch, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SetSketch.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SetSketch.cardinality($c)")

  override protected def withNewChildInternal(newChild: Expression): SetSketchCard =
    copy(child = newChild)
}
