package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** `graft_dv_agg(posCol)` → the group's row ordinals as PORTABLE
  * RoaringBitmapArray bytes (the Delta deletion-vector payload,
  * [[graft.sources.DeletionVectors]]) — built EXECUTOR-side so a
  * delete-position fold ships one KB-scale bitmap per file to the
  * driver instead of O(deleted rows) `(file, pos)` tuples.
  *
  * Why this exists (the 100 TB shape): a Flink-style merge-on-read
  * Iceberg table ACCUMULATES delete files between compactions, so any
  * per-snapshot fold that collects matched positions grows with table
  * history, not change size. With this aggregate the positions never
  * leave the executors as rows: partial buffers combine map-side
  * (ObjectHashAggregate), the shuffle carries one compact sketch per
  * (partition, file), and the driver's collect is O(affected files)
  * rows whose payloads are the serialized bitmaps the scan broadcasts
  * back out verbatim.
  *
  * Buffer and shuffle form reuse the exact-distinct sketch machinery
  * ([[SetSketchAggBase]]: open-addressing long set in flight,
  * sorted-delta varints between stages); only the FINAL eval differs —
  * it emits the roaring serialization instead of the sketch codec, so
  * callers hand the result straight to a DV descriptor. Empty groups
  * (never produced by groupBy, but reachable via global agg over zero
  * rows) evaluate to null — there is no empty roaring bitmap in the
  * spec's serialization.
  */
case class DvBitmapAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends SetSketchAggBase {
  override def prettyName: String = "graft_dv_agg"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dv_agg expects an integral row ordinal, got ${other.simpleString}")
  }
  override def update(buffer: LongHashSet, input: InternalRow): LongHashSet = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Number].longValue
      require(pos >= 0, s"graft_dv_agg: negative row ordinal $pos")
      buffer.add(pos)
    }
    buffer
  }
  override def eval(buffer: LongHashSet): Any = {
    val vals = buffer.toSortedArray
    if (vals.isEmpty) null
    else graft.sources.DeletionVectors.serialize(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): DvBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DvBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DvBitmapAgg =
    copy(child = newChild)
}

object DvBitmapAgg {
  /** Column form for the engine's internal folds — wraps the raw
    * aggregate directly, so it works on ANY session (the foreign-table
    * tails run under whatever session the user owns; function-registry
    * registration is not guaranteed there). */
  def dvAgg(pos: Column): Column =
    Bridge.column(
      DvBitmapAgg(Bridge.expression(pos)).toAggregateExpression())
}
