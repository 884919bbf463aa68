package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A WHOLE-OPERATOR Catalyst extension — preference order (c) of the
  * design brief: custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * (see `functions.GraftExtensions`). The operator is the backward
  * as-of join (each left row picks the latest right row with equal
  * key and time at-or-before its own — DuckDB `ASOF LEFT JOIN`,
  * kdb `aj`), which Spark has no native operator for.
  *
  * Why a physical operator when `TemporalJoins.asofClickPurchase`
  * already composes the same result from union+window: the composed
  * plan must materialize left∪right and sort the UNION; the native
  * exec declares the same requirements a shuffled join does
  * (`ClusteredDistribution` per side + per-side (key, time) ordering)
  * and then streams BOTH sorted sides through one merge pass —
  * per-partition memory is O(1) (one carried right row), not a
  * window buffer, and each side is shuffled/sorted alone, never as a
  * widened union. `EnsureRequirements` plants the two exchanges and
  * sorts exactly as it would for a sort-merge join, so AQE
  * coalescing and reuse apply unchanged.
  *
  * Scale shape at 100 TB: identical to a sort-merge join on the key —
  * one shuffle per side, sorted merge per partition, no state beyond
  * the carried row; time-ordered parquet layout makes the sort
  * partial. Skewed keys salt exactly like any shuffled join.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  // right side is null-extended when a left row has no match
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical `AsOfJoin` to its physical exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join.
  *
  * Requirements (what `EnsureRequirements` enforces, same as SMJ):
  * both children clustered on their keys (co-partitioned hash
  * exchanges) and sorted by (keys…, time) ascending. The merge then
  * consumes each partition's two sorted streams once: right rows are
  * consumed while their (key, time) is at-or-before the current left
  * row's, the last key-equal consumed row is carried as the match
  * candidate, and each left row emits with the carried row iff its
  * key matches (ties on equal time match, i.e. `>=` semantics; rows
  * with a null key never match, like any equi-join).
  *
  * Determinism caveat (same as DuckDB ASOF): if the right side holds
  * several rows with identical (key, time), the last in sort order
  * wins — pre-dedup the right side for a total contract.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      // bind the right side AS NULLABLE: the carried row is replaced by
      // an all-null row on no-match, and binding against a non-nullable
      // upstream attribute would elide the null check (emitting 0/false
      // instead of null for primitive columns)
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // carried candidate: the latest right row consumed with a
      // non-null key (its key may or may not equal the current left's)
      var lastR: InternalRow = null
      var lastRKey: InternalRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l)
        // SQL comparison semantics: a NULL key or NULL time on either
        // side never matches (null-time rights are consumed but never
        // become candidates; they sort first in their key group, so
        // discarding them preserves the merge invariant)
        if (!lk.anyNull && !ltRow.isNullAt(0)) {
          val lt = ltRow.getLong(0)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val rtRow = rTimeProj(rBuf.head)
            val c = if (rk.anyNull || rtRow.isNullAt(0)) -1
              else keyOrd.compare(rk, lk)
            if (c < 0) {
              rBuf.next() // behind the current key: can never match again
            } else if (c == 0 && rtRow.getLong(0) <= lt) {
              lastRKey = rk.copy()
              lastR = rBuf.next().copy()
            } else {
              advance = false // ahead of (key, time): keep for later lefts
            }
          }
        }
        val matched = !lk.anyNull && !ltRow.isNullAt(0) && lastRKey != null &&
          keyOrd.compare(lKeyProj(l), lastRKey) == 0
        resultProj(joined(l, if (matched) lastR else nullRight))
      }
    }
  }
}

/** Public API over the operator + the oracle-checked query. */
object AsOfJoinOp {

  /** Backward as-of join of `left` and `right` on `leftKey = rightKey`
    * with `rightTime <= leftTime` (latest such right row wins). Column
    * NAMES on the two sides should be disjoint (rename before joining);
    * attribute IDs are re-aliased internally so self-joins of the same
    * source table are safe.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    // registration is normally GraftExtensions.injectPlannerStrategy;
    // self-heal through the public experimental hook so the operator
    // also plans on a vanilla session. The check goes through the
    // PLANNER's strategy list (covers both registration paths — an
    // extensions-configured session must not get a duplicate), under a
    // lock because extraStrategies assignment is read-modify-write.
    AsOfJoinOp.regLock.synchronized {
      if (!org.apache.spark.sql.graft.Bridge.hasStrategy(spark, AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right: both inputs often derive from the
    // same table, and duplicate attribute ids across the two sides
    // would make the hand-built plan ambiguous (the classic self-join
    // hazard the Dataset API handles in its analyzer rules)
    val rAliases = right.queryExecution.analyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    def pick(out: Seq[Attribute], name: String): Attribute =
      out.filter(_.name == name) match {
        case Seq(one) => one
        case Seq() =>
          sys.error(s"asof: no column '$name' in ${out.map(_.name).mkString(", ")}")
        case many => // never resolve an ambiguous reference silently
          sys.error(s"asof: column '$name' is ambiguous (${many.length} matches) " +
            s"in ${out.map(_.name).mkString(", ")}")
      }
    val (lk, rk) = (pick(lPlan.output, leftKey), pick(rPlan.output, rightKey))
    val (lt, rt) = (pick(lPlan.output, leftTime), pick(rPlan.output, rightTime))
    // fail fast on types the merge would silently misread: the key
    // ordering is built from the LEFT types and applied to both sides,
    // and time values are read as raw longs
    require(lk.dataType == rk.dataType,
      s"asof: key types differ (${lk.dataType.simpleString} vs ${rk.dataType.simpleString})")
    val longBacked: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.TimestampType,
      org.apache.spark.sql.types.TimestampNTZType,
      org.apache.spark.sql.types.LongType)
    require(lt.dataType == rt.dataType && longBacked.contains(lt.dataType),
      s"asof: time columns must both be timestamp or bigint " +
        s"(got ${lt.dataType.simpleString}, ${rt.dataType.simpleString})")
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan, Seq(lk), Seq(rk), lt, rt))
  }

  private[plans] val regLock = new Object
}
