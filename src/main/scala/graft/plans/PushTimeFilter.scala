package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Optimizer rule: push time predicates through the nanos→timestamp
  * derivation to the raw parquet column.
  *
  * The events table stores TIMESTAMP(NANOS), which `Tables.events`
  * reads as a raw bigint and converts with
  * `timestamp_micros(ts div 1000)`. A filter on the CONVERTED column is
  * `f(raw)` to the scan — parquet gets only `IsNotNull`, so a "last
  * hour of a 100 TB table" query reads every row group. The conversion
  * is monotonic, so each comparison against a timestamp literal IMPLIES
  * a raw-nanos range; this rule adds that implied conjunct, which the
  * datasource strategy then pushes into the parquet scan as a min/max
  * row-group (and page-index) prune. The original predicate stays — the
  * added conjunct is necessary-but-looser, never a replacement — so
  * semantics are preserved bit for bit even around the integer-division
  * truncation edge cases (negative nanos skip the rewrite entirely).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions) — the (c)-tier extension path: a
  * `Rule[LogicalPlan]` where composition can't express the semantics.
  */
object PushTimeFilter extends Rule[LogicalPlan] with PredicateHelper {

  /** Matches `timestamp_micros(raw div 1000)` over a bigint attribute —
    * the exact derivation `Tables.events` plants (after constant
    * folding normalizes the divisor literal).
    */
  private object NanosToTs {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => (d.left, d.right) match {
        case (a: AttributeReference, Literal(v, _)) if v == 1000L || v == 1000 => Some(a)
        case _ => None
      }
      case _ => None
    }
  }

  private val MaxSafeMicros = Long.MaxValue / 1000 - 1

  /** The implied raw-column conjunct, when one exists. Bounds require
    * c > 0 (or ≥ 0 where truncation-toward-zero keeps the implication
    * valid) so pre-epoch raw values can never be wrongly excluded.
    */
  private def implied(cmp: Expression): Option[Expression] = cmp match {
    case LessThan(NanosToTs(a), Literal(c: Long, TimestampType)) if c > 0 && c <= MaxSafeMicros =>
      Some(LessThan(a, Literal(c * 1000L)))
    case LessThanOrEqual(NanosToTs(a), Literal(c: Long, TimestampType)) if c >= 0 && c <= MaxSafeMicros =>
      Some(LessThan(a, Literal((c + 1) * 1000L)))
    case GreaterThan(NanosToTs(a), Literal(c: Long, TimestampType)) if c >= 0 && c <= MaxSafeMicros =>
      Some(GreaterThan(a, Literal(c * 1000L)))
    case GreaterThanOrEqual(NanosToTs(a), Literal(c: Long, TimestampType)) if c > 0 && c <= MaxSafeMicros =>
      Some(GreaterThanOrEqual(a, Literal(c * 1000L)))
    // literal-on-left orientations normalize to the cases above; the
    // non-literal guard on the right side keeps a (not yet folded)
    // literal-vs-literal comparison from recursing forever
    case LessThan(l: Literal, r) if !r.isInstanceOf[Literal] =>
      implied(GreaterThan(r, l))
    case LessThanOrEqual(l: Literal, r) if !r.isInstanceOf[Literal] =>
      implied(GreaterThanOrEqual(r, l))
    case GreaterThan(l: Literal, r) if !r.isInstanceOf[Literal] =>
      implied(LessThan(r, l))
    case GreaterThanOrEqual(l: Literal, r) if !r.isInstanceOf[Literal] =>
      implied(LessThanOrEqual(r, l))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(implied)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        .distinct
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}
