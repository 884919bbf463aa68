package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Re-aggregatable rollups over the mergeable exact-distinct sketch
  * (`functions/SetSketch.scala`) — the pre-aggregated-cube pattern.
  *
  * Why it matters at 100 TB: a fact table is scanned ONCE into a
  * fine-grain cube carrying `graft_set_agg` sketches; every coarser
  * distinct-count question afterwards — daily actives, per-dimension
  * uniques, global reach — merges the stored partials
  * (O(cube rows), typically 4–6 orders of magnitude smaller than the
  * facts). `count(distinct)` results can't do this (distincts don't
  * add across groups); HLL can but answers drift. The sketch is exact,
  * so the cube's answers hash-match a direct fact-table query — which
  * is precisely what the oracle checks.
  *
  * Reference analog: the gold rollup tier (`process_gold.py`) keeps
  * per-minute aggregates that downstream consumers re-read; this is
  * the same materialize-once/re-aggregate-forever contract extended to
  * the one aggregate that normally refuses it.
  */
object MergeableSketches {

  /** Fine-grain cube: per (event_type, hour) — the materialized tier.
    * `graft_set_card` is O(1) per row (header varint), so exposing the
    * per-cell distinct count costs nothing beyond the sketch itself.
    */
  def hourlyCube(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(call_function("graft_set_agg", col("user_id")).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Oracle-checked cube cells: exact distinct users per cell. */
  def sketchCube(events: DataFrame): DataFrame =
    hourlyCube(events)
      .select(col("event_type"), col("hour"),
        call_function("graft_set_card", col("sketch")).as("distinct_users"),
        col("n_events"))
      .orderBy(col("hour"), col("event_type"))

  val sketchCubeOracle: String =
    """SELECT event_type,
      |       date_trunc('hour', ts) AS hour,
      |       count(DISTINCT user_id) AS distinct_users,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 2, 1""".stripMargin

  /** Oracle-checked re-aggregation chain: hour partials → day sketches
    * (`graft_set_merge`) → per-type cardinality — two merge levels, no
    * fact rescan after the first groupBy. Exactness through BOTH merge
    * levels is what the oracle's direct `count(DISTINCT)` pins down
    * (associativity bugs, dropped zeros, or delta-codec slips would all
    * flip the hash).
    */
  def sketchRollup(events: DataFrame): DataFrame = {
    val daily = hourlyCube(events)
      .groupBy(col("event_type"), date_trunc("day", col("hour")).as("day"))
      .agg(call_function("graft_set_merge", col("sketch")).as("sketch"),
        sum(col("n_events")).as("n_events"))
    daily.groupBy(col("event_type"))
      .agg(call_function("graft_set_card",
          call_function("graft_set_merge", col("sketch"))).as("distinct_users"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("event_type"))
  }

  val sketchRollupOracle: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS distinct_users,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_cube" -> ((s, d) => sketchCube(graft.Tables.events(s, d))),
    "q_sketch_rollup" -> ((s, d) => sketchRollup(graft.Tables.events(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_sketch_cube" -> sketchCubeOracle,
    "q_sketch_rollup" -> sketchRollupOracle
  )
}
