package graft

import org.apache.spark.sql.functions._

import graft.ingest.Bronze
import graft.relational.RuntimeFilters
import graft.sources.Sinks

/** New-surface specs: ORC/JSON sink roundtrips, VARIANT extraction,
  * bloom-filter runtime-pruned semi-join.
  */
class FormatsAndFiltersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("orc roundtrip preserves aggregate values and schema") {
    val out = Sinks.orcRoundtrip(spark, Tables.lineitem(spark, dir))
    assert(out.columns.sorted.toSeq == Seq("l_returnflag", "n", "total"))
    val direct = Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total"), count(lit(1)).as("n"))
    assert(out.orderBy("l_returnflag").collect().toSeq ==
      direct.select("l_returnflag", "total", "n").orderBy("l_returnflag").collect().toSeq)
  }

  test("json-lines roundtrip preserves values under explicit schema") {
    val out = Sinks.jsonLinesRoundtrip(spark, Tables.customer(spark, dir))
    assert(out.count() == 5)
    assert(out.schema("n").dataType.typeName == "long")
  }

  test("variant extraction equals string json extraction") {
    val viaVariant = Bronze.variantExtract(Tables.events(spark, dir))
    val viaString = Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 6).as("avg_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    assert(viaVariant.orderBy("event_type").collect().toSeq ==
      viaString.orderBy("event_type").collect().toSeq)
  }

  test("bloom semi-join equals plain exists semi-join") {
    val pruned = RuntimeFilters.bloomSemiJoin(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val plain = Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 200000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(pruned == plain)
    // the prune must actually be in the plan when the extension is loaded
    val plan = RuntimeFilters.bloomSemiJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
  }
}
