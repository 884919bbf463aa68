package graft

import org.apache.spark.sql.functions._

import graft.functions.{LongHashSet, SetSketch}
import graft.relational.MergeableSketches

/** The mergeable exact-distinct sketch: codec, set semantics, merge
  * algebra, and the aggregate surface end to end against
  * `count(distinct)` ground truth.
  */
class SetSketchSpec extends SparkSpec {

  private def sketchOf(vals: Seq[Long]): Array[Byte] = {
    val s = new LongHashSet()
    vals.foreach(s.add)
    SetSketch.encode(s)
  }

  test("codec round-trips adversarial values (0, negatives, Long extremes)") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L),
      Seq.fill(5000)(rnd.nextLong()),
      Seq.fill(2000)(rnd.nextInt(100).toLong), // heavy duplicates
      (0L until 1000L).toSeq // dense ascending: 1-byte deltas
    )
    cases.foreach { vs =>
      val expect = vs.distinct.sorted
      val bytes = sketchOf(vs)
      assert(SetSketch.decode(bytes).toSeq == expect)
      assert(SetSketch.cardinality(bytes) == expect.length.toLong)
    }
  }

  test("dense sorted ids compress to ~1 byte per value") {
    val bytes = sketchOf((1000000L until 1010000L).toSeq)
    // header + first value + 9999 deltas of 1 → well under 2 bytes/value
    assert(bytes.length < 10007 * 2, s"got ${bytes.length} bytes for 10000 ids")
  }

  test("merge is associative and commutative: any merge tree yields identical bytes") {
    val rnd = new scala.util.Random(7)
    val parts = Seq.fill(4)(Seq.fill(500)(rnd.nextLong() % 1000))
    def mergeAll(order: Seq[Seq[Long]]): Array[Byte] = {
      val acc = new LongHashSet()
      order.foreach(p => SetSketch.decodeInto(sketchOf(p), acc))
      SetSketch.encode(acc)
    }
    val ref = mergeAll(parts)
    assert(java.util.Arrays.equals(ref, mergeAll(parts.reverse)))
    assert(java.util.Arrays.equals(ref, mergeAll(parts.permutations.drop(5).next())))
    assert(SetSketch.cardinality(ref) == parts.flatten.distinct.length.toLong)
  }

  test("graft_set_agg matches count(distinct) per group; nulls ignored; empty = card 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("a", Some(1L)), ("a", None),
      ("b", Some(0L)), ("b", Some(-5L)), ("b", Some(0L)),
      ("c", None)).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(call_function("graft_set_card",
        call_function("graft_set_agg", col("v"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 0L))
  }

  test("cube → merge chain equals a direct distinct count on events") {
    val s = spark
    val ev = Tables.events(s, "/root/testdata/sf0.001")
    val viaSketch = MergeableSketches.sketchRollup(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaSketch.toSeq == direct.toSeq)
  }

  test("the cube plan partial-aggregates map-side (ObjectHashAggregate, 2 levels)") {
    val s = spark
    val ev = Tables.events(s, "/root/testdata/sf0.001")
    val plan = MergeableSketches.hourlyCube(ev)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate routes through ObjectHashAggregate with a
    // partial mode below the exchange — the shuffle carries one sketch
    // per (group, partition), not rows
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_graft_set_agg"), plan.take(2000))
  }
}
