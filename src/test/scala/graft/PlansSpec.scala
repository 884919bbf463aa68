package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** PushTimeFilter optimizer rule: time predicates on the derived
  * `timestamp_micros(ts div 1000)` column must reach the parquet scan
  * as raw-nanos bounds, without changing any result row.
  */
class PlansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events time filter pushes a raw-nanos bound into the parquet scan") {
    val cutoff = "2024-01-10"
    val df = Tables.events(spark, dir).filter(col("ts") < lit(cutoff).cast("timestamp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(ts,"), s"expected pushed raw bound in:\n$plan")
    // parity: the pushed plan returns exactly the rows a driver-side
    // filter of the full table keeps
    val expected = Tables.events(spark, dir).select(col("ts")).collect()
      .count(_.getTimestamp(0).getTime < java.sql.Timestamp.valueOf("2024-01-10 00:00:00").getTime)
    assert(df.count() == expected)
  }

  test("implied bounds stay loose around sub-microsecond truncation") {
    // raw nanos straddling a microsecond boundary: 1999 ns floors to
    // 1 µs; a filter at exactly 1 µs must keep/drop by the FLOORED
    // value on both path shapes
    val tmp = Files.createTempDirectory("graft_nanos").toString
    val sp = spark
    import sp.implicits._
    Seq(999L, 1000L, 1999L, 2000L).toDF("ts").write.mode("overwrite").parquet(tmp)
    val events = spark.read.parquet(tmp)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val le = events.filter(col("ts") <= lit("1970-01-01 00:00:00.000001").cast("timestamp")).count()
    val gt = events.filter(col("ts") > lit("1970-01-01 00:00:00.000001").cast("timestamp")).count()
    assert(le == 3) // 999→0µs, 1000→1µs, 1999→1µs
    assert(gt == 1) // 2000→2µs
  }

  test("rule leaves non-matching filters untouched") {
    val df = Tables.events(spark, dir).filter(col("event_type") === "click")
    val plan = df.queryExecution.optimizedPlan.toString
    // no spurious raw-ts conjunct appears
    assert(!plan.contains("ts#") || !plan.matches("(?s).*ts#\\d+L? [<>].*"))
    assert(df.count() > 0)
  }

  // ---- Tables.fanOut: size-derived parallelism floor (round-15 opt) ----

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("fanOut below the per-task byte floor is the identity (no exchange)") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // sf0.001 documents is a few KB << the 1 MiB default floor
    assert(Tables.fanOut(docs, "doc_id") eq docs)
  }

  test("fanOut engages above the floor: keyed exchange, same rows") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    withConf("spark.graft.fanout.minBytesPerTask" -> "1") {
      val fanned = Tables.fanOut(docs, "doc_id")
      assert(fanned ne docs)
      // capped at the session's parallelism, pinned against AQE coalescing
      assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
      val plan = fanned.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(doc_id"), s"expected keyed exchange in:\n$plan")
      assert(fanned.orderBy("doc_id").collect().toSeq ==
        docs.orderBy("doc_id").collect().toSeq)
    }
  }

  test("fanOut is the identity when the scan already splits naturally") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // shrink maxPartitionBytes so size >= natural-split capacity: at
    // production scale the scan parallelizes itself and fanOut must not
    // add a shuffle on top
    withConf(
      "spark.graft.fanout.minBytesPerTask" -> "1",
      "spark.sql.files.maxPartitionBytes" -> "1") {
      assert(Tables.fanOut(docs, "doc_id") eq docs)
    }
  }

  test("operator results are invariant under a forced fanOut") {
    val docs = Tables.documents(spark, dir)
    val base = graft.ext.Dedup.exactSurvivors(docs).orderBy("doc_id").collect().toSeq
    withConf("spark.graft.fanout.minBytesPerTask" -> "1") {
      val fanned = graft.ext.Dedup.exactSurvivors(docs).orderBy("doc_id").collect().toSeq
      assert(fanned == base)
    }
  }
}
