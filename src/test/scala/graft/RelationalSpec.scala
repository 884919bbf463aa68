package graft

import org.apache.spark.sql.DataFrame

import graft.relational.StarQueries

/** Join/set-op/top-k semantics on tiny hand-checked star data. */
class RelationalSpec extends SparkSpec {

  private lazy val customer: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alice", "AUTO", 100.0, 10L),
      (2L, "bob", "AUTO", 9000.0, 10L),
      (3L, "carol", "HOME", 50.0, 20L))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "c_nationkey")
  }

  private lazy val orders: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (100L, 1L, "O", 10.0), (101L, 1L, "F", 20.0), (102L, 2L, "O", 30.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  }

  test("semi join keeps exactly the customers with orders") {
    val out = StarQueries.customersWithOrders(customer, orders)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("anti join keeps exactly the customers without orders") {
    val out = StarQueries.customersWithoutOrders(customer, orders)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }

  test("top-k is ordered desc with deterministic tie-break") {
    val out = StarQueries.topOrders(orders, 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(102L, 101L))
  }

  test("set ops: intersect/except/union counts") {
    val out = StarQueries.setOps(customer, orders)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // buyers = {1,2}; rich(>5000) = {2}
    assert(out("intersect") == 1L)
    assert(out("except") == 1L)
    assert(out("union") == 2L)
  }

  test("rollup produces subtotal and grand-total rows") {
    val s = spark
    import s.implicits._
    val li = Seq(("A", "F", 5.0), ("A", "O", 3.0), ("R", "F", 2.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val out = StarQueries.flagRollup(li).collect()
    // 3 leaf + 2 subtotal (A, R) + 1 grand total
    assert(out.length == 6)
    val grand = out.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getDouble(2) == 10.0 && grand.getLong(3) == 3L)
  }

  test("profileStats reports nulls/distincts/range per column in one pass") {
    val s = spark
    import s.implicits._
    val li = Seq(
      (Some(1.0), 10.0), (Some(2.0), 10.0), (None, 30.0), (Some(2.0), 40.0))
      .toDF("l_quantity", "l_extendedprice")
    val out = StarQueries.profileStats(li, Seq("l_quantity", "l_extendedprice"))
      .collect().map(r => r.getString(0) -> r).toMap
    val q = out("l_quantity")
    assert(q.getLong(1) == 4 && q.getLong(2) == 1 && q.getLong(3) == 2)
    assert(q.getDouble(4) == 1.0 && q.getDouble(5) == 2.0)
    assert(q.getDouble(6) == 1.666667) // avg skips nulls; rounded to 6dp
    val e = out("l_extendedprice")
    assert(e.getLong(2) == 0 && e.getLong(3) == 3 && e.getDouble(6) == 22.5)
  }

  test("window rank keeps top-3 per customer") {
    val s = spark
    import s.implicits._
    val many = (1 to 5).map(i => (200L + i, 9L, "O", i * 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val out = StarQueries.topOrdersPerCustomer(many).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).toSet == Set(205L, 204L, 203L))
  }
}
