package graft

import graft.ext.TextOps
import graft.relational.TypedQueries

/** Typed Aggregator + TF-IDF semantics. */
class TypedTextSpec extends SparkSpec {

  test("VWAP aggregator: weighted by quantity, zero-safe") {
    import TypedQueries.Vwap
    val a = Vwap.reduce(Vwap.zero, mkItem(qty = 2, price = 10)) // 20 / 2
    val b = Vwap.reduce(a, mkItem(qty = 8, price = 30))         // +240 / +8
    assert(Vwap.finish(b) == 260.0 / 10.0)
    assert(Vwap.finish(Vwap.zero) == 0.0)
    assert(Vwap.merge(a, Vwap.zero) == a)
  }

  private def mkItem(qty: Double, price: Double) =
    TypedQueries.LineItem(1L, 1L, 1L, 1, qty, price, 0.0, 0.0, "A", "F",
      java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))

  test("typed VWAP query equals untyped SQL expression") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val typed = TypedQueries.vwapByFlag(s, dir)
      .orderBy("l_returnflag").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val untyped = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 0)
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 2).as("vwap"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed == untyped)
  }

  test("TF-IDF: a source-specific term outranks corpus-wide terms") {
    val s = spark
    import s.implicits._
    val docs = (
      Seq((1L, "zebra zebra zebra common common", "en", "srcA", 30L),
        (2L, "common words only here", "en", "srcB", 22L),
        (3L, "common words again now", "en", "srcB", 22L))
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.tfidfTopTerms(docs, 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("srcA") == "zebra") // unique to srcA, high idf
  }
}
