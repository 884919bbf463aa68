package graft

import org.apache.spark.sql.DataFrame

/** The oracle-determinism property, generalized from the q_ivf_append
  * flake (round 8): a query whose DuckDB oracle rounds a FLOAT
  * aggregate hash-matches only if the Spark side produces the same
  * digits on EVERY physical layout — parallel floating-point summation
  * is order-sensitive, and a value sitting on a rounding half-boundary
  * can flip its 9th significant digit when the partial-aggregation
  * grouping changes (different scan splits, different shuffle
  * partitioning). The driver runs each query ONCE against a fixed
  * oracle, so any layout-sensitivity is a latent intermittent FAIL.
  *
  * This spec makes the property explicit: every registered query whose
  * oracle SQL contains `round(avg|sum|stddev...)` runs under two
  * deliberately different physical layouts — the suite default, and a
  * many-tiny-splits / prime-shuffle-width / no-AQE layout — and the
  * results must agree at FULL precision after the query's own rounding
  * (strictly stronger than selfcheck's 9-significant-digit hash).
  * Staged inputs (memoized table builds) are shared between the two
  * runs by design: the perturbation targets the aggregation the query
  * itself performs, exactly where the exactMean class of flake lives.
  */
class OracleDeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val roundedFloatAgg =
    "(?i)round\\s*\\(\\s*(avg|sum|stddev|var|corr|covar)".r.unanchored

  /** Canonical row strings: columns sorted by name, doubles/floats at
    * full shortest-repr precision, rows sorted — selfcheck's hash
    * discipline, minus its 9-digit forgiveness. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    proj.collect().toSeq.map(_.toSeq.map {
      case null => "null"
      case d: java.lang.Double => if (d.isNaN) "nan" else d.toString
      case f: java.lang.Float => if (f.isNaN) "nan" else f.toString
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case s: Seq[_] => s.mkString("[", ",", "]")
      case other => other.toString
    }.mkString("")).sorted
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rounded float aggregates are physical-layout-invariant (all registered queries)") {
    val names = SparkEntry.oracleSql.collect {
      case (n, sql) if roundedFloatAgg.findFirstIn(sql).isDefined => n
    }.toSeq.sorted
    assert(names.size >= 80, s"expected the rounded-agg family, got $names")
    val failures = names.flatMap { name =>
      val q = SparkEntry.queries(name)
      // layout A: the suite default (4-way shuffle, normal splits) —
      // also performs any staging, shared with B by memoization
      val a = canon(q(spark, sf))
      // layout B: many tiny scan splits, prime shuffle width, AQE off
      // (no coalescing back) — a maximally different summation grouping
      val b = withConf(
        "spark.sql.shuffle.partitions" -> "7",
        "spark.sql.files.maxPartitionBytes" -> "65536",
        "spark.sql.files.openCostInBytes" -> "0",
        "spark.sql.adaptive.enabled" -> "false")(canon(q(spark, sf)))
      if (a == b) None
      else Some(s"$name: ${a.diff(b).take(2)} vs ${b.diff(a).take(2)}")
    }
    assert(failures.isEmpty,
      s"layout-sensitive rounded aggregates (the exactMean flake class):\n" +
        failures.mkString("\n"))
  }
}
