package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.{DeltaLog, TxLog}

/** Authors a golden Delta protocol-conformance tree
  * (`fixtures/golden_delta/vN`) with the CURRENT writer: three TxLog
  * commits (append 3 rows / overwrite 2 / append 1) mirrored into
  * `_delta_log`, then a parquet checkpoint + `_last_checkpoint`. The
  * rows are the literal values DeltaLogSpec's golden tests assert, so a
  * freshly generated tree drops straight into the pin suite.
  *
  * Golden trees are FROZEN once committed (they pin reader back-compat
  * against historical logs): this generator refuses to overwrite an
  * existing directory — bump the version instead and keep the old one.
  *
  * Usage: `tools/run.sh main graft.tools.GoldenFixtureGen fixtures/golden_delta/vN`
  */
object GoldenFixtureGen {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse(
      sys.error("usage: GoldenFixtureGen <targetDir>"))
    require(!Files.exists(Paths.get(target)),
      s"$target exists - golden trees are frozen; bump the version and keep the old tree")
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("golden-fixture-gen")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._
      Files.createDirectories(Paths.get(target))
      val v0 = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
        .toDF("id", "name", "score")
      val v1 = Seq((4L, "delta", 40.75), (5L, "epsilon", 50.5))
        .toDF("id", "name", "score")
      val v2 = Seq((6L, "zeta", 60.125)).toDF("id", "name", "score")
      // one data file per commit: the pin tests reason about exact files
      TxLog.commitAppend(v0.coalesce(1), target)
      TxLog.commitOverwrite(v1.coalesce(1), target)
      TxLog.commitAppend(v2.coalesce(1), target)
      DeltaLog.checkpoint(spark, target)
      println(s"golden tree written to $target")
    } finally spark.stop()
  }
}
