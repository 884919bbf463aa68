package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness for hotspot iteration (not part of the
  * driver contract; safe to delete).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.register)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", sys.props("java.io.tmpdir") + "/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    docs.count()
    time("shingleRows-cold") { ext.Dedup.shingleRowsForProfiling(docs).count() }
    time("shingleRows-warm") { ext.Dedup.shingleRowsForProfiling(docs).count() }
    time("minhashSignatures-cold") { ext.Dedup.minhashSignatures(docs).count() }
    time("lshBucketStats") { ext.Dedup.lshBucketStats(docs).count() }
    time("nearDupPairs-cold") { ext.Dedup.nearDupPairs(docs).count() }
    time("nearDupPairs-warm") { ext.Dedup.nearDupPairs(docs).count() }
    spark.stop()
  }
}
