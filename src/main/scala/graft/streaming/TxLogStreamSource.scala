package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.TxLog

/** Structured Streaming SOURCE over a TxLog table — "the lakehouse
  * table is also a replayable message bus", Delta's own streaming-source
  * model (`spark.readStream.format("delta")`): OFFSETS ARE COMMIT
  * VERSIONS, and each micro-batch reads exactly the files the commits
  * in `(start, end]` appended — O(new data) per trigger, never a
  * snapshot diff, and replayable from any retained version.
  *
  * Wire-up: `spark.readStream.format("graft-txlog").option("path", dir)`
  * (registered via META-INF DataSourceRegister; the fully-qualified
  * provider class works too). Options: `startingVersion` to begin past
  * the backfill (default 0 = full history, stock Delta's default).
  *
  * Mechanics: [[TxLogSource.getOffset]] lists the current committed
  * version (one directory listing — the manifest IS the changelog);
  * [[TxLogSource.getBatch]] delegates to [[TxLog.changesBetween]]
  * (added-files read) so the batch carries the snapshot schema,
  * including reattached partition columns. Exactly-once end to end:
  * compose the sink side with [[TxLog.commitAppendOnce]] keyed by the
  * batch id, and a crash replays into a skip.
  *
  * The one internal seam: a DSv1 `Source` must hand back a STREAMING
  * DataFrame, and the only constructor (`internalCreateDataFrame(rdd,
  * schema, isStreaming = true)`) is `private[sql]` — JVM-public, scoped
  * only by Scala. Invoked reflectively, the same bridge every external
  * DSv1 connector uses; the alternative (a full DSv2 MicroBatchStream)
  * would re-implement parquet reading instead of reusing the planner.
  */
class TxLogStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-txlog"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-txlog source needs .option(\"path\", <table dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-txlog", schema.getOrElse(
      TxLog.snapshot(sqlContext.sparkSession, dirOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxLogSource(sqlContext, dirOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L))
}

class TxLogSource(sqlContext: SQLContext, dir: String, startingVersion: Long)
    extends Source {

  private val spark = sqlContext.sparkSession

  override val schema: StructType = TxLog.snapshot(spark, dir).schema

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"graft-txlog: unexpected offset $other")
  }

  /** Newest committed version with data past the start — one directory
    * listing; None = no new commits, the engine skips the trigger. */
  override def getOffset: Option[Offset] =
    TxLog.currentVersion(dir).filter(_ > startingVersion).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startingVersion)
    val toV = ver(end)
    val batch =
      if (fromV <= 0) TxLog.snapshotAt(spark, dir, toV) // first batch = history
      else TxLog.changesBetween(spark, dir, fromV, toV)
    asStreaming(batch)
  }

  private def asStreaming(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val m = ss.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType],
      java.lang.Boolean.TYPE)
    m.invoke(ss, df.queryExecution.toRdd, df.schema, java.lang.Boolean.TRUE)
      .asInstanceOf[DataFrame]
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxLogSource[$dir, from=$startingVersion]"
}
