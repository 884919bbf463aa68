package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
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
  * provider class works too). Options:
  *  - `startingVersion` — INCLUSIVE first version to stream (stock
  *    Delta's semantics); default 0 = the full history.
  *  - `skipChangeCommits` — non-append commits (DELETE/UPDATE/MERGE
  *    rewrites) are SKIPPED instead of failing the stream.
  *  - `maxVersionsPerTrigger` — ADMISSION CONTROL (the
  *    maxFilesPerTrigger analog): each micro-batch advances at most N
  *    commit versions, so a month-long backfill replays as bounded
  *    batches instead of one giant read. Under Trigger.AvailableNow
  *    the source implements the native protocol
  *    (SupportsTriggerAvailableNow): the end offset pins at prepare
  *    time and the engine drains to it in rate-limited batches —
  *    late-arriving commits wait for the next run, exact AvailableNow
  *    semantics with no fallback warning.
  *
  * Non-append safety (stock Delta's rule): a copy-on-write rewrite
  * re-adds surviving rows the stream already delivered, so treating it
  * as an append would double-count downstream. Each version therefore
  * CLASSIFIES: pure appends flow; bytes-only rewrites (OPTIMIZE/REORG —
  * every mirrored action carries `dataChange=false`) skip silently
  * (their rows were delivered by earlier commits); data-changing
  * rewrites FAIL the stream unless `skipChangeCommits` opts in.
  *
  * Mechanics: [[TxLogSource.getOffset]] lists the current committed
  * version (one directory listing — the manifest IS the changelog);
  * [[TxLogSource.getBatch]] reads the classified versions' added files
  * with partition columns reattached. Exactly-once end to end: compose
  * the sink side with [[TxLog.commitAppendOnce]] keyed by the batch id,
  * and a crash replays into a skip.
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
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      parameters.get("skipChangeCommits").exists(_.toBoolean),
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
}

class TxLogSource(sqlContext: SQLContext, dir: String,
    startingVersion: Long, skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession

  /** `startingVersion` is INCLUSIVE (stock Delta): the stream's base
    * offset is the version before it. */
  private val baseV = math.max(0L, startingVersion - 1L)

  override val schema: StructType = TxLog.snapshot(spark, dir).schema

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"graft-txlog: unexpected offset $other")
  }

  /** Newest committed version with data past the base — one directory
    * listing; None = no new commits, the engine skips the trigger.
    * (Kept for engines that bypass admission control; the
    * SupportsAdmissionControl path below is what MicroBatchExecution
    * actually drives.) */
  override def getOffset: Option[Offset] =
    TxLog.currentVersion(dir).filter(_ > baseV).map(LongOffset(_))

  /** AvailableNow pin: versions committed AFTER prepare wait for the
    * next run — the trigger's exact contract. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(TxLog.currentVersion(dir).getOrElse(baseV))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control: advance at most `maxVersionsPerTrigger`
    * commits per batch, clamped to the AvailableNow pin when one is
    * set. Null = no new data (the engine's idle signal). */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val startV = Option(startOffset).map {
      case l: LongOffset => l.offset
      case so: SerializedOffset => LongOffset(so).offset
      case o => LongOffset(SerializedOffset(o.json())).offset
    }.getOrElse(baseV)
    val cur = TxLog.currentVersion(dir).getOrElse(return null)
    val capped = availableNowCap.fold(cur)(math.min(cur, _))
    val base = math.max(startV, baseV)
    val target = maxVersionsPerTrigger.fold(capped)(n => math.min(capped, base + n))
    if (target <= base) null else LongOffset(target)
  }

  /** Added files of one version, classified per the non-append rule.
    * The manifest's own `#op` header (written atomically WITH the
    * commit) answers instantly — no wait, no dependence on the
    * later-written, compactable Delta mirror; manifests from pre-`#op`
    * writers fall back to one mirror read
    * ([[graft.sources.DeltaLog.isBytesOnlyCommit]]) and classify
    * conservatively as a data change when both are silent
    * (skipChangeCommits recovers).
    */
  private def addedOf(v: Long): Seq[String] = {
    val (added, removed) = TxLog.commitDelta(dir, v)
    if (removed.isEmpty) return added
    val table = java.nio.file.Paths.get(dir)
    val bytesOnly = TxLog.manifestOp(table, v).map(!_._2)
      .orElse(graft.sources.DeltaLog.isBytesOnlyCommit(table, v))
    if (bytesOnly.contains(true)) Seq.empty // OPTIMIZE/REORG: rows already delivered
    else if (skipChangeCommits) Seq.empty
    else sys.error(s"graft-txlog: version $v of $dir removed files — a " +
      "DELETE/UPDATE/MERGE rewrite cannot stream as an append (its " +
      "surviving rows were already delivered). Set " +
      ".option(\"skipChangeCommits\",\"true\") to skip such commits.")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(baseV)
    val toV = ver(end)
    val batch =
      if (fromV <= 0) TxLog.snapshotAt(spark, dir, toV) // first batch = history
      else {
        val rels = ((fromV + 1) to toV).flatMap(addedOf)
        if (rels.isEmpty) TxLog.snapshotAt(spark, dir, toV).limit(0)
        else TxLog.readFilesOf(spark, dir, rels, asOfVersion = toV)
      }
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

  override def toString: String =
    s"TxLogSource[$dir, startingVersion=$startingVersion]"
}
