package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delta Lake *protocol* interop — no delta jars, just the open spec.
  *
  * The reference's tables are genuine Delta (`consumer_lake.py:48-54`,
  * `process_silver.py:82-85`; delta-spark 2.4.0 per `Dockerfile:7`).
  * [[TxLog]] reproduces the transactional *semantics* (snapshot isolation,
  * time travel, VACUUM, CDF) on its own manifest format; this object closes
  * the remaining *interop* gap in both directions:
  *
  *  - WRITE: every TxLog commit is mirrored as a Delta commit file
  *    `_delta_log/%020d.json` holding newline-delimited `protocol` /
  *    `metaData` / `add` / `remove` / `commitInfo` actions per the public
  *    Delta transaction-log protocol (PROTOCOL.md, delta-io/delta). A table
  *    this engine writes is readable by any stock Delta reader — Spark with
  *    delta-spark, DuckDB's delta extension, delta-rs — with no knowledge
  *    of `_txlog`.
  *  - READ: [[snapshot]] replays an EXTERNAL `_delta_log` (driver-side log
  *    replay over the JSON commits, exactly how Delta's own Snapshot is
  *    built — O(log files), never O(rows)) and hands the live file set to
  *    the parquet reader, so the engine can query tables some other Delta
  *    writer produced.
  *
  * Scale notes: log replay cost is bounded by commit count, and bounded
  * further by parquet CHECKPOINTS ([[checkpoint]] / [[maybeCheckpoint]],
  * every 10 commits like Delta's default cadence): the newest checkpoint
  * holds the complete live state, so replay reads one parquet file plus
  * the JSON commits after it, and the JSON prefix may be aged out —
  * Delta's log-compaction contract, honored on both the write and read
  * sides. Partitioned external tables (non-empty `partitionColumns`) are
  * rejected loudly rather than read wrong: their partition values live in
  * the log, not the files.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  private def logDir(table: Path): Path = table.resolve("_delta_log")

  private def commitPath(table: Path, deltaVersion: Long): Path =
    logDir(table).resolve(f"$deltaVersion%020d.json")

  /** `Files.list` with the stream closed (it holds a directory fd). */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  // ------------------------------------------------------------- write

  /** Mirror one TxLog commit as a Delta commit file. `txVersion` is the
    * 1-based TxLog manifest version; Delta versions are 0-based, so the
    * mirrored commit lands at `txVersion - 1`. Commit 0 carries the
    * mandatory `protocol` and `metaData` actions (reader/writer version 1/2
    * = the base protocol: plain parquet, no column mapping / deletion
    * vectors, which is all these tables use). `metaData.id` must be stable
    * for the table's lifetime — derived from the table path so re-staging
    * is deterministic.
    *
    * Put-if-absent createLink, same primitive as the TxLog commit itself:
    * losing a race (or re-mirroring an already-mirrored version) is a
    * silent no-op, so the mirror never clobbers a committed Delta version.
    */
  /** True when Delta version `txVersion - 1` already has a commit file. */
  def isMirrored(table: Path, txVersion: Long): Boolean =
    Files.exists(commitPath(table, txVersion - 1))

  /** Percent-encoding per the Delta path rules: encode only the
    * characters that would be mis-read back ('%' itself, space, '+') —
    * NOT java.net.URLEncoder, whose form encoding maps space to '+' and
    * escapes '/' (Delta paths keep literal slashes and '+').
    */
  private def encodePath(p: String): String =
    p.flatMap {
      case '%' => "%25"
      case ' ' => "%20"
      case '+' => "%2B"
      case c => c.toString
    }

  /** Inverse of the Delta path percent-encoding: decode %XX escapes and
    * nothing else — java.net.URLDecoder would corrupt a literal '+' in a
    * file name (legal in Delta paths) into a space. Lenient on malformed
    * escapes (a bare '%' not followed by two hex digits stays literal):
    * spec-violating logs exist in the wild, and a wrong-but-plausible
    * path resolves to a loud file-not-found while a decoder crash would
    * mask which path was at fault.
    */
  private def decodePath(p: String): String = {
    def hex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    val sb = new StringBuilder(p.length)
    var i = 0
    while (i < p.length) {
      if (p.charAt(i) == '%' && i + 2 < p.length &&
          hex(p.charAt(i + 1)) && hex(p.charAt(i + 2)))
        { sb.append(Integer.parseInt(p.substring(i + 1, i + 3), 16).toChar); i += 3 }
      else { sb.append(p.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Spec hooks: the codec pair, exposed for property tests. */
  private[graft] def pathCodecRoundtrip(p: String): String = decodePath(encodePath(p))
  private[graft] def pathDecode(p: String): String = decodePath(p)

  def mirrorCommit(table: Path, txVersion: Long, added: Seq[String],
      removed: Seq[String], schemaJson: String): Unit = {
    val deltaV = txVersion - 1
    Files.createDirectories(logDir(table))
    if (Files.exists(commitPath(table, deltaV))) return
    val now = System.currentTimeMillis()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    if (deltaV == 0L) {
      val protocol = mapper.createObjectNode()
      val p = protocol.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      lines += mapper.writeValueAsString(protocol)
      val metaData = mapper.createObjectNode()
      val m = metaData.putObject("metaData")
      m.put("id", java.util.UUID.nameUUIDFromBytes(
        table.toAbsolutePath.toString.getBytes("UTF-8")).toString)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      m.put("schemaString", schemaJson)
      m.putArray("partitionColumns")
      m.putObject("configuration")
      m.put("createdTime", now)
      lines += mapper.writeValueAsString(metaData)
    }
    val commitInfo = mapper.createObjectNode()
    val ci = commitInfo.putObject("commitInfo")
    ci.put("timestamp", now)
    ci.put("operation", "WRITE")
    ci.putObject("operationParameters")
      .put("mode", if (removed.nonEmpty) "Overwrite" else "Append")
    lines += mapper.writeValueAsString(commitInfo)
    removed.foreach { rel =>
      val n = mapper.createObjectNode()
      val r = n.putObject("remove")
      r.put("path", encodePath(rel))
      r.put("deletionTimestamp", now)
      r.put("dataChange", true)
      lines += mapper.writeValueAsString(n)
    }
    added.foreach { rel =>
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", encodePath(rel))
      a.putObject("partitionValues")
      a.put("size", Files.size(table.resolve(rel)))
      a.put("modificationTime",
        Files.getLastModifiedTime(table.resolve(rel)).toMillis)
      a.put("dataChange", true)
      lines += mapper.writeValueAsString(n)
    }
    val tmp = Files.createTempFile(logDir(table), ".delta-", ".tmp")
    Files.write(tmp, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    try Files.createLink(commitPath(table, deltaV), tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    finally Files.deleteIfExists(tmp)
  }

  // -------------------------------------------------------------- read

  /** Delta-spec parquet checkpoint: one row per action (nullable structs
    * for protocol / metaData / add, like delta's own checkpoint files),
    * holding the COMPLETE live state at `version`, plus the
    * `_last_checkpoint` pointer `{"version":V,"size":N}`. Stock Delta
    * readers start from the newest checkpoint and replay only later JSON
    * commits, so after this runs the JSON prefix may be aged out of the
    * log without breaking them — Delta's log-compaction contract.
    *
    * The file is written through Spark's parquet writer (one task —
    * checkpoints are O(live files), the same driver-scale metadata as the
    * TxLog manifest) and renamed into the log atomically.
    */
  def checkpoint(spark: SparkSession, dir: String): Long = {
    import org.apache.spark.sql.types._
    val table = Paths.get(dir)
    val v = (versions(dir) ++ lastCheckpointVersion(table))
      .maxOption.getOrElse(sys.error(s"no Delta commits in $dir"))
    val (files, meta) = replaySpark(spark, table, v)
    val m = meta.getOrElse(sys.error(s"$dir: no metaData action in log"))
    // Same guard as snapshotAt: a checkpoint that wrote partitionColumns=[]
    // for a partitioned external table would ERASE the loud rejection on
    // every later read (meta would rebuild partition-free from the
    // checkpoint) and silently drop the partition-column values.
    val pc = m.get("partitionColumns")
    if (pc != null && pc.size() > 0)
      sys.error(s"$dir: partitioned Delta tables are not supported " +
        "(partition values live in the log, not the data files)")
    val schema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    import org.apache.spark.sql.Row
    val protocolRow = Row(Row(1, 2), null, null)
    val metaRow = Row(null, Row(
      m.get("id").asText(),
      Row("parquet", Map.empty[String, String]),
      m.get("schemaString").asText(),
      Seq.empty[String],
      Map.empty[String, String],
      if (m.has("createdTime")) m.get("createdTime").asLong() else 0L), null)
    val addRows = files.map { rel =>
      val p = table.resolve(rel)
      Row(null, null, Row(encodePath(rel), Map.empty[String, String], Files.size(p),
        Files.getLastModifiedTime(p).toMillis, false))
    }
    val rows = protocolRow +: metaRow +: addRows
    val tmpDir = graft.Scratch.dir("graft_delta_ckpt")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(tmpDir.toString)
    val part = {
      val s = Files.list(tmpDir)
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error("checkpoint write produced no parquet part"))
      finally s.close()
    }
    val target = logDir(table).resolve(f"$v%020d.checkpoint.parquet")
    // Scratch may be tmpfs while the table is on disk: a direct cross-fs
    // Files.move degrades to copy+delete, and a concurrent reader could
    // open a truncated checkpoint. Stage into the log dir (same fs as the
    // target) first, then rename atomically — re-checkpointing the same
    // version writes identical content, so REPLACE is safe.
    val stagedTmp = Files.createTempFile(logDir(table), ".ckpt-", ".tmp")
    Files.copy(part, stagedTmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.move(stagedTmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.deleteIfExists(part)
    val lc = mapper.createObjectNode()
    lc.put("version", v)
    lc.put("size", rows.size.toLong)
    // pointer flips atomically too: a reader must never see a truncated
    // _last_checkpoint
    val lcTmp = Files.createTempFile(logDir(table), ".lc-", ".tmp")
    Files.writeString(lcTmp, mapper.writeValueAsString(lc))
    Files.move(lcTmp, logDir(table).resolve("_last_checkpoint"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Checkpoint every `interval` Delta versions (Delta's default cadence
    * is 10) — called by the TxLog committers after the mirror lands. */
  def maybeCheckpoint(spark: SparkSession, dir: String, txVersion: Long,
      interval: Long = 10L): Unit = {
    val deltaV = txVersion - 1
    if (deltaV > 0 && deltaV % interval == 0) { checkpoint(spark, dir); () }
  }

  private def lastCheckpointVersion(table: Path): Option[Long] = {
    val lc = logDir(table).resolve("_last_checkpoint")
    if (!Files.exists(lc)) None
    else Some(mapper.readTree(Files.readString(lc)).get("version").asLong())
  }

  /** Committed Delta versions present in `dir`'s log, ascending. */
  def versions(dir: String): Seq[Long] = {
    val ld = logDir(Paths.get(dir))
    if (!Files.isDirectory(ld)) Seq.empty
    else listDir(ld).iterator
      .map(_.getFileName.toString)
      .filter(n => n.length == 25 && n.endsWith(".json") &&
        n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong)
      .toSeq.sorted
  }

  /** The live (path → metadata) state after replaying the log up to and
    * including `version`: the Delta snapshot-construction algorithm —
    * base state from the newest checkpoint at or before `upTo` (when one
    * exists), then the later JSON commits in order; later `remove`
    * cancels earlier `add`, re-`add` cancels `remove`, last `metaData`
    * wins. Reading a version OLDER than every checkpoint falls back to
    * pure JSON replay and fails loudly if the log prefix was aged out.
    */
  private def replaySpark(spark: SparkSession, table: Path,
      upTo: Long): (Seq[String], Option[ObjectNode]) = {
    import org.apache.spark.sql.functions.col
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    var meta: Option[ObjectNode] = None
    val startAfter = lastCheckpointVersion(table).filter(_ <= upTo) match {
      case Some(cpV) =>
        val df = spark.read.parquet(
          logDir(table).resolve(f"$cpV%020d.checkpoint.parquet").toString)
        df.filter(col("add").isNotNull).select(col("add.path"))
          .collect().foreach(r => live += decodePath(r.getString(0)))
        df.filter(col("metaData").isNotNull)
          .select(col("metaData.id"), col("metaData.schemaString"),
            col("metaData.partitionColumns"))
          .collect().headOption.foreach { r =>
            val node = mapper.createObjectNode()
            node.put("id", r.getString(0))
            node.put("schemaString", r.getString(1))
            val pcs = node.putArray("partitionColumns")
            Option(r.getSeq[String](2)).getOrElse(Seq.empty).foreach(pcs.add)
            meta = Some(node)
          }
        cpV
      case None =>
        if (!versions(table.toString).headOption.contains(0L))
          sys.error(s"$table: log prefix aged out and no checkpoint at or " +
            s"before version $upTo — cannot reconstruct that snapshot")
        -1L
    }
    val tail = versions(table.toString).filter(v => v > startAfter && v <= upTo)
    // Contiguity is a correctness requirement, not a nicety: replaying
    // {0, 2} would silently drop commit 1's add/remove actions and return
    // a table state that never existed. Real Delta readers make the same
    // demand of the log.
    val expected = (startAfter + 1) to upTo
    if (tail != expected)
      sys.error(s"$table: _delta_log has gaps — need versions " +
        s"${expected.mkString(",")} after checkpoint $startAfter, found ${tail.mkString(",")}")
    tail.foreach { v =>
      Files.readAllLines(commitPath(table, v)).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("add"))
            live += decodePath(node.get("add").get("path").asText())
          if (node.has("remove"))
            live -= decodePath(node.get("remove").get("path").asText())
          if (node.has("metaData"))
            meta = Some(node.get("metaData").asInstanceOf[ObjectNode])
        }
    }
    (live.toSeq, meta)
  }

  /** Snapshot-isolated read of a Delta table at `version` (default:
    * latest), via pure log replay — works on any unpartitioned,
    * checkpointless Delta table regardless of which engine wrote it.
    */
  def snapshotAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val table = Paths.get(dir)
    val (files, meta) = replaySpark(spark, table, version)
    meta.foreach { m =>
      val pc = m.get("partitionColumns")
      if (pc != null && pc.size() > 0)
        sys.error(s"$dir: partitioned Delta tables are not supported " +
          "(partition values live in the log, not the data files)")
    }
    if (files.isEmpty) {
      // valid empty table: schema comes from metaData, not file inference
      val schema = meta.map(m => org.apache.spark.sql.types.DataType
        .fromJson(m.get("schemaString").asText())
        .asInstanceOf[org.apache.spark.sql.types.StructType])
        .getOrElse(sys.error(s"$dir: empty Delta table with no metaData"))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      spark.read.parquet(files.map(rel => table.resolve(rel).toString): _*)
  }

  def snapshot(spark: SparkSession, dir: String): DataFrame = {
    // the newest version may live only in the checkpoint if the JSON
    // commits were aged out after compaction
    val latest = (versions(dir) ++ lastCheckpointVersion(Paths.get(dir)))
      .maxOption.getOrElse(sys.error(s"no Delta commits in $dir"))
    snapshotAt(spark, dir, latest)
  }

  // ------------------------------------------------------ fixture/query

  // Delta-mirrored fixture table: two appends + one overwrite, read back
  // through the DELTA log (not the TxLog manifest) — proving a foreign
  // reader following only `_delta_log` sees exactly the committed state.
  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  private def deltaTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(dir, {
      val table = graft.Scratch.dir("graft_delta").toString
      val ev = graft.Tables.events(spark, dir)
      TxLog.commitAppend(ev.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.lit(3)) === 0), table)
      TxLog.commitOverwrite(ev.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.lit(3)) === 1), table)
      TxLog.commitAppend(ev.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.lit(3)) === 2), table)
      table
    })

  def prepare(spark: SparkSession, dir: String): Unit = { deltaTable(spark, dir); () }

  /** Oracle-checked query: replaying `_delta_log` (append, overwrite,
    * append) must yield exactly the last two thirds of the corpus — the
    * overwrite's `remove` actions really cancel the first append's `add`s.
    */
  def snapshotQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    snapshot(spark, deltaTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val snapshotQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id % 3 >= 1
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_delta_snapshot" -> snapshotQuery _
  )

  def oracles: Map[String, String] = Map(
    "q_delta_snapshot" -> snapshotQueryOracle
  )
}
