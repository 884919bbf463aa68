package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Minimal manifest-based transaction log: the Delta-log semantics the
  * reference leans on (`consumer_lake.py:48-54` writes Delta;
  * `dashboard.py:29-31` deliberately reads the RAW parquet fragments
  * dirty) — re-expressed without the Delta jars, which this offline
  * environment does not ship.
  *
  * Protocol (the same core as every log-structured table format):
  *  - data files are written to a throwaway subdirectory first; a write
  *    that dies mid-job leaves orphan files no reader ever lists;
  *  - a COMMIT is the atomic creation of `_txlog/v%08d.manifest`, the
  *    complete file listing of that table version (CREATE_NEW rename —
  *    the filesystem primitive object stores emulate with
  *    put-if-absent). Losing a version race throws
  *    FileAlreadyExistsException and the committer re-reads state and
  *    retries at the next version: optimistic concurrency;
  *  - `snapshot` reads exactly the files of the latest manifest
  *    (snapshot isolation); `snapshotAt` any older version (time
  *    travel); `dirtyScan` recursively globs the directory — the
  *    reference's dashboard read, shown here to DIFFER once orphans
  *    exist.
  *
  * Scale notes: the manifest is O(files), not O(rows) — readers list
  * one small file instead of the object store; at real scale manifests
  * get checkpointed/compacted exactly like Delta's _last_checkpoint,
  * which changes log maintenance, not the commit primitive.
  */
object TxLog {

  private def logDir(table: Path): Path = table.resolve("_txlog")

  private def manifestPath(table: Path, v: Long): Path =
    logDir(table).resolve(f"v$v%08d.manifest")

  /** Latest committed version, if any commit exists. */
  def currentVersion(dir: String): Option[Long] = {
    val ld = logDir(Paths.get(dir))
    if (!Files.isDirectory(ld)) None
    else {
      val vs = Files.list(ld).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(table: Path, v: Long): Seq[String] =
    Files.readAllLines(manifestPath(table, v)).asScala.toSeq.filter(_.nonEmpty)

  /** Append `df` as one atomic commit; returns the new version. */
  def commitAppend(df: DataFrame, dir: String): Long = {
    val table = Paths.get(dir)
    Files.createDirectories(logDir(table))
    val batch = "data-" + java.util.UUID.randomUUID().toString
    df.write.parquet(table.resolve(batch).toString)
    val added = Files.list(table.resolve(batch)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$batch/$n")
      .toSeq.sorted
    var committed = -1L
    while (committed < 0) {
      val cur = currentVersion(dir)
      val next = cur.getOrElse(0L) + 1
      val all = cur.map(readManifest(table, _)).getOrElse(Seq.empty) ++ added
      val tmp = Files.createTempFile(logDir(table), ".commit-", ".tmp")
      Files.write(tmp, all.mkString("\n").getBytes("UTF-8"))
      try {
        // no REPLACE_EXISTING: an existing target version means another
        // committer won the race — re-read and retry at the next version
        Files.move(tmp, manifestPath(table, next), StandardCopyOption.ATOMIC_MOVE)
        committed = next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
      }
    }
    committed
  }

  /** Snapshot-isolated read of a committed version (default: latest). */
  def snapshotAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val table = Paths.get(dir)
    val files = readManifest(table, version).map(rel => table.resolve(rel).toString)
    spark.read.parquet(files: _*)
  }

  def snapshot(spark: SparkSession, dir: String): DataFrame =
    snapshotAt(spark, dir, currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir")))

  /** The reference dashboard's raw directory glob (`dashboard.py:29-31`):
    * sees every parquet fragment, committed or not.
    */
  def dirtyScan(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(dir)

  /** Oracle-checked query: two committed batches + one orphaned
    * (uncommitted) write; the snapshot must aggregate exactly the
    * committed two-thirds of the corpus — proving readers never see a
    * half-finished writer.
    */
  def snapshotQuery(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("graft_txlog").toString
    val ev = Tables.events(spark, dir)
    commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
    commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 1), table)
    // a writer that died before its commit: files on disk, never logged
    ev.filter(pmod(col("event_id"), lit(3)) === 2)
      .write.parquet(Paths.get(table).resolve("data-orphan").toString)
    snapshot(spark, table)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val snapshotQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id % 3 < 2
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_txlog_snapshot" -> snapshotQuery _
  )

  def oracles: Map[String, String] = Map(
    "q_txlog_snapshot" -> snapshotQueryOracle
  )
}
