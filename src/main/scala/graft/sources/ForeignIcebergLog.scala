package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** FOREIGN-Iceberg commit history: the [[CommitLog]] primitives derived
  * from a STOCK Apache Iceberg v1/v2 tree (the `metadata/` JSON +
  * avro manifests — iceberg.apache.org/spec), so
  * `format("graft-txlog")` can tail an Iceberg table some other writer
  * owns, exactly as [[ForeignDeltaLog]] does for stock `_delta_log`
  * tables. The reference's lake is a directory of parquet another
  * process appends to; Iceberg is the other table format a production
  * deployment of that shape converges on.
  *
  * Version mapping: graft versions are the table's SEQUENCE NUMBERS
  * over the MAIN timeline (the spec's per-commit monotone counter —
  * stable across snapshot expiry, unlike list indexes; `snapshot-log`
  * supplies the main-line order, branch/WAP snapshots never enter).
  * v1 trees (no sequence numbers — all 0) fall back to 1-based
  * main-line ordinals; NOTE that ordinal offsets are stable only while
  * the owner expires no snapshot (expiry renumbers the list — resume a
  * v1-tree stream from a fresh checkpoint after an expiry, exactly as
  * a vacuumed-prefix Delta stream restarts). Sequence numbers, the v2
  * path every current writer produces, have no such caveat. A sequence
  * number with no main-line snapshot (consumed by a branch) is an
  * EMPTY version: the stream delivers nothing for it.
  *
  * Derivations:
  *  - per-version adds/removes by diffing consecutive snapshots' live
  *    DATA file sets (manifest walk, cached — snapshots are immutable);
  *    a `replace` (compaction) snapshot carries NO new rows and maps to
  *    (OPTIMIZE, dataChange=false), the protocol's bytes-only shape;
  *  - `#op`: append → WRITE, replace → OPTIMIZE, delete → DELETE,
  *    overwrite → OVERWRITE — or MERGE when the overwrite ALSO adds
  *    delete files (the MoR row-delta shape, whose appended batch mixes
  *    postimages and inserts exactly like a graft MERGE);
  *  - `#dv`: POSITION-delete files folded into per-data-file inline
  *    roaring descriptors ("i" storage, the Delta form the shared scan
  *    already applies), honoring the sequence rule (a delete names rows
  *    of files at `dataSeq <= deleteSeq` only). MoR DELETE commits thus
  *    plan exactly like native DV commits: nothing re-delivered on an
  *    append stream, hidden-row synthesis on a CDF stream. EQUALITY
  *    deletes refuse loudly — they name rows by VALUE, which no
  *    position bitmap can express without scanning; batch reads via
  *    [[IcebergLog.snapshot]] handle them.
  *
  * Scale + scope ceilings (documented, loud):
  *  - the delete-file fold reads position-delete parquet on the driver
  *    (O(deleted rows), cached per snapshot) — the same ceiling as the
  *    CDF-over-DV bitmap walk (SCALE.md);
  *  - identity-partitioned trees stream only when the data files CARRY
  *    their partition columns in-file (what real Iceberg writers store;
  *    probed once against one footer) — hive-layout trees whose values
  *    live only in manifests refuse with a pointer to the batch reader.
  */
object ForeignIcebergLog {

  /** A dir with an Iceberg `metadata/` tree but neither graft manifests
    * nor a Delta log: some other Iceberg writer owns it. */
  def isForeign(dir: String): Boolean = {
    val table = Paths.get(dir)
    !Files.isDirectory(table.resolve("_txlog")) &&
      !Files.isDirectory(table.resolve("_delta_log")) &&
      Files.isDirectory(table.resolve("metadata")) &&
      scala.util.Try(IcebergLog.currentMetadataPath(table)).isSuccess
  }

  private def longOf(n: JsonNode, f: String, dflt: Long = 0L): Long =
    Option(n.get(f)).map(_.asLong()).getOrElse(dflt)

  /** Main-line snapshots as (graft version, snapshot node), oldest
    * first — cached per metadata file (immutable once written). */
  private val lineCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, JsonNode)]]()

  private def mainLine(dir: String): Seq[(Long, JsonNode)] = {
    val table = Paths.get(dir)
    val metaPath = IcebergLog.currentMetadataPath(table)
      .toAbsolutePath.toString
    lineCache.computeIfAbsent(metaPath, { _ =>
      val meta = IcebergLog.readMetadata(table)
      val snaps = Option(meta.get("snapshots"))
        .map(_.asScala.toSeq).getOrElse(Seq.empty)
      val byId = snaps.map(s => s.get("snapshot-id").asLong() -> s).toMap
      val ordered: Seq[JsonNode] =
        Option(meta.get("snapshot-log")).map(_.asScala.toSeq
            .flatMap(e => byId.get(e.get("snapshot-id").asLong())))
          .filter(_.nonEmpty)
          .getOrElse(snaps.sortBy(s =>
            (longOf(s, "sequence-number"), longOf(s, "timestamp-ms"))))
      val maxSeq = ordered.map(longOf(_, "sequence-number")).maxOption
        .getOrElse(0L)
      if (maxSeq > 0L) ordered.map(s => longOf(s, "sequence-number") -> s)
      else ordered.zipWithIndex.map { case (s, i) => (i + 1L) -> s }
    })
  }

  def currentVersion(dir: String): Option[Long] =
    mainLine(dir).lastOption.map(_._1)

  /** Newest main-line snapshot at or below `v` (gap versions resolve to
    * their predecessor's state, like a Delta version range). */
  private def snapAtOrBefore(dir: String, v: Long): Option[(Long, JsonNode)] =
    mainLine(dir).filter(_._1 <= v).lastOption

  private def operationOf(s: JsonNode): String =
    Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
      .map(_.asText()).getOrElse("append")

  /** Canonical filesystem spelling of a spec path (absolute URI,
    * absolute path, or table-relative). Delete-file `file_path` VALUES
    * may arrive URI-escaped — decode those to the same form the
    * manifest resolution produces. */
  private def canon(table: Path, p: String): String =
    if (p.startsWith("file:"))
      java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")
        .replaceFirst("^file:/+", "/")
    else IcebergLog.resolve(table, p).toAbsolutePath.normalize().toString

  /** A snapshot's live file sets, cached per (table, snapshot id) —
    * manifests are immutable. */
  private val filesCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), IcebergLog.SnapshotFiles]()

  private def liveAt(dir: String, snap: JsonNode): IcebergLog.SnapshotFiles = {
    val table = Paths.get(dir)
    val sid = snap.get("snapshot-id").asLong()
    filesCache.computeIfAbsent((table.toAbsolutePath.toString, sid),
      _ => IcebergLog.liveFilesOf(table, snap.get("manifest-list").asText()))
  }

  private def dataRels(dir: String, snap: JsonNode): Set[String] = {
    val table = Paths.get(dir)
    liveAt(dir, snap).data.map(f => canon(table, f.path.toString)).toSet
  }

  /** dataChange adds/removes of one version. `replace` snapshots carry
    * no new rows (their re-adds are rewrites) — empty, like a native
    * OPTIMIZE. A gap version (sequence number with no main-line
    * snapshot) is empty by construction. */
  def commitDelta(dir: String, v: Long): (Seq[String], Seq[String]) = {
    val line = mainLine(dir)
    val cur = line.find(_._1 == v).getOrElse(return (Seq.empty, Seq.empty))._2
    if (operationOf(cur) == "replace") return (Seq.empty, Seq.empty)
    val curSet = dataRels(dir, cur)
    val prevSet = line.filter(_._1 < v).lastOption
      .map(p => dataRels(dir, p._2)).getOrElse(Set.empty[String])
    ((curSet -- prevSet).toSeq.sorted, (prevSet -- curSet).toSeq.sorted)
  }

  def commitDeltasRange(dir: String, fromV: Long,
      toV: Long): Seq[(Long, Seq[String], Boolean)] =
    (math.max(1L, fromV) to toV).map { v =>
      val (a, r) = commitDelta(dir, v)
      (v, a, r.nonEmpty)
    }

  /** Live DATA file rels at version `v` (canonical absolute paths the
    * shared scan resolves as-is). */
  def liveRelsAt(dir: String, v: Long): Seq[String] =
    snapAtOrBefore(dir, v).map(s => dataRels(dir, s._2).toSeq.sorted)
      .getOrElse(Seq.empty)

  /** (operation, dataChange) of one version — see the object doc for
    * the mapping. */
  def manifestOp(dir: String, v: Long): Option[(String, Boolean)] = {
    val line = mainLine(dir)
    line.find(_._1 == v) match {
      case None => Some(("WRITE", false)) // gap: nothing happened here
      case Some((_, s)) => operationOf(s) match {
        case "append" => Some(("WRITE", true))
        case "replace" => Some(("OPTIMIZE", false))
        case "delete" => Some(("DELETE", true))
        case "overwrite" =>
          // MoR row-delta (adds delete files): the appended batch mixes
          // postimages and inserts — a graft MERGE's exact CDF contract
          val prevDel = line.filter(_._1 < v).lastOption
            .map(p => liveAt(dir, p._2).posDeletes.map(_._1.toString).toSet)
            .getOrElse(Set.empty[String])
          val curDel = liveAt(dir, s).posDeletes.map(_._1.toString).toSet
          Some((if ((curDel -- prevDel).nonEmpty) "MERGE" else "OVERWRITE",
            true))
        case other => Some((other.toUpperCase(java.util.Locale.ROOT), true))
      }
    }
  }

  /** Per-data-file hidden ordinals at a snapshot: every live
    * position-delete file's (file_path, pos) rows, sequence rule
    * applied. Driver-side O(deleted rows), cached per snapshot. */
  private val hiddenCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Map[String, Seq[Long]]]()

  private def hiddenAt(dir: String, snap: JsonNode): Map[String, Seq[Long]] = {
    val table = Paths.get(dir)
    val sid = snap.get("snapshot-id").asLong()
    hiddenCache.computeIfAbsent((table.toAbsolutePath.toString, sid), { _ =>
      val sf = liveAt(dir, snap)
      if (sf.eqDeletes.nonEmpty)
        sys.error(s"$dir: the Iceberg snapshot carries EQUALITY delete " +
          "files — they name rows by value, which the streaming scan " +
          "cannot express as positions; read this table through " +
          "IcebergLog.snapshot (batch)")
      if (sf.posDeletes.isEmpty) Map.empty
      else {
        val spark = SparkSession.getActiveSession.getOrElse(
          sys.error("graft-txlog: no active SparkSession"))
        val seqOf: Map[String, Long] =
          sf.data.map(f => canon(table, f.path.toString) -> f.seq).toMap
        sf.posDeletes.flatMap { case (p, dseq) =>
          // pos casts to long defensively — the spec says int64, but an
          // int32-writing engine must not crash the fold
          spark.read.parquet(p.toString)
            .select(org.apache.spark.sql.functions.col("file_path"),
              org.apache.spark.sql.functions.col("pos").cast("long"))
            .collect().iterator
            .map(r => (canon(table, r.getString(0)), r.getLong(1), dseq))
        }
          .filter { case (f, _, dseq) => seqOf.get(f).exists(_ <= dseq) }
          .groupBy(_._1).map { case (f, xs) =>
            f -> xs.map(_._2).distinct.sorted }
      }
    })
  }

  /** Per-file DV descriptor JSONs in force at version `v` — position
    * deletes folded to the inline ("i") roaring form the shared scan
    * applies natively. */
  def manifestDvs(dir: String, v: Long): Map[String, String] =
    snapAtOrBefore(dir, v).map { case (_, snap) =>
      hiddenAt(dir, snap).map { case (f, positions) =>
        val bytes = DeletionVectors.serialize(positions)
        f -> (s"""{"storageType":"i","pathOrInlineDv":""" +
          s""""${DeletionVectors.z85Encode(bytes)}",""" +
          s""""sizeInBytes":${bytes.length},""" +
          s""""cardinality":${positions.size}}""")
      }
    }.getOrElse(Map.empty)

  /** Iceberg has no change-data files in the tree — MoR DELETE commits
    * replay through the DV-diff synthesis, MERGE-shaped commits refuse
    * (or skip), exactly the native cdc-less contract. */
  def manifestCdc(dir: String, v: Long): Seq[String] = Seq.empty

  /** Partition columns as SCAN-APPENDED columns: none — identity
    * values live IN the data files on real Iceberg writers (probed in
    * [[schema]]); the scan reads them as ordinary data columns. */
  def partitionColumnsOf(dir: String): Seq[String] = Seq.empty

  /** Identity-partition probe results, cached per metadata file (one
    * footer read per metadata VERSION, as advertised — not per
    * schema() call, which planning invokes repeatedly). */
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  private def schemaFor(spark: SparkSession, dir: String,
      sid: Option[Int]): StructType = {
    val table = Paths.get(dir)
    val meta = IcebergLog.readMetadata(table)
    val schema = IcebergLog.currentSchema(meta, sid).getOrElse(
      sys.error(s"$dir: the Iceberg schema carries a type the engine " +
        "does not map — refusing to infer"))
    // identity-partition probe: stream only when data files CARRY the
    // partition columns (one footer read, cached per metadata version)
    val metaPath = IcebergLog.currentMetadataPath(table)
      .toAbsolutePath.toString
    val missing = probeCache.computeIfAbsent(metaPath, { _ =>
      mainLine(dir).lastOption.flatMap { case (_, snap) =>
        val sf = liveAt(dir, snap)
        val pKeys = sf.data.flatMap(_.partition.keys).distinct
        if (pKeys.isEmpty || sf.data.isEmpty) None
        else {
          val inFile = spark.read.parquet(sf.data.head.path.toString)
            .schema.fieldNames.toSet
          Some(pKeys.filterNot(inFile)).filter(_.nonEmpty)
            .map(_.mkString(", "))
        }
      }
    })
    missing.foreach(m =>
      sys.error(s"$dir: identity-partitioned Iceberg tree whose " +
        s"data files do not carry $m in-file (hive-style layout) — the " +
        "streaming scan reads file columns only; read through " +
        "IcebergLog.snapshot (manifest partition attach)"))
    schema
  }

  def schema(spark: SparkSession, dir: String): StructType =
    schemaFor(spark, dir, None)

  /** Table schema AT a version: the snapshot's own recorded schema-id
    * (time travel presents that era's columns). */
  def schemaAt(spark: SparkSession, dir: String, v: Long): StructType = {
    val sid = snapAtOrBefore(dir, v)
      .flatMap(s => Option(s._2.get("schema-id")).map(_.asInt()))
    schemaFor(spark, dir, sid)
  }

  /** `timestampAsOf` resolution: the newest main-line snapshot whose
    * commit timestamp is ≤ `tsMillis` (the Iceberg snapshot-log
    * contract, same shape as [[DeltaLog.versionAsOf]]). */
  def versionAsOf(dir: String, tsMillis: Long): Long =
    mainLine(dir).filter(s => longOf(s._2, "timestamp-ms") <= tsMillis)
      .lastOption.map(_._1)
      .getOrElse(sys.error(s"$dir: no Iceberg snapshot at or before " +
        s"$tsMillis"))
}
