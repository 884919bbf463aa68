package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** `Files.list` with the stream closed (it holds a directory fd). */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def manifestPath(table: Path, v: Long): Path =
    logDir(table).resolve(f"v$v%08d.manifest")

  /** The commit-point file of version `v` — the Iceberg mirror reads
    * its mtime as the snapshot timestamp. */
  private[sources] def manifestPathOf(table: Path, v: Long): Path =
    manifestPath(table, v)

  /** Latest committed version, if any commit exists. */
  def currentVersion(dir: String): Option[Long] = {
    val ld = logDir(Paths.get(dir))
    if (!Files.isDirectory(ld)) None
    else {
      val vs = listDir(ld).iterator
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Data-file lines only: `#`-prefixed lines are commit METADATA (the
    * `#txn` idempotence token) and invisible to every path consumer —
    * snapshots, backfill diffs, vacuum, CDF. Pre-metadata manifests
    * have no `#` lines, so old tables parse unchanged. */
  private def readManifest(table: Path, v: Long): Seq[String] =
    Files.readAllLines(manifestPath(table, v)).asScala.toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#"))

  /** The `#dv <rel> <descriptor-json>` header lines (URL-encoded) of
    * one manifest: the DELETION VECTORS in force for this version's
    * files — merge-on-read row-level deletes, riding the commit point
    * like every other commit fact. Invisible to path consumers (the
    * `#` rule); absent on pre-DV manifests. Carried forward by later
    * commits for files still live; a rewrite that replaces a file
    * drops its entry (the rewrite materialized the deletes).
    */
  private[graft] def manifestDvs(table: Path, v: Long): Map[String, String] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#dv ")).map(_.split(" ", 3))
      .collect { case p if p.length >= 3 => (dec(p(1)), dec(p(2).trim)) }
      .toMap

  /** Does version `v` carry deletion vectors? The DSv2 scan refuses DV
    * tables (its vectorized parquet readers cannot hide rows by
    * ordinal yet) — resurrecting deleted rows silently would be far
    * worse than the refusal. */
  private[graft] def hasDvs(dir: String, v: Long): Boolean =
    manifestDvs(Paths.get(dir), v).nonEmpty

  private def dvLines(dvs: Map[String, String]): String =
    dvs.toSeq.sortBy(_._1)
      .map { case (rel, d) => s"#dv ${enc(rel)} ${enc(d)}\n" }.mkString

  /** ROW TRACKING (`#rid <rel> <base> <n> <v0>` header lines): each
    * live file's baseRowId, row count, and the version that committed
    * its rows — a row's stable id is `base + ordinal`, and it survives
    * merge-on-read DML because DVs hide rows without moving them.
    * Carried forward like `#dv`; dropped with a rewritten file. The
    * table's id high-water mark rides `#ridhwm <N>` and NEVER
    * regresses (removed files' ids are spent forever, the spec's
    * no-reissue rule). */
  private[graft] final case class Rid(base: Long, n: Long, v0: Long)

  private[graft] def manifestRids(table: Path, v: Long): Map[String, Rid] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#rid ")).map(_.split(" ", 5))
      .collect { case p if p.length >= 5 =>
        (dec(p(1)), Rid(p(2).toLong, p(3).toLong, p(4).trim.toLong))
      }.toMap

  private[graft] def manifestRidHwm(table: Path, v: Long): Option[Long] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#ridhwm "))
      .map(_.stripPrefix("#ridhwm ").trim.toLong).nextOption()

  private def ridLines(rids: Map[String, Rid], hwm: Option[Long],
      mat: Set[String] = Set.empty): String =
    hwm.map(h => s"#ridhwm $h\n").getOrElse("") +
      rids.toSeq.sortBy(_._1).map { case (rel, r) =>
        s"#rid ${enc(rel)} ${r.base} ${r.n} ${r.v0}\n"
      }.mkString +
      mat.toSeq.sorted.map(rel => s"#ridmat ${enc(rel)}\n").mkString

  /** Files whose rows carry MATERIALIZED row ids (an OPTIMIZE rewrote
    * them; ids ride the named column, not base + position). Carried
    * forward like `#rid`. */
  private[graft] def manifestRidMat(table: Path, v: Long): Set[String] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#ridmat "))
      .map(l => dec(l.stripPrefix("#ridmat ").trim)).toSet

  private def matRowIdCol(dir: String): Option[String] =
    DeltaLog.tableConfig(Paths.get(dir))
      .get("delta.rowTracking.materializedRowIdColumnName")

  private def rowTrackingOn(dir: String): Boolean =
    DeltaLog.tableConfig(Paths.get(dir)).get("delta.enableRowTracking")
      .contains("true")

  /** Per-file row counts of newly staged files on a row-tracked table:
    * one footer read per new file (metadata-only), zero table reads.
    * Loud when a footer is unreadable — silently skipping a file would
    * alias its ids onto the next batch. The actual id SPANS are claimed
    * inside [[commitFiles]]' claim loop against the manifest mark that
    * attempt links over (bases are manifest metadata, not file
    * contents, so a lost version race just re-claims) — the rewrite/DV
    * paths claim via [[freshRids]] instead, protected by their
    * base-version serialization check. */
  private def ridCountsOf(dir: String, table: Path,
      added: Seq[String]): Seq[(String, Long)] = {
    if (!rowTrackingOn(dir) || added.isEmpty) return Seq.empty
    added.sorted.map { rel =>
      rel -> DeltaLog.fileRowCount(table.resolve(rel)).getOrElse(
        sys.error(s"$dir: row tracking requires parquet footer row " +
          s"counts — cannot read $rel"))
    }
  }

  /** Fresh id spans claimed from the CURRENT high-water mark — used by
    * the rewrite/DV commit paths only, whose `base + 1` serialization
    * fails loudly on any racing commit (so a stale claim can never
    * land). Fresh values' `v0` is stamped by the committer at link
    * time (the claimed version). */
  private def freshRids(dir: String, table: Path,
      added: Seq[String]): (Map[String, (Long, Long)], Option[Long]) = {
    val counts = ridCountsOf(dir, table, added)
    if (counts.isEmpty) return (Map.empty, None)
    val cur = currentVersion(dir)
    var next = cur.flatMap(manifestRidHwm(table, _)).getOrElse(-1L) + 1
    val m = counts.map { case (rel, n) =>
      val e = rel -> ((next, n)); next = Math.addExact(next, n); e
    }.toMap
    (m, Some(next - 1))
  }

  /** The `delta.rowTracking` domain-metadata action version `v` should
    * mirror: present exactly when its high-water mark moved. */
  private def ridDomain(table: Path, v: Long): Map[String, String] = {
    val h = manifestRidHwm(table, v)
    val ph = if (v <= 1) None else manifestRidHwm(table, v - 1)
    if (h.isDefined && h != ph)
      Map("delta.rowTracking" -> s"""{"rowIdHighWaterMark":${h.get}}""")
    else Map.empty
  }

  /** Mirror-side rowIds for version `v`: (baseRowId, Delta
    * defaultRowCommitVersion) for every rel among `rels` that carries a
    * rid — fresh adds stamp their own version, DV re-adds keep the
    * ORIGINAL commit version per the spec. */
  private def mirrorRids(table: Path, v: Long,
      rels: Set[String]): Map[String, (Long, Long)] =
    manifestRids(table, v).collect {
      case (rel, r) if rels(rel) => rel -> ((r.base, r.v0 - 1))
    }

  /** Change-data file rels a commit recorded (`#cdc` header lines) —
    * the manifest is the commit point, so the cdc files and the data
    * change land atomically, and backfill re-emits the `cdc` actions
    * after a committer crash. */
  private[graft] def manifestCdc(table: Path, v: Long): Seq[String] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#cdc "))
      .map(l => dec(l.stripPrefix("#cdc ").trim)).toSeq

  private def cdcLines(rels: Seq[String]): String =
    rels.sorted.map(r => s"#cdc ${enc(r)}\n").mkString

  /** Write one commit's row-level change records as PROTOCOL.md
    * change-data files under `_change_data/` (never listed as table
    * data; VACUUM's data-batch walk does not touch the directory — a
    * dedicated sweep reclaims cdc files past retention). `df` carries
    * the table columns + `_change_type`. */
  private def writeCdcFiles(df: DataFrame, table: Path): Seq[String] = {
    val sub = "_change_data/cdc-" + java.util.UUID.randomUUID()
    df.write.parquet(table.resolve(sub).toString)
    dataFilesUnder(table.resolve(sub), s"$sub/").sorted
  }

  private def cdfEnabled(table: Path): Boolean =
    DeltaLog.tableConfig(table).get("delta.enableChangeDataFeed")
      .contains("true")

  /** The `#txn <appId> <version>` token of one manifest, if the commit
    * carried one. Rides the manifest — the COMMIT POINT — so the token
    * and the data land in the same atomic link: no window where a
    * crash separates them.
    */
  private[graft] def manifestTxn(table: Path, v: Long): Option[(String, Long)] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#txn ")).map { l =>
        val p = l.split(" ", 3)
        (p(1), p(2).toLong)
      }.nextOption()

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  /** The `#op <operation> <0|1 dataChange>` header of one manifest: the
    * commit's own classification, recorded AT COMMIT TIME in the commit
    * point itself — so the streaming source and the mirror backfill
    * never need the (later-written, compactable) Delta mirror to tell a
    * bytes-only OPTIMIZE from a data-changing rewrite. Absent on
    * manifests from pre-`#op` writers; consumers then fall back to the
    * mirror and classify conservatively. */
  private[graft] def manifestOp(table: Path, v: Long): Option[(String, Boolean)] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#op ")).map(_.split(" ", 3))
      // a truncated/malformed header (fewer than 3 tokens) degrades to
      // the documented mirror-based conservative classification instead
      // of throwing ArrayIndexOutOfBounds mid-classification
      .collect { case p if p.length >= 3 => (dec(p(1)), p(2).trim == "1") }
      .nextOption()

  /** The `#props k=v ...` header (URL-encoded pairs) of one manifest:
    * table properties a property commit installed, durable in the
    * COMMIT POINT — a committer that dies between manifest link and
    * mirror write no longer loses installed governance; the next
    * commit's backfill re-mirrors the properties from here. */
  private[graft] def manifestProps(table: Path, v: Long): Map[String, String] =
    Files.readAllLines(manifestPath(table, v)).asScala.iterator
      .filter(_.startsWith("#props ")).flatMap(_.split(" ").iterator.drop(1))
      // same degradation rule as [[manifestOp]]: a token without '='
      // is a malformed pair — skip it rather than fabricate a key
      .collect { case kv if kv.indexOf('=') > 0 =>
        val i = kv.indexOf('=')
        (dec(kv.take(i)), dec(kv.drop(i + 1)))
      }.toMap

  /** Highest committed idempotence-token version for `appId` — the
    * exactly-once check. Manifests scan newest-first and stop at the
    * first hit (an app's versions are committed in increasing order,
    * Delta's own SetTransaction assumption, so the first hit IS the
    * max); a steady-state streaming writer finds its token within a
    * manifest or two. If the manifest prefix was aged out past the
    * app's last token, the DELTA mirror answers instead — its
    * checkpoints carry the latest txn per appId (the protocol
    * requirement that exists precisely for this).
    */
  def lastTxnVersion(spark: org.apache.spark.sql.SparkSession, dir: String,
      appId: String): Option[Long] = {
    val table = Paths.get(dir)
    currentVersion(dir).flatMap(cur => scanTxn(table, cur, appId)) match {
      case hit @ Some(_) => hit
      case None =>
        // distinguish "scanned to commit 1, genuinely no token" from
        // "prefix (or the whole manifest set) aged out" — anything
        // short of a complete scan consults the mirror, whose
        // checkpoints preserve tokens past compaction
        if (Files.exists(manifestPath(table, 1L))) None
        else DeltaLog.txnVersion(spark, dir, appId)
    }
  }

  /** Manifest-only token scan, newest-first, `upTo` down to the oldest
    * retained manifest. */
  private def scanTxn(table: Path, upTo: Long, appId: String): Option[Long] = {
    var v = upTo
    while (v >= 1 && Files.exists(manifestPath(table, v))) {
      manifestTxn(table, v) match {
        case Some((a, tv)) if a == appId => return Some(tv)
        case _ => ()
      }
      v -= 1
    }
    None
  }

  /** Data-parquet files under `p`, recursively, as table-relative paths
    * — partitioned batches nest `col=value` directories. */
  private def dataFilesUnder(p: Path, prefix: String): Seq[String] =
    listDir(p).flatMap { f =>
      val n = f.getFileName.toString
      if (Files.isDirectory(f)) dataFilesUnder(f, s"$prefix$n/")
      else if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        Seq(s"$prefix$n")
      else Seq.empty
    }

  private def writeBatch(df: DataFrame, table: Path,
      partitionBy: Seq[String]): Seq[String] = {
    val batch = "data-" + java.util.UUID.randomUUID().toString
    val w = df.write
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(table.resolve(batch).toString)
    dataFilesUnder(table.resolve(batch), s"$batch/").sorted
  }

  /** Highest TxLog version known mirrored to Delta with no gaps below
    * it, per table — steady-state commits then verify O(new versions)
    * instead of O(V) filesystem stats from version 1 on every commit
    * (O(V^2) over a table's life). A fresh process re-derives the floor
    * by one forward scan; a failed backfill mirror keeps the floor put,
    * so the next commit retries exactly the still-missing versions.
    * Updates are max-merged: racing committers can only advance it.
    */
  private val mirrorFloor = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Spec hook: forget the in-process floor, modeling a fresh process
    * that must re-derive mirror state from disk (the crashed-committer
    * simulations delete mirror files this process already verified).
    */
  private[graft] def resetMirrorCache(): Unit = mirrorFloor.clear()

  /** Partition-column names a manifest-relative path encodes (hive
    * `col=value` segments, escaped form — equality is all that's
    * needed). */
  private def pathPartCols(rel: String): Seq[String] =
    rel.split("/").dropRight(1).toSeq.filter(_.contains("="))
      .map(seg => seg.take(seg.indexOf('=')))

  private def commitFiles(dir: String, added: Seq[String], carryPrevious: Boolean,
      schemaJson: String, txn: Option[(String, Long)] = None,
      props: Map[String, String] = Map.empty,
      ridCounts: Seq[(String, Long)] = Seq.empty): Long = {
    val table = Paths.get(dir)
    var committed = -1L
    var removed: Seq[String] = Seq.empty
    while (committed < 0) {
      val cur = currentVersion(dir)
      // idempotence: re-checked on EVERY claim attempt — losing the
      // version race to a concurrent retry of the SAME (appId, version)
      // must surface as a skip, not a duplicate commit
      for ((app, tv) <- txn; last <- cur.flatMap(c => scanTxn(table, c, app)))
        if (last >= tv) return -1L
      val next = cur.getOrElse(0L) + 1
      val previous = cur.map(readManifest(table, _)).getOrElse(Seq.empty)
      // a table's partitioning is FIXED at its first commit (Delta's own
      // rule): a mismatched later commit would silently corrupt reads —
      // the mirror's metaData would disagree with the files' layout and
      // the grouped fallback would null out or drop the column. Enforced
      // loudly against the PREVIOUS manifest's layout (overwrites
      // included — repartitioning a table is a new table).
      for (p <- previous.headOption; a <- added.headOption) {
        val (pc, ac) = (pathPartCols(p), pathPartCols(a))
        if (pc != ac)
          sys.error(s"$dir: partitioning is fixed at the first commit — " +
            s"table is partitioned by [${pc.mkString(",")}] but this commit " +
            s"writes [${ac.mkString(",")}]")
      }
      val all = (if (carryPrevious) previous else Seq.empty) ++ added
      removed = if (carryPrevious) Seq.empty else previous
      // deletion vectors carry forward with the files they hide rows
      // of; an overwrite drops every file, DVs included
      val prevDvs =
        if (carryPrevious) cur.map(manifestDvs(table, _)).getOrElse(Map.empty)
        else Map.empty[String, String]
      // row-tracking ids carry forward with their files; an overwrite
      // drops the entries but NEVER the high-water mark (spent ids are
      // spent — the spec's no-reissue rule)
      val prevRids =
        if (carryPrevious) cur.map(manifestRids(table, _)).getOrElse(Map.empty)
        else Map.empty[String, Rid]
      // fresh id spans are claimed HERE, inside the claim loop, against
      // the manifest mark this attempt actually links over: a lost
      // version race re-reads the racer's (possibly advanced) mark and
      // RE-CLAIMS — stale bases can never alias ids across writers.
      // Re-derivation is free because rid bases are manifest metadata,
      // not file contents (ids read as base + position).
      val curHwm = cur.flatMap(manifestRidHwm(table, _)).getOrElse(-1L)
      var nextRid = curHwm + 1
      val newRids = ridCounts.map { case (rel, n) =>
        val e = rel -> Rid(nextRid, n, next)
        nextRid = Math.addExact(nextRid, n); e
      }.toMap
      val rids = prevRids ++ newRids
      val hwm = (cur.flatMap(manifestRidHwm(table, _)).toSeq ++
        (if (ridCounts.isEmpty) Seq.empty else Seq(nextRid - 1))).maxOption
      val prevMat =
        if (carryPrevious)
          cur.map(manifestRidMat(table, _)).getOrElse(Set.empty[String])
        else Set.empty[String]
      val tmp = Files.createTempFile(logDir(table), ".commit-", ".tmp")
      val header = txn.map { case (app, tv) => s"#txn $app $tv\n" }.getOrElse("") +
        (if (props.isEmpty) ""
         else "#props " + props.toSeq.sortBy(_._1)
           .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString(" ") + "\n") +
        dvLines(prevDvs) + ridLines(rids, hwm, prevMat) +
        "#op WRITE 1\n" // appends/overwrites always change data
      Files.write(tmp, (header + all.mkString("\n")).getBytes("UTF-8"))
      try {
        // createLink is the true put-if-absent: link(2) fails with
        // EEXIST when the version is taken. (An ATOMIC_MOVE rename
        // would silently REPLACE an existing manifest on POSIX —
        // clobbering the committer that won the race.)
        Files.createLink(manifestPath(table, next), tmp)
        Files.deleteIfExists(tmp)
        committed = next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
      }
    }
    mirrorWithBackfill(dir, table, committed, added, removed, schemaJson,
      txn = txn, props = props)
    committed
  }

  /** Interop mirror (DeltaLog): the _txlog manifest is the commit point;
    * the Delta commit file is written after it, so a foreign Delta
    * reader may briefly trail ours by one version but never sees an
    * uncommitted state. Same put-if-absent primitive inside.
    *
    * BACKFILL first: a committer that died between manifest link and
    * mirror leaves a Delta version permanently missing, and DeltaLog's
    * replay (correctly) refuses gapped logs. Any missing predecessor is
    * reconstructed from the manifests themselves — version v's Delta
    * delta IS manifest(v) minus manifest(v-1). If an old manifest was
    * vacuumed away the backfill is impossible; the loud replay guard
    * then remains the stop.
    *
    * Best-effort throughout: the _txlog manifest IS the durable commit
    * point, so a mirror-side IOException must not fail a write that
    * already committed — the next commit's backfill repairs the missing
    * Delta version (and replay refuses gapped logs loudly meanwhile).
    */
  private def mirrorWithBackfill(dir: String, table: Path, committed: Long,
      added: Seq[String], removed: Seq[String], schemaJson: String,
      dataChange: Boolean = true, operation: String = "WRITE",
      txn: Option[(String, Long)] = None,
      props: Map[String, String] = Map.empty,
      cdcAdds: Seq[String] = Seq.empty): Unit = {
    var floor = mirrorFloor.getOrElse(dir, 0L)
    var contiguous = true
    var v = floor + 1
    while (v < committed) {
      if (!DeltaLog.isMirrored(table, v))
        try {
          val prev = if (v == 1) Seq.empty[String] else readManifest(table, v - 1)
          val cur = readManifest(table, v)
          // a backfilled commit's token, classification, and properties
          // come from ITS manifest headers, so the mirror's txn history,
          // dataChange flags, and installed governance stay
          // version-accurate across a committer crash
          val (bop, bdc) = manifestOp(table, v).getOrElse(("WRITE", true))
          // a backfilled DV delete re-derives its descriptor updates
          // from the manifests' #dv diff, so the mirror's remove+add
          // pairs stay version-accurate across a committer crash
          val dvPrev = if (v == 1) Map.empty[String, String]
            else manifestDvs(table, v - 1)
          val dvUp = manifestDvs(table, v).collect {
            case (rel, d) if !dvPrev.get(rel).contains(d) =>
              rel -> ((d, dvPrev.get(rel)))
          }
          // a file both re-added AND DV-bearing (RESTORE) must mirror
          // through the remove+add DV pair ONLY — two add actions for
          // one path in one version would make replay ambiguous; a
          // surviving file whose DV was DROPPED (RESTORE to a
          // pre-delete state) re-adds plain, so replay stops hiding
          // the rows the restore brought back
          val dvDropped = (dvPrev.keySet -- manifestDvs(table, v).keySet)
            .intersect(cur.toSet).toSeq.sorted
          val addedV = (cur.filterNot(prev.toSet).filterNot(dvUp.keySet) ++
            dvDropped).distinct
          DeltaLog.mirrorCommit(table, v,
            addedV, prev.filterNot(cur.toSet), schemaJson,
            dataChange = bdc, operation = bop,
            txn = manifestTxn(table, v), props = manifestProps(table, v),
            dvUpdates = dvUp, cdcAdds = manifestCdc(table, v),
            // the manifest mtime IS the commit point: backfilled ICTs
            // (and deletionTimestamps) stamp commit time, not backfill
            // wall-clock — TIMESTAMP AS OF stays historically accurate
            commitTime = scala.util.Try(
              Files.getLastModifiedTime(manifestPath(table, v)).toMillis)
              .toOption,
            // row-tracking ids re-derive from the manifests' #rid state,
            // so baseRowIds stay version-accurate across a crash too
            rowIds = mirrorRids(table, v, addedV.toSet ++ dvUp.keySet),
            domains = ridDomain(table, v))
        } catch { case _: java.io.IOException => () }
      if (contiguous && DeltaLog.isMirrored(table, v)) floor = v
      else contiguous = false
      v += 1
    }
    try {
      // same DV-diff discipline as the backfill: a live RESTORE can
      // re-instate, change, or drop descriptors on files it re-adds or
      // keeps — the mirror must carry each through the spec's
      // remove+add pair (changed) or a plain re-add (dropped), never
      // two adds for one path in one version
      val dvNowL = manifestDvs(table, committed)
      val dvPrevL = if (committed <= 1) Map.empty[String, String]
        else manifestDvs(table, committed - 1)
      val dvUpL = dvNowL.collect {
        case (rel, d) if !dvPrevL.get(rel).contains(d) =>
          rel -> ((d, dvPrevL.get(rel)))
      }
      val curSetL = readManifest(table, committed).toSet
      val dvDroppedL = (dvPrevL.keySet -- dvNowL.keySet)
        .intersect(curSetL).toSeq.sorted
      val addedL = (added.filterNot(dvUpL.keySet) ++ dvDroppedL).distinct
      DeltaLog.mirrorCommit(table, committed, addedL, removed, schemaJson,
        dataChange, operation, txn, props, cdcAdds = cdcAdds,
        dvUpdates = dvUpL,
        rowIds = mirrorRids(table, committed, addedL.toSet ++ dvUpL.keySet),
        domains = ridDomain(table, committed))
      if (contiguous && floor == committed - 1) floor = committed
    } catch { case _: java.io.IOException => () }
    mirrorFloor.updateWith(dir)(old => Some(math.max(old.getOrElse(0L), floor)))
    // NOTE: a BACKFILLED version from a pre-`#op` writer mirrors with
    // dataChange=true — without the header the manifest can't tell a
    // compaction from a write, and the conservative direction for feeds
    // is to surface rows, never to lose them. `#op` manifests backfill
    // with their recorded classification.
  }

  /** `delta.appendOnly=true` refuses anything that removes or rewrites
    * committed rows. */
  private def enforceAppendOnly(dir: String, op: String): Unit =
    if (DeltaLog.tableConfig(Paths.get(dir)).get("delta.appendOnly").contains("true"))
      sys.error(s"$dir: delta.appendOnly=true — $op would remove committed " +
        "rows and is refused")

  /** Metadata-only SET TBLPROPERTIES on a TxLog table: an empty append
    * commit (same file set, next version) whose mirror metaData carries
    * the merged configuration — so the version mapping between the
    * manifest and the Delta log stays 1:1, and foreign readers see the
    * properties. Used to install CHECK constraints and appendOnly.
    */
  def setTableProperties(spark: org.apache.spark.sql.SparkSession, dir: String,
      props: Map[String, String]): Long = {
    val table = Paths.get(dir)
    require(Files.isDirectory(logDir(table)), s"$dir: not a TxLog table")
    DeltaLog.warmMetaCache(spark, table)
    val schemaJson = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData — commit data before setting properties"))
    // enabling row tracking names the MATERIALIZED row-id column up
    // front (the spec's delta.rowTracking.materializedRowIdColumnName):
    // OPTIMIZE preserves ids by writing them under this name, and
    // readers — ours and foreign — prefer it over base + position
    val cfg0 = DeltaLog.tableConfig(table)
    val effPropsSet =
      if (props.get("delta.enableRowTracking").contains("true") &&
          !cfg0.contains("delta.rowTracking.materializedRowIdColumnName") &&
          !props.contains("delta.rowTracking.materializedRowIdColumnName"))
        props + ("delta.rowTracking.materializedRowIdColumnName" ->
          s"_row-id-col-${java.util.UUID.nameUUIDFromBytes(
            table.toAbsolutePath.toString.getBytes("UTF-8"))}")
      else props
    val v = commitFiles(dir, Seq.empty, carryPrevious = true, schemaJson,
      props = effPropsSet)
    // installing GOVERNANCE must be durable in the mirror enforcement
    // reads from — a swallowed mirror IO failure here would silently
    // disable the very constraints being installed. (The #props
    // manifest line lets the next commit's backfill repair it too.)
    if (!DeltaLog.isMirrored(table, v))
      sys.error(s"$dir: property commit $v landed but its Delta mirror " +
        "write failed — retry setTableProperties")
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** GENERATED COLUMNS (`delta.generationExpression` field metadata —
    * the Delta writer feature): a batch that OMITS a generated column
    * gets it computed from the expression — the generated-date-
    * partition pattern (`event_date GENERATED ALWAYS AS (date(ts))`,
    * partitioned on it, pruned by every date query); a batch that
    * PROVIDES one is validated — any row where the provided value
    * differs from the computed one refuses the commit (stock Delta's
    * consistency rule; a silently divergent generated column would
    * break the pruning contract it exists for). One projection + at
    * most one validation aggregate over the batch.
    */
  private def generatedColumnNames(dir: String): Seq[String] =
    DeltaLog.currentSchemaString(Paths.get(dir)).toSeq.flatMap { js =>
      org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType].fields.toSeq
        .filter(_.metadata.contains("delta.generationExpression")).map(_.name)
    }

  /** Complete + validate a batch in ONE pass over it:
    *
    *  - GENERATED COLUMNS (`delta.generationExpression` field metadata,
    *    the Delta writer feature): an OMITTED generated column is
    *    computed from its expression — the generated-date-partition
    *    pattern; a PROVIDED one is validated (any row whose value
    *    differs from the computed one refuses the commit — stock
    *    Delta's consistency rule, since a silently divergent generated
    *    column breaks the pruning contract it exists for).
    *  - CHECK CONSTRAINTS (`delta.constraints.<name>` properties):
    *    any violating row refuses — false OR null violates, Delta's
    *    invariant rule (SQL's null-passes CHECK would let a null sneak
    *    past a bound). Constraints see the COMPLETED batch, so they may
    *    reference generated columns.
    *
    * All checks share a single aggregation over the batch (map-side
    * combined), before any file stages; the parquet write is then the
    * only other pass — at 100 TB the incoming batch is scanned twice
    * total, the table never.
    */
  private def validateAndComplete(df: DataFrame, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, lit, sum, when}
    val schemaJson = DeltaLog.currentSchemaString(Paths.get(dir))
      .getOrElse(return df)
    val gen = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fields.toSeq
      .filter(_.metadata.contains("delta.generationExpression"))
      .map(f => (f.name, f.metadata.getString("delta.generationExpression"),
        f.dataType))
    val cs = DeltaLog.tableConfig(Paths.get(dir)).toSeq.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        (k.stripPrefix("delta.constraints."), v)
    }.sortBy(_._1)
    val (provided, absent) = gen.partition(g => df.columns.contains(g._1))
    // column DEFAULTS (CURRENT_DEFAULT metadata, the allowColumnDefaults
    // writer feature): an omitted defaulted column fills with the
    // default for NEW writes; pre-evolution rows read EXISTS_DEFAULT
    // natively from the schema-typed scans. Unlike generated columns,
    // provided values always win — no validation.
    val defaults = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fields.toSeq
      .filter(f => f.metadata.contains("CURRENT_DEFAULT") &&
        !f.metadata.contains("delta.generationExpression") &&
        !df.columns.contains(f.name))
      .map(f => (f.name, f.metadata.getString("CURRENT_DEFAULT"), f.dataType))
    val completed = (absent ++ defaults).foldLeft(df) { case (d, (n, e, dt)) =>
      d.withColumn(n, expr(e).cast(dt))
    }
    val genChecks = provided.map { case (n, e, dt) =>
      (s"generated column '$n' must equal ($e)",
        sum(when(completed.col(n) <=> expr(e).cast(dt), 0L).otherwise(1L)))
    }
    val csChecks = cs.map { case (n, e) =>
      (s"CHECK constraint '$n' ($e) is violated",
        sum(when(coalesce(expr(e), lit(false)), 0L).otherwise(1L)))
    }
    val checks = genChecks ++ csChecks
    if (checks.nonEmpty) {
      val row = completed
        .agg(checks.head._2.as("c0"),
          checks.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"c${i + 1}") }: _*)
        .collect().head
      checks.zipWithIndex.foreach { case ((msg, _), i) =>
        val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
        if (bad > 0)
          sys.error(s"$dir: $msg by $bad row(s) — commit refused")
      }
    }
    alignToMirror(completed, dir)
  }

  /** Reorder `df`'s columns to the mirrored schema's field order when
    * the name sets match — generated columns re-appended by completion
    * land at the END, and [[effectiveSchemaJson]]'s order-sensitive
    * match would otherwise re-emit a metadata-stripped schema after
    * every rewrite of a mid-schema generated column. */
  private def alignToMirror(df: DataFrame, dir: String): DataFrame =
    DeltaLog.currentSchemaString(Paths.get(dir)).map { js =>
      val names = org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
      if (names.toSet == df.columns.toSet && names != df.columns.toSeq)
        df.select(names.map(col): _*)
      else df
    }.getOrElse(df)

  /** The schemaJson a commit should mirror: when the batch's fields
    * (names + types, order included) match the mirrored schema, keep
    * the MIRROR's json — it carries field metadata (generation
    * expressions, defaults, mapping ids) that `df.schema` can't know,
    * and re-emitting a metadata-stripped twin would drop them. A
    * genuine field change (schema EVOLUTION) merges field-by-field:
    * every surviving field keeps the mirror's metadata (and stays
    * nullable if it was), new fields enter as the batch typed them —
    * so a widening append can never silently strip generation
    * expressions or defaults from existing columns. Evolution that
    * would DROP a governed column (one carrying a generation
    * expression or a default) refuses loudly: silently un-governing a
    * column is never what an append meant — clear the metadata first
    * if the drop is intended.
    */
  private def effectiveSchemaJson(df: DataFrame, dir: String): String = {
    import org.apache.spark.sql.types.StructType
    DeltaLog.currentSchemaString(Paths.get(dir)) match {
      case None => df.schema.json
      case Some(prev) =>
        val p = org.apache.spark.sql.types.DataType.fromJson(prev)
          .asInstanceOf[StructType]
        if (p.fields.map(f => (f.name, f.dataType)).toSeq ==
            df.schema.fields.map(f => (f.name, f.dataType)).toSeq) prev
        else {
          val prevByName = p.fields.map(f => f.name -> f).toMap
          val dropGoverned = p.fields.filter(f =>
            (f.metadata.contains("delta.generationExpression") ||
              f.metadata.contains("CURRENT_DEFAULT")) &&
              !df.schema.fieldNames.contains(f.name))
          if (dropGoverned.nonEmpty)
            sys.error(s"$dir: schema evolution would drop governed " +
              s"column(s) ${dropGoverned.map(_.name).mkString(", ")} " +
              "(generated/defaulted) — refused")
          StructType(df.schema.fields.map { f =>
            prevByName.get(f.name) match {
              case Some(pf) => f.copy(metadata = pf.metadata,
                nullable = f.nullable || pf.nullable)
              case None => f
            }
          }).json
        }
    }
  }

  /** Install a generated column on a TxLog table: one empty commit
    * whose mirrored schemaString appends the field with its
    * `delta.generationExpression` metadata. Subsequent appends compute
    * (or validate) it — typically followed by `partitionBy` on the
    * generated column for layout pruning.
    */
  def addGeneratedColumn(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String, dataType: org.apache.spark.sql.types.DataType,
      genExpr: String): Long = {
    import org.apache.spark.sql.types._
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val prev = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData — commit data first"))
    val schema = DataType.fromJson(prev).asInstanceOf[StructType]
    require(!schema.fieldNames.contains(name), s"$dir: column '$name' already exists")
    val evolved = StructType(schema.fields :+ StructField(name, dataType,
      nullable = true, new MetadataBuilder()
        .putString("delta.generationExpression", genExpr).build()))
    val v = commitFiles(dir, Seq.empty, carryPrevious = true, evolved.json)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** Add a column with a DEFAULT (the `allowColumnDefaults` writer
    * feature): one metadata commit; `defaultSql` becomes both
    * CURRENT_DEFAULT (injected when a future batch omits the column)
    * and EXISTS_DEFAULT (what pre-evolution rows read — applied
    * NATIVELY by Spark's schema-typed scans, frozen at ALTER time per
    * the spec). Provided values always win; nothing validates.
    */
  def addColumnWithDefault(spark: org.apache.spark.sql.SparkSession,
      dir: String, name: String,
      dataType: org.apache.spark.sql.types.DataType,
      defaultSql: String): Long = {
    import org.apache.spark.sql.types._
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val prev = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData — commit data first"))
    val schema = DataType.fromJson(prev).asInstanceOf[StructType]
    require(!schema.fieldNames.contains(name), s"$dir: column '$name' already exists")
    val evolved = StructType(schema.fields :+ StructField(name, dataType,
      nullable = true, new MetadataBuilder()
        .putString("CURRENT_DEFAULT", defaultSql)
        .putString("EXISTS_DEFAULT", defaultSql).build()))
    val v = commitFiles(dir, Seq.empty, carryPrevious = true, evolved.json)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** Mark an EXISTING column as generated (the bootstrap for
    * generated-partition tables, whose first commit must already be
    * partitioned — partitioning is fixed at the first commit — and so
    * provides the column's values explicitly). Later appends omit it.
    */
  def setGenerationExpression(spark: org.apache.spark.sql.SparkSession,
      dir: String, name: String, genExpr: String): Long = {
    import org.apache.spark.sql.types._
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val prev = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData — commit data first"))
    val schema = DataType.fromJson(prev).asInstanceOf[StructType]
    require(schema.fieldNames.contains(name), s"$dir: no column '$name'")
    val evolved = StructType(schema.fields.map { f =>
      if (f.name != name) f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putString("delta.generationExpression", genExpr).build())
    })
    val v = commitFiles(dir, Seq.empty, carryPrevious = true, evolved.json)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** Install an IDENTITY column (the `identityColumns` writer feature):
    * one metadata commit appending a LongType field carrying
    * `delta.identity.start` / `delta.identity.step` /
    * `delta.identity.allowExplicitInsert` metadata (the same keys stock
    * Delta uses). Subsequent [[commitAppend]]s that OMIT the column get
    * values generated — unique, monotonic in `step`'s direction, dense
    * per batch — and the committed schema's
    * `delta.identity.highWaterMark` advances so values are never
    * reissued. A batch that PROVIDES the column refuses while
    * allowExplicitInsert=false (Delta's GENERATED ALWAYS rule).
    * Pre-evolution rows read the column as null (install-then-backfill
    * is the caller's choice). Uniqueness holds under the
    * single-committer-at-a-time write model; racing writers to the
    * SAME table coordinate via the version claim, but both stage ids
    * before the claim — identity tables should use one writer, the
    * same operational rule stock Delta documents for concurrent
    * identity inserts.
    */
  def addIdentityColumn(spark: SparkSession, dir: String, name: String,
      start: Long = 1L, step: Long = 1L,
      allowExplicitInsert: Boolean = false): Long = {
    import org.apache.spark.sql.types._
    require(step != 0L, s"$dir: identity step must be non-zero")
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val prev = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData — commit data first"))
    val schema = DataType.fromJson(prev).asInstanceOf[StructType]
    require(!schema.fieldNames.contains(name), s"$dir: column '$name' already exists")
    require(!schema.fields.exists(_.metadata.contains("delta.identity.start")),
      s"$dir: at most one identity column per table")
    val evolved = StructType(schema.fields :+ StructField(name, LongType,
      nullable = true, new MetadataBuilder()
        .putLong("delta.identity.start", start)
        .putLong("delta.identity.step", step)
        .putBoolean("delta.identity.allowExplicitInsert", allowExplicitInsert)
        .build()))
    val v = commitFiles(dir, Seq.empty, carryPrevious = true, evolved.json)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** `ALTER TABLE … SYNC IDENTITY`: re-derive the high-water mark from
    * the column's actual furthest value — the repair for histories
    * where explicit inserts (allowExplicitInsert) or a restore left the
    * recorded mark behind the data. One aggregate over the table; the
    * mark only ever advances (spent ids stay spent). Returns the
    * metadata-commit version, or the current version when already in
    * sync. */
  def syncIdentity(spark: SparkSession, dir: String): Long = {
    import org.apache.spark.sql.types._
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val js = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData"))
    val schema = DataType.fromJson(js).asInstanceOf[StructType]
    val idF = schema.fields.find(_.metadata.contains("delta.identity.start"))
      .getOrElse(sys.error(s"$dir: no identity column to sync"))
    val step = idF.metadata.getLong("delta.identity.step")
    val hwm: Option[Long] =
      if (idF.metadata.contains("delta.identity.highWaterMark"))
        Some(idF.metadata.getLong("delta.identity.highWaterMark")) else None
    val agg = if (step > 0) max(col(idF.name)) else min(col(idF.name))
    val row = snapshot(spark, dir).agg(agg.cast("long")).collect().head
    val cur = currentVersion(dir).getOrElse(sys.error(s"no commits in $dir"))
    if (row.isNullAt(0)) return cur
    val furthest = row.getLong(0)
    val newHwm = hwm.fold(furthest)(h =>
      if (step > 0) math.max(h, furthest) else math.min(h, furthest))
    if (hwm.contains(newHwm)) return cur
    val v = commitFiles(dir, Seq.empty, carryPrevious = true,
      withIdentityHwm(js, idF.name, newHwm))
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** Generate identity values for a batch that omits the table's
    * identity column. TWO passes over the incoming batch, ZERO over the
    * table: per-partition counts (a map-only job collecting one long
    * per partition), then a map stamping `base + step * globalIndex`
    * from driver-computed partition offsets — the same shape
    * `zipWithIndex` uses, but it also yields the batch size for the
    * high-water-mark advance. No shuffle, no window, no table scan: at
    * 100 TB the cost is the batch's own size, twice.
    *
    * Returns the completed frame plus the (column, newHighWaterMark)
    * the committed schema must record.
    */
  private def assignIdentity(df: DataFrame, dir: String): (DataFrame, Option[(String, Long)]) = {
    import org.apache.spark.sql.types._
    val js = DeltaLog.currentSchemaString(Paths.get(dir)).getOrElse(return (df, None))
    val schema = DataType.fromJson(js).asInstanceOf[StructType]
    val idF = schema.fields.find(_.metadata.contains("delta.identity.start"))
      .getOrElse(return (df, None))
    val start = idF.metadata.getLong("delta.identity.start")
    val step = idF.metadata.getLong("delta.identity.step")
    val hwm: Option[Long] =
      if (idF.metadata.contains("delta.identity.highWaterMark"))
        Some(idF.metadata.getLong("delta.identity.highWaterMark")) else None
    if (df.columns.contains(idF.name)) {
      val allow = idF.metadata.contains("delta.identity.allowExplicitInsert") &&
        idF.metadata.getBoolean("delta.identity.allowExplicitInsert")
      if (!allow)
        sys.error(s"$dir: identity column '${idF.name}' is GENERATED ALWAYS " +
          "(allowExplicitInsert=false) — omit it from the batch")
      // explicit values still advance the mark past the batch's furthest
      // value, so later generated values cannot collide with them
      val agg = if (step > 0) max(col(idF.name)) else min(col(idF.name))
      val m = df.agg(agg.cast("long")).collect().head
      val newHwm = if (m.isNullAt(0)) hwm else {
        val v = m.getLong(0)
        Some(hwm.fold(v)(h => if (step > 0) math.max(h, v) else math.min(h, v)))
      }
      return (df, newHwm.filterNot(hwm.contains).map(idF.name -> _))
    }
    val base = hwm.map(Math.addExact(_, step)).getOrElse(start)
    val rdd0 = df.rdd
    // pin partition contents across the two passes: a nondeterministic
    // upstream (rand()-salted shuffle, round-robin repartition)
    // recomputed between the count job and the stamping job could shift
    // rows between partitions, mis-sizing offsets and duplicating or
    // skipping ids. localCheckpoint materializes the batch once — the
    // count pass is the persisting job, the stamping pass replays the
    // stored blocks — and also halves the cost of an expensive upstream
    // plan. (Executor loss between the jobs fails loudly and the write
    // retries whole; silently recomputing is exactly what must not
    // happen here.)
    rdd0.localCheckpoint()
    val counts = rdd0.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val n = counts.sum
    if (n == 0L) return (df, None)
    val offsets = counts.scanLeft(0L)(_ + _)
    val outSchema = StructType(df.schema.fields :+
      StructField(idF.name, LongType, nullable = false))
    // overflow near Long.MaxValue must fail loudly (same Math.addExact
    // discipline as the base derivation) — a silent wrap would reissue
    // ids the no-reissue rule spent
    val out = df.sparkSession.createDataFrame(
      rdd0.mapPartitionsWithIndex { case (i, it) =>
        var k = offsets(i)
        it.map { r =>
          val v = Math.addExact(base, Math.multiplyExact(step, k)); k += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v)
        }
      }, outSchema)
    (out, Some(idF.name -> Math.addExact(base, Math.multiplyExact(step, n - 1))))
  }

  /** The committed schemaJson with `delta.identity.highWaterMark`
    * advanced on `name` — everything else verbatim. */
  private def withIdentityHwm(js: String, name: String, hwm: Long): String = {
    import org.apache.spark.sql.types._
    val schema = DataType.fromJson(js).asInstanceOf[StructType]
    StructType(schema.fields.map { f =>
      if (f.name != name) f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putLong("delta.identity.highWaterMark", hwm).build())
    }).json
  }

  /** Append `df` as one atomic commit; returns the new version.
    * `partitionBy` writes the batch hive-style (`col=value` dirs) — the
    * 100 TB ingest layout: snapshot reads prune partitions, and the
    * Delta mirror derives per-file `partitionValues` from the same
    * path segments, so foreign readers prune too. A table's
    * partitioning is fixed at its first commit (like Delta's).
    */
  def commitAppend(df: DataFrame, dir: String,
      partitionBy: Seq[String] = Seq.empty): Long = {
    val table = Paths.get(dir)
    Files.createDirectories(logDir(table))
    DeltaLog.warmMetaCache(df.sparkSession, table)
    val (withIds, newHwm) = assignIdentity(df, dir)
    val full = validateAndComplete(withIds, dir)
    val sj = newHwm.foldLeft(effectiveSchemaJson(full, dir)) {
      case (js, (n, h)) => withIdentityHwm(js, n, h)
    }
    val added = writeBatch(full, table, partitionBy)
    val v = commitFiles(dir, added, carryPrevious = true, sj,
      ridCounts = ridCountsOf(dir, table, added))
    DeltaLog.maybeCheckpoint(df.sparkSession, dir, v)
    v
  }

  /** EXACTLY-ONCE append: commit `df` carrying the idempotence token
    * (`appId`, `txnVersion`) — Delta's SetTransaction contract, the
    * primitive that makes streaming-sink retries safe. A commit whose
    * token version is ≤ the app's last committed token SKIPS (returns
    * None) instead of duplicating: a foreachBatch writer that crashed
    * after committing but before the checkpoint advanced will replay
    * the same (appId, batchId) and land exactly once. The token rides
    * the MANIFEST (the commit point) so data and token are atomic, and
    * mirrors to the Delta log as a `txn` action — foreign engines see
    * the same exactly-once history, and checkpoints preserve it past
    * log compaction. App versions must be committed in increasing
    * order (the streaming-batch-id pattern; same assumption stock
    * Delta makes).
    */
  def commitAppendOnce(df: DataFrame, dir: String, appId: String,
      txnVersion: Long, partitionBy: Seq[String] = Seq.empty): Option[Long] = {
    // the appId is embedded in the space-separated `#txn` header line:
    // whitespace would poison manifestTxn's parse on every later scan,
    // a newline would inject a bogus data-file line into the manifest
    require(appId.nonEmpty && !appId.exists(_.isWhitespace),
      s"commitAppendOnce: appId must be non-empty without whitespace " +
        s"(got ${appId.map(c => if (c.isWhitespace) '␣' else c)})")
    val table = Paths.get(dir)
    Files.createDirectories(logDir(table))
    // cheap pre-check (manifest scan + mirror fallback for aged-out
    // prefixes) BEFORE staging any data; the claim loop re-checks under
    // race
    DeltaLog.warmMetaCache(df.sparkSession, table)
    if (lastTxnVersion(df.sparkSession, dir, appId).exists(_ >= txnVersion))
      return None
    val (withIds0, newHwm0) = assignIdentity(df, dir)
    val full = validateAndComplete(withIds0, dir)
    val sjOnce = newHwm0.foldLeft(effectiveSchemaJson(full, dir)) {
      case (js, (n, h)) => withIdentityHwm(js, n, h)
    }
    val added = writeBatch(full, table, partitionBy)
    val v = commitFiles(dir, added,
      carryPrevious = true, sjOnce,
      txn = Some((appId, txnVersion)),
      ridCounts = ridCountsOf(dir, table, added))
    if (v < 0) {
      // lost the race to a concurrent identical retry: reclaim the
      // staged batch eagerly (vacuum would sweep it as an orphan later)
      added.headOption.map(_.takeWhile(_ != '/')).foreach { batch =>
        val d = table.resolve(batch)
        if (Files.isDirectory(d)) {
          Files.walk(d).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
        }
      }
      return None
    }
    DeltaLog.maybeCheckpoint(df.sparkSession, dir, v)
    Some(v)
  }

  /** Replace the table contents with `df` in one atomic commit —
    * readers see the old version until the manifest lands, then the new
    * one, never a mix.
    */
  def commitOverwrite(df: DataFrame, dir: String,
      partitionBy: Seq[String] = Seq.empty): Long = {
    val table = Paths.get(dir)
    Files.createDirectories(logDir(table))
    DeltaLog.warmMetaCache(df.sparkSession, table)
    enforceAppendOnly(dir, "OVERWRITE")
    // overwrites take the SAME identity and row-tracking write paths as
    // appends: an omitted identity column generates (and a provided one
    // refuses under GENERATED ALWAYS), and on a row-tracked table the
    // replacing files claim fresh id spans — without this the protocol
    // would advertise rowTracking while the adds carried no baseRowId
    // (spec-noncompliant; foreign readers would compute null ids). Both
    // high-water marks carry forward through commitFiles: spent values
    // stay spent across the overwrite.
    val (withIds, newHwm) = assignIdentity(df, dir)
    val full = validateAndComplete(withIds, dir)
    val sj = newHwm.foldLeft(effectiveSchemaJson(full, dir)) {
      case (js, (n, h)) => withIdentityHwm(js, n, h)
    }
    val added = writeBatch(full, table, partitionBy)
    val v = commitFiles(dir, added, carryPrevious = false, sj,
      ridCounts = ridCountsOf(dir, table, added))
    DeltaLog.maybeCheckpoint(df.sparkSession, dir, v)
    v
  }

  // ------------------------------------------------ row-level rewrites

  /** Outcome of a row-level rewrite ([[deleteWhere]] / [[updateWhere]] /
    * [[mergeInto]]): the committed version (unchanged current version
    * when no file needed rewriting), the number of data files rewritten,
    * and the number of live files the mirror's stats PROVED untouched —
    * the copy-on-write I/O bound: O(affected files), never O(table).
    */
  final case class RewriteResult(version: Long, filesRewritten: Long,
      filesSkipped: Long)

  /** Conflict-checked commit for a rewrite that READ version `base`:
    * links at `base + 1`, and a racing committer that took that version
    * first triggers stock Delta's LOGICAL conflict re-check — the
    * racer's commits re-read, and the rewrite re-links past them iff
    * every racer provably COMMUTES with it:
    *
    *  - a racer that removed or re-deleted (DV-changed) any file this
    *    rewrite also rewrites conflicts (delete/delete — the
    *    replacement was derived from stale contents);
    *  - a racer with NO file changes at all is metadata-shaped
    *    (schema/properties) and conflicts — stock's metadata rule,
    *    applied conservatively without parsing the mirror;
    *  - a racer's ADDED files conflict unless this rewrite is
    *    byte-moving (`dataChange = false` — OPTIMIZE reads no
    *    predicate, stock lets appends race it) or the mirror stats
    *    PROVE every added file disjoint from `readPreds` (the same
    *    envelope that picked the rewrite's candidates — an added file
    *    inside it could hold rows the predicate should have seen:
    *    stock's ConcurrentAppendException);
    *  - row-tracked rewrites (materialized/restored id spans, DV
    *    overrides) never retry: their claimed id spans are already
    *    baked into the replacement files and cannot re-base.
    *
    * Anything unprovable keeps the ConcurrentModificationException
    * contract: the caller re-runs against the new snapshot. On a clean
    * re-check the manifest REBUILDS against the racer's version (its
    * adds/removes/DVs carry through), so a partition-local DELETE or
    * OPTIMIZE no longer loses to every unrelated append on a busy
    * table.
    */
  private[graft] def commitRewrite(dir: String, base: Long, removedSet: Set[String],
      added: Seq[String], schemaJson: String,
      dataChange: Boolean = true, operation: String = "WRITE",
      cdcRels: Seq[String] = Seq.empty,
      matAdded: Set[String] = Set.empty,
      restoredRids: Map[String, Rid] = Map.empty,
      restoredMat: Set[String] = Set.empty,
      dvOverride: Option[Map[String, String]] = None,
      readPreds: Seq[(String, Any, Any)] = Seq.empty,
      spark: Option[org.apache.spark.sql.SparkSession] = None): Long = {
    val table = Paths.get(dir)
    // delta.appendOnly blocks any rewrite that CHANGES visible rows
    // (DELETE/UPDATE/MERGE/RESTORE); OPTIMIZE passes — dataChange=false
    // moves bytes, not rows, stock Delta's own rule
    if (dataChange && removedSet.nonEmpty) enforceAppendOnly(dir, operation)
    // a rewrite REPLACES files, and replacement rows would renumber
    // their stable ids — refuse on row-tracked tables UNLESS the caller
    // materialized the ids into the replacement files (OPTIMIZE does);
    // the merge-on-read paths (deleteWhereDv/updateWhereDv) preserve
    // ids and stay available
    if (removedSet.nonEmpty && rowTrackingOn(dir) && matAdded.isEmpty &&
        restoredRids.isEmpty && restoredMat.isEmpty)
      sys.error(s"$dir: $operation rewrites data files on a row-tracked " +
        "table (delta.enableRowTracking=true) — stable row ids would be " +
        "renumbered; use the merge-on-read paths (deleteWhereDv/" +
        "updateWhereDv) instead")
    // row-tracked rewrites never re-base: their id spans are baked in
    val retryable = matAdded.isEmpty && restoredRids.isEmpty &&
      restoredMat.isEmpty && dvOverride.isEmpty
    // memoized across the racer-check loop: version rv's "after" state
    // is rv+1's "before", and a k-racer chain would otherwise read
    // each manifest + DV header set twice
    val manifestMemo = scala.collection.mutable.Map.empty[Long, Set[String]]
    def manifestAt(v: Long): Set[String] =
      manifestMemo.getOrElseUpdate(v, readManifest(table, v).toSet)
    val dvMemo = scala.collection.mutable.Map.empty[Long, Map[String, String]]
    def dvAt(v: Long): Map[String, String] =
      dvMemo.getOrElseUpdate(v, manifestDvs(table, v))
    var effBase = base
    var attempts = 0
    while (true) {
      attempts += 1
      val next = effBase + 1
      val prev = readManifest(table, effBase)
      val all = prev.filterNot(removedSet) ++ added
      val removed = prev.filter(removedSet)
      val tmp = Files.createTempFile(logDir(table), ".commit-", ".tmp")
      // a rewritten file's DV dies with it: the rewrite read the file
      // DV-filtered, so the replacement materialized the deletes. RESTORE
      // overrides wholesale: every file gets the TARGET version's DV (a
      // carried base-version bitmap could hide MORE rows than the target
      // did, and a restored file would otherwise come back with none).
      val keptDvs = dvOverride.getOrElse(
        manifestDvs(table, effBase).filterNot(d => removedSet(d._1)))
      // surviving files keep their rid entries; the high-water mark is
      // carried even when every tracked file is gone (ids never reissue).
      // Materialized replacement files claim FRESH spans (spec: every add
      // gets a baseRowId; readers prefer the materialized column) —
      // "wasted" ids, which the spec explicitly allows. RESTORE re-adds
      // carry their ORIGINAL entries from the restored-to manifest.
      val (newRids, newHwm) =
        if (matAdded.isEmpty) (Map.empty[String, (Long, Long)], None)
        else freshRids(dir, table, added)
      val keptRids = manifestRids(table, effBase).filterNot(r => removedSet(r._1)) ++
        restoredRids ++
        newRids.map { case (rel, (b, n)) => rel -> Rid(b, n, next) }
      val hwm = (manifestRidHwm(table, effBase).toSeq ++ newHwm.toSeq).maxOption
      val keptMat = manifestRidMat(table, effBase).filterNot(removedSet) ++
        restoredMat ++ matAdded
      val header = dvLines(keptDvs) +
        ridLines(keptRids, hwm, keptMat) + cdcLines(cdcRels) +
        s"#op ${enc(operation)} ${if (dataChange) "1" else "0"}\n"
      Files.write(tmp, (header + all.mkString("\n")).getBytes("UTF-8"))
      val linked =
        try {
          Files.createLink(manifestPath(table, next), tmp)
          Files.deleteIfExists(tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
            false
        }
      if (linked) {
        mirrorWithBackfill(dir, table, next, added, removed, schemaJson,
          dataChange, operation, cdcAdds = cdcRels)
        return next
      }
      def refuse(why: String): Nothing =
        sys.error(s"$dir: concurrent commit at version $next — this rewrite " +
          s"read version $base and cannot serialize past the racing writer " +
          s"($why); re-run the operation against the new snapshot")
      if (!retryable)
        refuse("row-tracked/restore rewrites carry pre-claimed id spans " +
          "and never re-base")
      if (attempts > 20) refuse("retry budget exhausted under churn")
      val cur = currentVersion(dir).getOrElse(refuse("no current version"))
      ((effBase + 1) to cur).foreach { rv =>
        racerConflict(dir, manifestAt, dvAt, rv, removedSet, readPreds,
          dataChange, spark).foreach(refuse)
      }
      effBase = cur
    }
    sys.error("unreachable")
  }

  /** Why racing version `rv` does NOT commute with a rewrite of
    * `removedSet` under `readPreds` — None when it provably does (see
    * [[commitRewrite]]'s rules). `manifestAt`/`dvAt` are the caller's
    * memoized readers (consecutive versions share endpoint states). */
  private def racerConflict(dir: String,
      manifestAt: Long => Set[String], dvAt: Long => Map[String, String],
      rv: Long,
      removedSet: Set[String], readPreds: Seq[(String, Any, Any)],
      dataChange: Boolean,
      spark: Option[org.apache.spark.sql.SparkSession]): Option[String] = {
    val before = manifestAt(rv - 1)
    val after = manifestAt(rv)
    val rAdds = after -- before
    val rRemoves = before -- after
    val dvBefore = dvAt(rv - 1)
    val dvAfter = dvAt(rv)
    val dvChanged = (dvBefore.keySet ++ dvAfter.keySet)
      .filter(k => dvBefore.get(k) != dvAfter.get(k))
    if ((rRemoves ++ dvChanged).exists(removedSet))
      Some(s"version $rv removed or re-deleted files this rewrite rewrites")
    else if (rAdds.isEmpty && rRemoves.isEmpty && dvChanged.isEmpty)
      Some(s"version $rv is a metadata-shaped commit (no file changes)")
    else if (rAdds.isEmpty || !dataChange) None
    else if (readPreds.isEmpty)
      Some(s"version $rv added files and this rewrite read the whole table")
    else spark match {
      case None =>
        Some(s"version $rv added files and no session can stats-check them")
      case Some(s) =>
        scala.util.Try(DeltaLog.pruneFlags(s, dir, readPreds)) match {
          case scala.util.Success((flags, _)) =>
            val survive = flags.map(f => f._1.path -> f._2).toMap
            // flag false = stats PROVE the file disjoint from the
            // envelope; anything else (true, or not found — already
            // re-removed/mirror lag) conflicts, fail-closed
            if (rAdds.forall(a => survive.get(a).contains(false))) None
            else Some(s"version $rv added files inside this rewrite's " +
              "read predicate")
          case scala.util.Failure(_) =>
            Some(s"version $rv added files and the mirror stats are " +
              "unavailable to prove them disjoint")
        }
    }
  }

  /** Copy-on-write core shared by DELETE/UPDATE/MERGE: pick the
    * candidate files (live files the Delta mirror's per-file stats
    * CANNOT prove unaffected by the `prune` ranges), read only those,
    * apply `replace`, and commit (previous − candidates) + replacement
    * in one serializable version. Soundness under mirror lag: only
    * files the replay explicitly proves no-match are skipped — a
    * manifest file the mirror does not know yet stays a candidate, and
    * a missing/unreadable mirror disables pruning entirely (correct,
    * just un-pruned).
    *
    * ROW-TRACKED tables rewrite with their ids MATERIALIZED (the same
    * move OPTIMIZE makes): the candidate scan attaches each row's
    * stable id, `replace` carries the hidden column through (filters
    * and column-wise updates preserve extra columns; a closure that
    * unions in NEW rows leaves it null — fresh rows read fresh ids
    * from the replacement file's claimed span via the coalesce rule),
    * and the replacement files land it under the config-named
    * materialized column. Survivor identity is preserved value-exactly
    * through the rewrite.
    */
  private def rewriteWhere(spark: SparkSession, dir: String,
      prune: Seq[(String, Any, Any)],
      replace: DataFrame => DataFrame,
      changeRows: Option[DataFrame => DataFrame] = None,
      keepOnly: Option[Set[String]] = None): RewriteResult = {
    val table = Paths.get(dir)
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    val prev = readManifest(table, base)
    val skipped: Set[String] =
      if (prune.isEmpty) Set.empty
      else scala.util.Try(DeltaLog.pruneFlags(spark, dir, prune)) match {
        case scala.util.Success((flags, _)) =>
          flags.collect { case (f, false) => f.path }.toSet
        case scala.util.Failure(_) => Set.empty
      }
    // `keepOnly`: a caller-supplied TOUCHED-FILE set (positive
    // discovery, e.g. the by-source merge's join pass) — candidates
    // narrow to it; the caller owns the proof that excluded files hold
    // no row its closure would change
    val candidates = keepOnly.fold(prev.filterNot(skipped))(k =>
      prev.filterNot(skipped).filter(k))
    if (candidates.isEmpty)
      return RewriteResult(base, 0L, prev.size.toLong)
    val partCols = pathPartCols(candidates.head)
    DeltaLog.warmMetaCache(spark, table)
    val tracked = rowTrackingOn(dir)
    val matCol = matRowIdCol(dir).filter(_ => tracked)
    if (tracked && matCol.isEmpty)
      sys.error(s"$dir: row tracking on but no materialized row-id " +
        "column name configured")
    val src = matCol match {
      case Some(c) => relsWithRowIds(spark, dir, base, candidates)
        .withColumnRenamed("_row_id", c)
      case None => readRels(spark, table, candidates,
        dvs = manifestDvs(table, base))
    }
    val replaced = replace(src)
    // change-data records for CDF-enabled copy-on-write DML: the
    // DELETE/UPDATE wrappers know their per-row changes (pred + set);
    // closure-generic rewrites (MERGE, RESTORE) pass None and their
    // versions refuse a later tableChanges read rather than guess.
    // Change rows are TABLE rows — the hidden id column stays out.
    val cdcRels =
      if (changeRows.isEmpty || !cdfEnabled(table)) Seq.empty
      else writeCdcFiles(
        changeRows.get(matCol.foldLeft(src)(_.drop(_))), table)
    // rewritten rows are WRITES: generated columns RECOMPUTE from their
    // expressions (an update touching the base column must move the
    // derived one with it — and can never smuggle a divergent value),
    // and CHECK constraints apply exactly as for an append; the
    // mirrored schema keeps its field metadata via effectiveSchemaJson
    val replacement = validateAndComplete(
      generatedColumnNames(dir).foldLeft(replaced)(_.drop(_)), dir)
    val added = writeBatch(replacement, table, partCols)
    // the committed schema stays the TABLE schema — the materialized id
    // column is file-level, never a table column
    val v = commitRewrite(dir, base, candidates.toSet, added,
      effectiveSchemaJson(matCol.foldLeft(replacement)(_.drop(_)), dir),
      cdcRels = cdcRels, matAdded = if (tracked) added.toSet else Set.empty,
      readPreds = prune, spark = Some(spark))
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, candidates.size.toLong, skipped.size.toLong)
  }

  /** Row-level DELETE (copy-on-write): removes rows where `pred` is
    * TRUE (null-predicate rows survive, the SQL DELETE rule) in one
    * serializable commit. `prune` is an optional conjunctive set of
    * inclusive range bounds `(column, lo, hi)` (null bound = unbounded)
    * that must OVER-APPROXIMATE `pred` — every matching row falls inside
    * the ranges. The mirror's per-file stats then prove untouched files
    * skip the rewrite entirely: O(affected files) I/O, the reason a
    * 100 TB DELETE doesn't rewrite the table. Like Delta, the hint is
    * trusted: an unsound hint deletes only the matching rows inside it.
    */
  def deleteWhere(spark: SparkSession, dir: String, pred: Column,
      prune: Seq[(String, Any, Any)] = Seq.empty): RewriteResult =
    rewriteWhere(spark, dir, prune, _.filter(coalesce(!pred, lit(true))),
      changeRows = Some(_.filter(pred)
        .withColumn("_change_type", lit("delete"))))

  /** Row-level DELETE, MERGE-ON-READ (Delta deletion vectors): the
    * matched rows' ordinal indexes are roaring-serialized into DV
    * files and the commit records `#dv` descriptors — NO data file is
    * rewritten. At 100 TB this is the difference between an O(deleted
    * rows) bitmap commit and rewriting a 1 GB file to drop 10 rows;
    * merge-on-read is how every production lakehouse writes deletes.
    *
    * Shape: the matched (file, ordinal) pairs are computed
    * distributed, hash-partitioned BY FILE, and each non-empty
    * partition writes ONE DV file packing its files' bitmaps (the
    * spec's multi-DV file layout) — executors write O(their deleted
    * rows) bitmap bytes to table storage; only the DESCRIPTORS travel
    * to the driver. A file that already carries a DV gets the UNION
    * bitmap (the spec: a new DV replaces the old and must contain
    * every hidden row). `prune` as in [[deleteWhere]].
    *
    * Gated on `delta.enableDeletionVectors=true` (stock Delta's own
    * writer gate); the mirror commit upgrades the protocol to
    * reader 3 / writer 7 with the `deletionVectors` feature so
    * foreign readers that cannot hide the rows refuse the table
    * instead of resurrecting them.
    *
    * Semantics as [[deleteWhere]]: null-predicate rows survive,
    * dataChange=true, `delta.appendOnly` refuses. The added-files CDF
    * cannot express a DV delete — [[changesBetween]] refuses across
    * one. A later OPTIMIZE materializes the deletes (rewrites read
    * DV-filtered) and drops the DV with the rewritten file.
    */
  def deleteWhereDv(spark: SparkSession, dir: String, pred: Column,
      prune: Seq[(String, Any, Any)] = Seq.empty): RewriteResult = {
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    if (!DeltaLog.tableConfig(table).get("delta.enableDeletionVectors")
        .contains("true"))
      sys.error(s"$dir: merge-on-read DELETE requires the deletionVectors " +
        "feature — setTableProperties(delta.enableDeletionVectors=true) " +
        "first (stock Delta's writer gate)")
    enforceAppendOnly(dir, "DELETE")
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    val prev = readManifest(table, base)
    val skipped: Set[String] =
      if (prune.isEmpty) Set.empty
      else scala.util.Try(DeltaLog.pruneFlags(spark, dir, prune)) match {
        case scala.util.Success((flags, _)) =>
          flags.collect { case (f, false) => f.path }.toSet
        case scala.util.Failure(_) => Set.empty
      }
    val candidates = prev.filterNot(skipped)
    if (candidates.isEmpty)
      return RewriteResult(base, 0L, prev.size.toLong)
    val oldDvs = manifestDvs(table, base)
    // CDF needs the EXACT visible set for the delete's change records,
    // so the marking scan applies old DVs when the property is on (the
    // cheaper raw scan is correct for bitmaps alone — the union absorbs
    // re-matches — but would record already-dead rows as deleted again)
    val cdf = cdfEnabled(table)
    val updates = dvDescriptorUpdates(spark, table, dir, candidates, pred,
      oldDvs, applyOldDvs = cdf)
    if (updates.isEmpty)
      return RewriteResult(base, 0L, skipped.size.toLong)
    val cdcRels =
      if (!cdf) Seq.empty
      else writeCdcFiles(readRels(spark, table, candidates, dvs = oldDvs)
        .filter(pred).withColumn("_change_type", lit("delete")), table)
    val schemaJson = DeltaLog.currentSchemaString(table).getOrElse(
      sys.error(s"$dir: no mirrored metaData for a DV commit"))
    val v = commitDv(dir, base, updates, oldDvs, schemaJson,
      cdcRels = cdcRels)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, updates.size.toLong, skipped.size.toLong)
  }

  /** The DV-marking core shared by merge-on-read DELETE and UPDATE. */
  private def dvDescriptorUpdates(spark: SparkSession, table: Path,
      dir: String, candidates: Seq[String], pred: Column,
      oldDvs: Map[String, String],
      applyOldDvs: Boolean): Map[String, String] =
    dvDescriptorUpdatesBy(spark, table, dir, candidates, _.filter(pred),
      oldDvs, applyOldDvs)

  /** The general DV-marking core (merge-on-read DELETE/UPDATE/MERGE):
    * scan `candidates`, select the matched rows with `mark` (a filter
    * for DELETE/UPDATE; a semi-join against the source keys for MERGE
    * — which a Column predicate cannot express), roaring-serialize the
    * matched ordinals per file (executor-side, one DV file per
    * non-empty partition), union with any superseded bitmap, and
    * return the per-file descriptor-JSON updates. Provenance columns
    * `__f`/`__p` are captured from `_metadata` BEFORE `mark` runs —
    * metadata columns do not survive a join — and `mark` must preserve
    * them (filters and semi-joins do). With `applyOldDvs` the scan
    * first hides rows existing DVs already delete — required by
    * UPDATE/MERGE, whose re-written rows must be exactly the VISIBLE
    * matches (a raw re-match would resurrect deleted rows as
    * "updates"); DELETE keeps the cheaper raw scan, whose re-matches
    * the bitmap union absorbs. */
  private def dvDescriptorUpdatesBy(spark: SparkSession, table: Path,
      dir: String, candidates: Seq[String], mark: DataFrame => DataFrame,
      oldDvs: Map[String, String],
      applyOldDvs: Boolean): Map[String, String] = {
    val relByAbs = candidates
      .map(rel => table.resolve(rel).toAbsolutePath.toString -> rel).toMap
    val tableStr = table.toAbsolutePath.toString
    // matched (file, ordinal) pairs — `_metadata` is selected PER SCAN
    // (a union does not carry it)
    val branches: Seq[DataFrame] =
      if (!candidates.exists(_.split("/").exists(_.contains("="))))
        Seq(spark.read.parquet(
          candidates.map(r => table.resolve(r).toString): _*))
      else candidates.groupBy(_.split("/").head).toSeq.sortBy(_._1)
        .map { case (batch, fs) =>
          spark.read.option("basePath", table.resolve(batch).toString)
            .parquet(fs.map(r => table.resolve(r).toString): _*)
        }
    val keep =
      if (!applyOldDvs || oldDvs.isEmpty) None
      else Some(DeletionVectors.keepUdf(spark, table, oldDvs))
    val hits = branches.map { b =>
      val withProv = b
        .withColumn("__f", col("_metadata.file_path"))
        .withColumn("__p", col("_metadata.row_index"))
      val visible = keep.fold(withProv)(k =>
        withProv.filter(k(col("__f"), col("__p"))))
      mark(visible).select(col("__f"), col("__p"))
    }.reduce(_.unionByName(_))
    import spark.implicits._
    val descRows: Seq[(String, String, Int, Int, Long)] = hits
      .repartition(col("__f")).sortWithinPartitions(col("__f"), col("__p"))
      .as[(String, Long)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val perFile = scala.collection.mutable.LinkedHashMap
            .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
          it.foreach { case (f, p) =>
            perFile.getOrElseUpdate(f,
              scala.collection.mutable.ArrayBuffer.empty[Long]) += p
          }
          val files = perFile.keys.toSeq
          val bitmaps = files.map(f => DeletionVectors.serialize(perFile(f).toSeq))
          val uuid = java.util.UUID.randomUUID()
          val ub = java.nio.ByteBuffer.allocate(16)
          ub.putLong(uuid.getMostSignificantBits)
          ub.putLong(uuid.getLeastSignificantBits)
          val encU = DeletionVectors.z85Encode(ub.array())
          val offsets = DeletionVectors.writeDvFile(
            Paths.get(tableStr).resolve(s"deletion_vector_$uuid.bin"), bitmaps)
          files.iterator.zip(bitmaps.iterator).zip(offsets.iterator).map {
            case ((f, bytes), off) =>
              (f, encU, off, bytes.length, perFile(f).size.toLong)
          }
        }
      }.collect().toSeq
    if (descRows.isEmpty) return Map.empty
    def descJson(d: DeletionVectors.Descriptor): String =
      s"""{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}",""" +
        s""""offset":${d.offset.getOrElse(0)},"sizeInBytes":${d.sizeInBytes},""" +
        s""""cardinality":${d.cardinality}}"""
    val updates: Map[String, String] = descRows.map {
      case (abs, encU, off, size, card) =>
        val path = new java.net.URI(abs).getPath
        val rel = relByAbs.getOrElse(path,
          sys.error(s"$dir: scanned file $path missing from the manifest"))
        val fresh = DeletionVectors.Descriptor("u", encU, Some(off), size, card)
        val desc = oldDvs.get(rel) match {
          case None => fresh
          case Some(oldJson) =>
            // union with the superseded bitmap: config-scale driver
            // work proportional to THIS file's hidden rows
            val merged = (DeletionVectors.parse(DeletionVectors.readBytes(
                table, DeletionVectors.parseDescriptor(oldJson))).values ++
              DeletionVectors.parse(DeletionVectors.readBytes(table, fresh))
                .values).toSeq.distinct
            val bytes = DeletionVectors.serialize(merged)
            val uuid = java.util.UUID.randomUUID()
            val ub = java.nio.ByteBuffer.allocate(16)
            ub.putLong(uuid.getMostSignificantBits)
            ub.putLong(uuid.getLeastSignificantBits)
            val mOff = DeletionVectors.writeDvFile(
              table.resolve(s"deletion_vector_$uuid.bin"), Seq(bytes)).head
            DeletionVectors.Descriptor("u",
              DeletionVectors.z85Encode(ub.array()), Some(mOff),
              bytes.length, merged.size.toLong)
        }
        rel -> descJson(desc)
    }.toMap
    updates
  }

  /** Conflict-checked commit of a DV delete/update: previous data-file
    * lines unchanged (plus `added` lines for an UPDATE's re-written
    * rows), `#dv` headers replaced by the merged map — same
    * serialization rule as [[commitRewrite]] (the DV set was computed
    * against `base`).
    */
  private def commitDv(dir: String, base: Long, updates: Map[String, String],
      oldDvs: Map[String, String], schemaJson: String,
      added: Seq[String] = Seq.empty, operation: String = "DELETE",
      cdcRels: Seq[String] = Seq.empty): Long = {
    val table = Paths.get(dir)
    val next = base + 1
    val prev = readManifest(table, base)
    // a DV commit moves no file: every rid carries forward; UPDATE's
    // appended postimage files claim fresh id spans
    val (newRids, newHwm) = freshRids(dir, table, added)
    val keptRids = manifestRids(table, base) ++ newRids.map {
      case (rel, (b, n)) => rel -> Rid(b, n, next)
    }
    val hwm = (manifestRidHwm(table, base).toSeq ++ newHwm.toSeq).maxOption
    val tmp = Files.createTempFile(logDir(table), ".commit-", ".tmp")
    val header = dvLines(oldDvs ++ updates) +
      ridLines(keptRids, hwm, manifestRidMat(table, base)) +
      cdcLines(cdcRels) + s"#op $operation 1\n"
    Files.write(tmp, (header + (prev ++ added).mkString("\n")).getBytes("UTF-8"))
    try {
      Files.createLink(manifestPath(table, next), tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        sys.error(s"$dir: concurrent commit at version $next — this $operation " +
          s"read version $base and cannot serialize past a racing writer; " +
          "re-run against the new snapshot")
    }
    try DeltaLog.mirrorCommit(table, next, added, Seq.empty, schemaJson,
      dataChange = true, operation = operation,
      dvUpdates = updates.map { case (rel, d) => rel -> ((d, oldDvs.get(rel))) },
      cdcAdds = cdcRels,
      rowIds = mirrorRids(table, next, added.toSet ++ updates.keySet),
      domains = ridDomain(table, next))
    catch { case _: java.io.IOException => () }
    next
  }

  /** Row-level UPDATE (copy-on-write): for rows where `pred` is TRUE,
    * replaces each column in `set` with its expression (evaluated
    * against the OLD row, standard UPDATE semantics — assignments never
    * see each other) cast back to the column's declared type, so the
    * table schema cannot drift. Same pruning contract as
    * [[deleteWhere]].
    */
  def updateWhere(spark: SparkSession, dir: String, pred: Column,
      set: Map[String, Column],
      prune: Seq[(String, Any, Any)] = Seq.empty): RewriteResult =
    rewriteWhere(spark, dir, prune, { df =>
      val bad = set.keySet -- df.columns.toSet
      require(bad.isEmpty,
        s"updateWhere: unknown column(s) ${bad.mkString(", ")}")
      df.select(df.schema.fields.toSeq.map { f =>
        set.get(f.name)
          .map(e => when(coalesce(pred, lit(false)), e.cast(f.dataType))
            .otherwise(col(f.name)).as(f.name))
          .getOrElse(col(f.name))
      }: _*)
    }, changeRows = Some { df =>
      val hit = df.filter(coalesce(pred, lit(false)))
      hit.withColumn("_change_type", lit("update_preimage"))
        .unionByName(hit.select(hit.schema.fields.toSeq.map { f =>
          set.get(f.name).map(_.cast(f.dataType).as(f.name))
            .getOrElse(col(f.name))
        }: _*).withColumn("_change_type", lit("update_postimage")))
    })

  /** Row-level UPDATE, MERGE-ON-READ (deletion vectors): the matched
    * rows' OLD versions are hidden by DV bitmaps on their files and
    * their NEW versions land in one appended batch — no data file is
    * rewritten, the same O(changed rows) commit [[deleteWhereDv]]
    * makes for deletes (stock Delta's UPDATE under
    * `delta.enableDeletionVectors`; at 100 TB, updating 10 rows of a
    * 1 GB file must not rewrite the GB). One serializable commit
    * carries both: `#dv` descriptors + the added file lines, mirrored
    * as the spec's remove(old DV)/add(same path, new DV) pairs plus
    * the add of the re-written rows, `#op UPDATE`.
    *
    * Exactness: the DV-marking scan applies EXISTING DVs first — the
    * re-written rows must be exactly the VISIBLE matches, or a
    * previously-deleted row would resurrect as an "update" (the
    * raw-scan shortcut the DELETE path can afford, this path cannot).
    * Assignment semantics as [[updateWhere]]: expressions evaluate
    * against the OLD row, cast back to the declared type; generated
    * columns recompute; CHECK constraints apply to the new rows.
    * Updates may move rows across partitions (the DV hides the old
    * location, the append lands the new). Same gates as
    * [[deleteWhereDv]]: `delta.enableDeletionVectors` required,
    * `delta.appendOnly` refuses, CDF refuses across the commit.
    */
  def updateWhereDv(spark: SparkSession, dir: String, pred: Column,
      set: Map[String, Column],
      prune: Seq[(String, Any, Any)] = Seq.empty): RewriteResult = {
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    if (!DeltaLog.tableConfig(table).get("delta.enableDeletionVectors")
        .contains("true"))
      sys.error(s"$dir: merge-on-read UPDATE requires the deletionVectors " +
        "feature — setTableProperties(delta.enableDeletionVectors=true) " +
        "first (stock Delta's writer gate)")
    enforceAppendOnly(dir, "UPDATE")
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    val prev = readManifest(table, base)
    val skipped: Set[String] =
      if (prune.isEmpty) Set.empty
      else scala.util.Try(DeltaLog.pruneFlags(spark, dir, prune)) match {
        case scala.util.Success((flags, _)) =>
          flags.collect { case (f, false) => f.path }.toSet
        case scala.util.Failure(_) => Set.empty
      }
    val candidates = prev.filterNot(skipped)
    if (candidates.isEmpty)
      return RewriteResult(base, 0L, prev.size.toLong)
    val oldDvs = manifestDvs(table, base)
    val updates = dvDescriptorUpdates(spark, table, dir, candidates, pred,
      oldDvs, applyOldDvs = true)
    if (updates.isEmpty)
      return RewriteResult(base, 0L, skipped.size.toLong)
    // the new row versions: visible matches only (same DV-filtered
    // view the marking scan used — parquet is immutable, so the two
    // scans see identical matches), assignments applied old-row-wise
    val visible = readRels(spark, table, candidates, dvs = oldDvs)
      .filter(pred)
    val bad = set.keySet -- visible.columns.toSet
    require(bad.isEmpty,
      s"updateWhereDv: unknown column(s) ${bad.mkString(", ")}")
    val updated = visible.select(visible.schema.fields.toSeq.map { f =>
      set.get(f.name).map(_.cast(f.dataType).as(f.name))
        .getOrElse(col(f.name))
    }: _*)
    val replacement = validateAndComplete(
      generatedColumnNames(dir).foldLeft(updated)(_.drop(_)), dir)
    val added = writeBatch(replacement, table, pathPartCols(candidates.head))
    // change-data records: the old rows as preimage, the committed new
    // rows (generated columns recomputed) as postimage
    val cdcRels =
      if (!cdfEnabled(table)) Seq.empty
      else writeCdcFiles(
        visible.withColumn("_change_type", lit("update_preimage"))
          .unionByName(readRels(spark, table, added)
            .withColumn("_change_type", lit("update_postimage")),
            allowMissingColumns = true), table)
    val v = commitDv(dir, base, updates, oldDvs,
      effectiveSchemaJson(replacement, dir), added = added,
      operation = "UPDATE", cdcRels = cdcRels)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, updates.size.toLong, skipped.size.toLong)
  }

  /** Transactional MERGE (whole-row upsert): source rows REPLACE target
    * rows sharing `keys`; unmatched source rows are INSERTED — one
    * serializable commit. Candidate files come from the mirror's stats
    * against the source's own key envelope (min..max per key column,
    * one config-scale agg): a file whose key range cannot intersect the
    * source's is never read or rewritten, and a source that matches no
    * live file degenerates to a pure append. The rewrite itself is
    * target-⋈-source anti-join (drop the matched) + union (bring every
    * source row) — AQE broadcasts the typical small CDC batch.
    * Precondition (as in Delta MERGE): at most one source row per key.
    */
  def mergeInto(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String]): RewriteResult = {
    require(keys.nonEmpty, "mergeInto: at least one key column")
    if (source.isEmpty)
      return RewriteResult(currentVersion(dir).getOrElse(
        sys.error(s"no committed version in $dir")), 0L, 0L)
    requireUniqueSourceKeys(source, keys, "mergeInto")
    val bounds = source.select(keys.flatMap(k =>
      Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k"))): _*)
      .collect().head
    val prune = keys.zipWithIndex.map { case (k, i) =>
      (k, bounds.get(2 * i), bounds.get(2 * i + 1)) }
    val res = rewriteWhere(spark, dir, prune, { tgt =>
      // on a row-tracked table the target carries the hidden
      // materialized-id column — source rows are NEW rows and union in
      // with it null, so they read fresh ids from the replacement
      // file's claimed span
      val extra = tgt.columns.toSet -- source.columns.toSet
      val src2 = extra.foldLeft(source)((d, c) =>
        d.withColumn(c, lit(null).cast(tgt.schema(c).dataType)))
      tgt.join(source.select(keys.map(col): _*).dropDuplicates(keys),
          keys, "left_anti")
        .unionByName(src2)
    })
    if (res.filesRewritten == 0L) {
      // no live file can hold any source key: every source row inserts
      val table = Paths.get(dir)
      val partCols = readManifest(table, res.version).headOption
        .map(pathPartCols).getOrElse(Seq.empty)
      RewriteResult(commitAppend(source, dir, partCols), 0L, res.filesSkipped)
    } else res
  }

  /** Transactional MERGE, MERGE-ON-READ (deletion vectors): the same
    * whole-row upsert as [[mergeInto]] — source rows REPLACE visible
    * target rows sharing `keys`, unmatched source rows INSERT — but the
    * matched target rows are HIDDEN by DV bitmaps on their files and
    * the entire source lands as one appended batch: NO data file is
    * rewritten. At 100 TB this is the production upsert shape — a CDC
    * batch touching 1000 rows across 1000 files must not rewrite a TB;
    * the commit is O(changed rows), the reason the DV machinery exists.
    *
    * Shape: candidates come from the mirror's stats against the
    * source's key envelope (as [[mergeInto]]); the matched VISIBLE
    * (file, ordinal) pairs come from one semi-join of the candidate
    * scan against the distinct source keys ([[dvDescriptorUpdatesBy]] —
    * existing DVs applied first, so a previously deleted row can never
    * resurrect as an "update"); the appended batch is the source
    * itself, validated and generated-column-completed like any write.
    * One serializable commit carries the `#dv` descriptors + the added
    * file lines, `#op MERGE`, mirrored as remove/add DV pairs plus the
    * batch's adds. On a row-tracked table the untouched and DV-hidden
    * survivors keep their stable ids by construction (no file moves)
    * and the appended batch claims fresh spans — copy-on-write MERGE
    * would renumber every row of every touched file.
    *
    * Under `delta.enableChangeDataFeed` the commit writes PROTOCOL.md
    * change-data files typed per row — `update_preimage` (the hidden
    * matched rows), `update_postimage` (source rows whose key matched),
    * `insert` (the rest) — which [[changeFeed]] and the Delta mirror's
    * `tableChanges` read back; without CDF a later `changeFeed` across
    * the merge refuses loudly (the DV diff alone cannot attribute the
    * appended batch between postimages and inserts).
    *
    * Gates as [[deleteWhereDv]]/[[updateWhereDv]]:
    * `delta.enableDeletionVectors` required, `delta.appendOnly`
    * refuses. Precondition (as in Delta MERGE): at most one source row
    * per key. A source matching no visible row degenerates to a pure
    * append.
    */
  def mergeIntoDv(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String]): RewriteResult = {
    require(keys.nonEmpty, "mergeIntoDv: at least one key column")
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    if (!DeltaLog.tableConfig(table).get("delta.enableDeletionVectors")
        .contains("true"))
      sys.error(s"$dir: merge-on-read MERGE requires the deletionVectors " +
        "feature — setTableProperties(delta.enableDeletionVectors=true) " +
        "first (stock Delta's writer gate)")
    enforceAppendOnly(dir, "MERGE")
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    if (source.isEmpty) return RewriteResult(base, 0L, 0L)
    requireUniqueSourceKeys(source, keys, "mergeIntoDv")
    val bounds = source.select(keys.flatMap(k =>
      Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k"))): _*)
      .collect().head
    val prune = keys.zipWithIndex.map { case (k, i) =>
      (k, bounds.get(2 * i), bounds.get(2 * i + 1)) }
    val prev = readManifest(table, base)
    val skipped: Set[String] =
      scala.util.Try(DeltaLog.pruneFlags(spark, dir, prune)) match {
        case scala.util.Success((flags, _)) =>
          flags.collect { case (f, false) => f.path }.toSet
        case scala.util.Failure(_) => Set.empty
      }
    val candidates = prev.filterNot(skipped)
    val partCols = prev.headOption.map(pathPartCols).getOrElse(Seq.empty)
    // the typical CDC batch is small — AQE broadcasts the semi-join's
    // key side; a genuinely large source falls back to a shuffled
    // semi-join, still O(changed rows + candidate files)
    val srcKeys = source.select(keys.map(col): _*).dropDuplicates(keys)
    val oldDvs = manifestDvs(table, base)
    val updates =
      if (candidates.isEmpty) Map.empty[String, String]
      else dvDescriptorUpdatesBy(spark, table, dir, candidates,
        _.join(srcKeys, keys, "left_semi"), oldDvs, applyOldDvs = true)
    if (updates.isEmpty)
      // no visible target row shares a source key: pure insert
      return RewriteResult(commitAppend(source, dir, partCols), 0L,
        skipped.size.toLong)
    val replacement = validateAndComplete(
      generatedColumnNames(dir).foldLeft(source)(_.drop(_)), dir)
    val added = writeBatch(replacement, table, partCols)
    val cdcRels =
      if (!cdfEnabled(table)) Seq.empty
      else {
        val visMatched = readRels(spark, table, candidates, dvs = oldDvs)
          .join(srcKeys, keys, "left_semi")
        val matchedKeys = visMatched.select(keys.map(col): _*)
          .dropDuplicates(keys)
        val appended = readRels(spark, table, added)
        writeCdcFiles(
          visMatched.withColumn("_change_type", lit("update_preimage"))
            .unionByName(appended.join(matchedKeys, keys, "left_semi")
              .withColumn("_change_type", lit("update_postimage")),
              allowMissingColumns = true)
            .unionByName(appended.join(matchedKeys, keys, "left_anti")
              .withColumn("_change_type", lit("insert")),
              allowMissingColumns = true), table)
      }
    val v = commitDv(dir, base, updates, oldDvs,
      effectiveSchemaJson(replacement, dir), added = added,
      operation = "MERGE", cdcRels = cdcRels)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, updates.size.toLong, skipped.size.toLong)
  }

  // ------------------------------------------------ conditional MERGE

  /** One `WHEN` clause of a conditional MERGE — stock Delta's clause
    * model (delta.io MERGE INTO: `WHEN MATCHED [AND cond] THEN UPDATE
    * SET … | DELETE`, `WHEN NOT MATCHED [AND cond] THEN INSERT`).
    * Conditions and `SET` expressions reference the two sides through
    * the aliases `t` (target) and `s` (source), e.g.
    * `col("t.value") < col("s.value")`; `WHEN NOT MATCHED` conditions
    * may reference only `s` (the target side does not exist there).
    * Clauses are ordered FIRST-MATCH-WINS within each family; a
    * matched row no matched clause accepts is left unchanged, an
    * unmatched source row no insert clause accepts is dropped.
    * Conditions must be DETERMINISTIC — the merge evaluates them more
    * than once (the mark scan and the rewrite scan see the same
    * immutable files, so determinism makes the passes agree), the same
    * requirement stock Delta places on merge conditions. */
  sealed trait MergeClause { def condition: Option[Column] }
  /** `WHEN MATCHED [AND condition] THEN UPDATE SET col = expr, …` —
    * columns not in `set` keep their target values (partial update). */
  final case class MatchedUpdate(set: Map[String, Column],
      condition: Option[Column] = None) extends MergeClause
  /** `WHEN MATCHED [AND condition] THEN DELETE`. */
  final case class MatchedDelete(condition: Option[Column] = None)
      extends MergeClause
  /** `WHEN NOT MATCHED [AND condition] THEN INSERT` — the whole source
    * row, as [[mergeInto]]'s insert half. */
  final case class NotMatchedInsert(condition: Option[Column] = None)
      extends MergeClause
  /** `WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE SET …` —
    * target rows whose key matches NO source row (the full-sync / SCD
    * shape: flag or age out rows the feed stopped carrying). Conditions
    * and SET expressions may reference only `t.` columns — there IS no
    * source row. */
  final case class NotMatchedBySourceUpdate(set: Map[String, Column],
      condition: Option[Column] = None) extends MergeClause
  /** `WHEN NOT MATCHED BY SOURCE [AND condition] THEN DELETE` — drop
    * target rows absent from the source (the mirror-a-snapshot shape). */
  final case class NotMatchedBySourceDelete(condition: Option[Column] = None)
      extends MergeClause

  /** Stock Delta MERGE's multiple-match rule, enforced loudly: two
    * source rows sharing a key would both land in the appended batch
    * (or replace one target row twice) — fail instead of silently
    * double-writing. One aggregation over the source — cheap next to
    * the joins the merge already runs (the source is a CDC batch).
    * NULL-keyed rows are exempt: under the merge's `===` condition a
    * null key can never match ANY target row (so it can never
    * multiple-match — stock Delta accepts them too; they simply route
    * through the not-matched family). Strictly, stock Delta also
    * accepts duplicate NON-null keys that happen to match no target
    * row; this engine refuses those up-front — a double-keyed CDC
    * batch is a pipeline bug worth failing loudly on, and the eager
    * check is what keeps the merge itself a single pass. */
  private def requireUniqueSourceKeys(source: DataFrame, keys: Seq[String],
      what: String): Unit = {
    val dup = source
      .filter(keys.map(k => col(k).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .limit(1).collect()
    if (dup.nonEmpty)
      sys.error(s"$what: multiple source rows share the merge key (" +
        keys.zip(dup.head.toSeq).map { case (k, v) => s"$k=$v" }
          .mkString(", ") + ") — stock Delta MERGE fails on multiple " +
        "matches; aggregate or dedupe the source first")
  }

  /** Null-fill TARGET-only columns on a source-shaped insert frame —
    * stock MERGE's INSERT contract (columns the source does not carry
    * become null, typed by the table). Source-only columns pass
    * through untouched (they widen the table exactly as a plain
    * append would). */
  private def fillToTarget(df: DataFrame,
      target: org.apache.spark.sql.types.StructType): DataFrame =
    target.fields.filterNot(f => df.columns.contains(f.name))
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))

  /** [[fillToTarget]] against the table's CURRENT mirrored schema — for
    * the degenerate insert-only appends, where a narrow source batch
    * must not REGRESS the mirrored schemaString (metaData re-emission
    * follows the committed batch's shape). */
  private def fillToTableSchema(dir: String, df: DataFrame): DataFrame =
    DeltaLog.currentSchemaString(Paths.get(dir))
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .map(fillToTarget(df, _)).getOrElse(df)

  /** Split + validate a clause list into its three families — matched
    * (UPDATE/DELETE), not-matched (INSERT), not-matched-BY-SOURCE
    * (UPDATE/DELETE) — each keeping its declaration order. Stock
    * Delta's reachability rule applies per family — every clause of a
    * family except its last must carry a condition (an unconditional
    * clause makes the ones after it dead code). */
  private def splitClauses(clauses: Seq[MergeClause], what: String)
      : (Seq[MergeClause], Seq[NotMatchedInsert], Seq[MergeClause]) = {
    require(clauses.nonEmpty, s"$what: at least one WHEN clause")
    val matched = clauses.filter {
      case _: MatchedUpdate | _: MatchedDelete => true; case _ => false }
    val inserts = clauses.collect { case c: NotMatchedInsert => c }
    val bySource = clauses.filter {
      case _: NotMatchedBySourceUpdate | _: NotMatchedBySourceDelete => true
      case _ => false }
    (matched.dropRight(1) ++ inserts.dropRight(1) ++ bySource.dropRight(1))
      .foreach(c => require(c.condition.nonEmpty,
        s"$what: a clause without a condition must be the LAST of its " +
          "family (matched / not-matched / not-matched-by-source) — " +
          "later clauses would be unreachable, stock Delta's rule"))
    (matched, inserts, bySource)
  }

  /** First-match-wins index over the matched clauses, evaluated on the
    * joined `t`/`s` frame: the 0-based index of the first clause whose
    * condition holds (null → false, the SQL rule), -1 when none does. */
  private def matchedIdxExpr(matched: Seq[MergeClause]): Column =
    matched.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (c, i)) =>
        val cond = coalesce(c.condition.getOrElse(lit(true)), lit(false))
        Some(acc.fold(when(cond, lit(i)))(_.when(cond, lit(i))))
    }.map(_.otherwise(lit(-1))).getOrElse(lit(-1))

  /** The post-merge value of target column `f` on a frame carrying the
    * family's first-match index column `idxCol`: the first applied
    * UPDATE clause's assignment, cast to the declared type — target's
    * own value when the applied clause does not set `f` or no clause
    * applied. Works for the matched AND by-source families (each
    * indexes its own clause list). */
  private def cascadeValue(f: org.apache.spark.sql.types.StructField,
      clauses: Seq[MergeClause], idxCol: String): Column = {
    val assigns = clauses.zipWithIndex.collect {
      case (MatchedUpdate(set, _), i) if set.contains(f.name) =>
        (i, set(f.name).cast(f.dataType))
      case (NotMatchedBySourceUpdate(set, _), i) if set.contains(f.name) =>
        (i, set(f.name).cast(f.dataType))
    }
    assigns.foldLeft(Option.empty[Column]) { case (acc, (i, v)) =>
      Some(acc.fold(when(col(idxCol) === i, v))(
        _.when(col(idxCol) === i, v)))
    }.map(_.otherwise(col(s"t.${f.name}")))
      .getOrElse(col(s"t.${f.name}"))
  }

  private def clauseValue(f: org.apache.spark.sql.types.StructField,
      matched: Seq[MergeClause]): Column =
    cascadeValue(f, matched, "__idx").as(f.name)

  private def clauseIdxs(cls: Seq[MergeClause],
      deletes: Boolean): Seq[Int] =
    cls.zipWithIndex.collect {
      case (_: MatchedDelete, i) if deletes => i
      case (_: NotMatchedBySourceDelete, i) if deletes => i
      case (_: MatchedUpdate, i) if !deletes => i
      case (_: NotMatchedBySourceUpdate, i) if !deletes => i
    }

  /** OR of the insert-clause conditions (first-match-wins collapses to
    * OR here — every insert clause inserts the same whole source row);
    * None when the merge has no `WHEN NOT MATCHED` clause. */
  private def insertCond(inserts: Seq[NotMatchedInsert]): Option[Column] =
    inserts.map(c => coalesce(c.condition.getOrElse(lit(true)), lit(false)))
      .reduceOption(_ || _)

  /** Conditional MERGE, COPY-ON-WRITE — stock Delta's full clause
    * model over [[mergeInto]]'s machinery: ordered
    * `WHEN MATCHED [AND cond] THEN UPDATE SET …/DELETE`,
    * `WHEN NOT MATCHED [AND cond] THEN INSERT`, and
    * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …/DELETE`
    * clauses, first-match-wins per family, partial-column updates,
    * tombstone deletes — the shape every real CDC pipeline applies
    * (see [[MergeClause]] for the `t`/`s` reference convention).
    * Candidate files come from the mirror's stats against the source's
    * key envelope exactly as [[mergeInto]]; untouched files are never
    * read or rewritten. With BY SOURCE clauses the envelope proves
    * nothing (any target row may be affected), so candidates come from
    * a TOUCHED-FILE DISCOVERY pass instead — one provenance-tagged
    * join of the visible rows against the source keeps exactly the
    * files holding a row some clause accepts (stock Delta's
    * findTouchedFiles shape); files no clause touches are read once
    * for discovery but never rewritten. The rewrite is ONE left-outer
    * join of the visible candidate rows against the (AQE-broadcast)
    * source: matched rows route through the matched cascade (update /
    * delete / pass through), unmatched target rows route through the
    * by-source cascade (pass through when absent), and insert-eligible
    * unmatched source rows union in. On a row-tracked table updated
    * and untouched rows KEEP their stable ids (the hidden
    * materialized-id column rides the join untouched); inserted rows
    * read fresh ids from the replacement file's claimed span. An EMPTY
    * source with by-source clauses is a legal full sync (age out every
    * accepted row).
    *
    * Under `delta.enableChangeDataFeed` the commit writes per-row-typed
    * change-data files — `delete` for matched-DELETE rows,
    * `update_preimage`/`update_postimage` for matched-UPDATE rows,
    * `insert` for inserted source rows — so [[changeFeed]] and the
    * mirror's `tableChanges` type the merge exactly.
    *
    * Source-key uniqueness is ENFORCED (stock MERGE's multiple-match
    * rule). A merge with no matched clause degenerates to a
    * conditional idempotent insert (anti-join append, no file
    * rewritten). */
  def mergeIntoClauses(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], clauses: Seq[MergeClause]): RewriteResult = {
    require(keys.nonEmpty, "mergeIntoClauses: at least one key column")
    val (matched, inserts, bySource) = splitClauses(clauses, "mergeIntoClauses")
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    // an EMPTY source still drives the by-source family (a full sync
    // against an empty feed ages out every row its conditions accept)
    if (source.isEmpty && bySource.isEmpty) return RewriteResult(base, 0L, 0L)
    requireUniqueSourceKeys(source, keys, "mergeIntoClauses")
    val table = Paths.get(dir)
    // by-source clauses can touch ANY target row, matched or not — the
    // source key envelope proves nothing about them, so pruning is off
    // (stock Delta rewrites the same span; the clause CONDITIONS bound
    // the change set, not the scan)
    val prune =
      if (bySource.nonEmpty) Seq.empty
      else {
        val bounds = source.select(keys.flatMap(k =>
          Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k"))): _*)
          .collect().head
        keys.zipWithIndex.map { case (k, i) =>
          (k, bounds.get(2 * i), bounds.get(2 * i + 1)) }
      }
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val idxExpr = matchedIdxExpr(matched)
    val bIdxExpr = matchedIdxExpr(bySource)
    val delIdxs = clauseIdxs(matched, deletes = true)
    val bysDelIdxs = clauseIdxs(bySource, deletes = true)
    val bysUpdIdxs = clauseIdxs(bySource, deletes = false)
    val insCond = insertCond(inserts)
    if (matched.isEmpty && bySource.isEmpty)
      return clauseInsertOnly(spark, dir, source, keys, prune, insCond.get)
    def outValue(f: org.apache.spark.sql.types.StructField): Column =
      if (bySource.isEmpty) clauseValue(f, matched)
      else when(col("__matched"), cascadeValue(f, matched, "__idx"))
        .otherwise(cascadeValue(f, bySource, "__bidx")).as(f.name)
    // TOUCHED-FILE DISCOVERY (by-source family): the key envelope
    // proves nothing under BY SOURCE clauses, but most syncs still
    // change only a SUBSET of files. One extra pass joins the visible
    // rows (with file provenance) against the source and keeps the
    // files holding at least one row SOME clause accepts — only those
    // rewrite (stock Delta's findTouchedFiles shape); untouched files
    // keep their bytes and row ids entirely. The insert anti-join then
    // runs against EVERY visible key, not just the touched files' — a
    // source key living in an untouched file is matched, never
    // insertable. O(touched file paths) to the driver, never rows.
    val discovery: Option[(Set[String], DataFrame)] =
      if (bySource.isEmpty) None
      else {
        val prevRels = readManifest(table, base)
        val prov = readRels(spark, table, prevRels,
          dvs = manifestDvs(table, base), provenance = true)
        val absToRel = prevRels.map(rel =>
          table.resolve(rel).toAbsolutePath.normalize().toString -> rel).toMap
        val touched = prov.alias("t")
          .join(source.withColumn("__m", lit(true)).alias("s"),
            keyCond, "left_outer")
          .withColumn("__matched", coalesce(col("__m"), lit(false)))
          .filter((col("__matched") && idxExpr >= 0) ||
            (!col("__matched") && bIdxExpr >= 0))
          .select(col("__file")).distinct()
          .collect().map(_.getString(0))
          .map(f => absToRel.getOrElse(f, sys.error(
            s"mergeIntoClauses: provenance path $f matches no manifest entry")))
          .toSet
        Some((touched, prov.select(keys.map(col): _*)))
      }
    val res = rewriteWhere(spark, dir, prune, { tgt =>
      val bad = (matched ++ bySource).collect {
        case MatchedUpdate(set, _) => set.keySet -- tgt.columns.toSet
        case NotMatchedBySourceUpdate(set, _) => set.keySet -- tgt.columns.toSet
      }.fold(Set.empty)(_ ++ _)
      require(bad.isEmpty,
        s"mergeIntoClauses: unknown SET column(s) ${bad.mkString(", ")}")
      val joined = tgt.alias("t")
        .join(source.withColumn("__m", lit(true)).alias("s"),
          keyCond, "left_outer")
        .withColumn("__matched", coalesce(col("__m"), lit(false)))
        .withColumn("__idx",
          when(col("__matched"), idxExpr).otherwise(lit(-1)))
        .withColumn("__bidx",
          when(!col("__matched"), bIdxExpr).otherwise(lit(-1)))
      val dropCond = Seq(
        if (delIdxs.isEmpty) None
        else Some(col("__matched") &&
          col("__idx").isin(delIdxs.map(Integer.valueOf): _*)),
        if (bysDelIdxs.isEmpty) None
        else Some(!col("__matched") &&
          col("__bidx").isin(bysDelIdxs.map(Integer.valueOf): _*))
      ).flatten.reduceOption(_ || _)
      val kept = dropCond.fold(joined)(c => joined.filter(!c))
      val survivors = kept.select(
        tgt.schema.fields.toSeq.map(outValue): _*)
      insCond match {
        case None => survivors
        case Some(ic) =>
          val extra = tgt.columns.toSet -- source.columns.toSet
          val antiKeys = discovery.map(_._2)
            .getOrElse(tgt.select(keys.map(col): _*))
          val ins0 = source.alias("s").filter(ic)
            .join(antiKeys, keys, "left_anti")
          survivors.unionByName(extra.foldLeft(ins0)((d, c) =>
            d.withColumn(c, lit(null).cast(tgt.schema(c).dataType))))
      }
    }, keepOnly = discovery.map(_._1),
    changeRows = Some { df => // df = visible candidate TABLE rows
      val joined = df.alias("t")
        .join(source.alias("s"), keyCond, "inner")
        .withColumn("__idx", idxExpr)
      val tCols = df.columns.toSeq.map(c => col(s"t.$c").as(c))
      val updIdxs = clauseIdxs(matched, deletes = false)
      val del =
        if (delIdxs.isEmpty) None
        else Some(joined
          .filter(col("__idx").isin(delIdxs.map(Integer.valueOf): _*))
          .select(tCols: _*).withColumn("_change_type", lit("delete")))
      val upd =
        if (updIdxs.isEmpty) None
        else {
          val hit = joined
            .filter(col("__idx").isin(updIdxs.map(Integer.valueOf): _*))
          Some(hit.select(tCols: _*)
            .withColumn("_change_type", lit("update_preimage"))
            .unionByName(hit.select(df.schema.fields.toSeq
              .map(f => clauseValue(f, matched)): _*)
              .withColumn("_change_type", lit("update_postimage"))))
        }
      // by-source change rows: unmatched TARGET rows the family accepts
      val bysJ =
        if (bySource.isEmpty) None
        else Some(df.alias("t")
          .join(source.select(keys.map(col): _*).alias("s"),
            keyCond, "left_anti")
          .withColumn("__bidx", bIdxExpr))
      val bysDel = bysJ.filter(_ => bysDelIdxs.nonEmpty).map(
        _.filter(col("__bidx").isin(bysDelIdxs.map(Integer.valueOf): _*))
          .select(tCols: _*).withColumn("_change_type", lit("delete")))
      val bysUpd = bysJ.filter(_ => bysUpdIdxs.nonEmpty).map { j =>
        val hit = j.filter(col("__bidx").isin(bysUpdIdxs.map(Integer.valueOf): _*))
        hit.select(tCols: _*)
          .withColumn("_change_type", lit("update_preimage"))
          .unionByName(hit.select(df.schema.fields.toSeq.map(f =>
            cascadeValue(f, bySource, "__bidx").as(f.name)): _*)
            .withColumn("_change_type", lit("update_postimage")))
      }
      val ins = insCond.map(ic =>
        // a partial-width source null-fills target-only columns, same
        // as the rewrite closure's insert union; under discovery the
        // anti-join sees every visible key, not just touched files'
        fillToTarget(source.alias("s").filter(ic)
          .join(discovery.map(_._2)
            .getOrElse(df.select(keys.map(col): _*)), keys, "left_anti"),
          df.schema)
          .select(df.columns.toSeq.map(col): _*)
          .withColumn("_change_type", lit("insert")))
      (del.toSeq ++ upd.toSeq ++ bysDel.toSeq ++ bysUpd.toSeq ++ ins.toSeq)
        .reduce(_.unionByName(_))
    })
    if (res.filesRewritten == 0L) {
      // envelope path: no live file can hold any source key, so every
      // source row is unmatched — conditional pure insert. Discovery
      // path: zero TOUCHED files still allows matched-but-unaccepted
      // keys to exist, so the anti-join against the visible keys stays.
      insCond match {
        case None => res
        case Some(ic) =>
          val cand0 = source.alias("s").filter(ic)
          val rows = fillToTableSchema(dir, discovery.map(d =>
            cand0.join(d._2, keys, "left_anti")).getOrElse(cand0))
          if (rows.isEmpty) res
          else {
            val partCols = readManifest(table, res.version).headOption
              .map(pathPartCols).getOrElse(Seq.empty)
            RewriteResult(commitAppend(rows, dir, partCols), 0L,
              res.filesSkipped)
          }
      }
    } else res
  }

  /** Conditional MERGE, MERGE-ON-READ — [[mergeIntoClauses]]'s clause
    * model (all three families, BY SOURCE included) over
    * [[mergeIntoDv]]'s machinery: rows an UPDATE or DELETE clause
    * accepts — matched rows through the matched cascade,
    * unmatched-by-source rows through the by-source cascade — are
    * HIDDEN by DV bitmaps on their files (rows no clause accepts stay
    * visible — nothing is touched), the UPDATE clauses' new row
    * versions plus the insert-eligible source rows land as ONE
    * appended batch, and no data file is rewritten: the commit stays
    * O(changed rows), the production CDC shape at 100 TB. Candidates
    * prune by the source key envelope (pruning off under BY SOURCE
    * clauses — any row may be affected); the matched cascade marks via
    * one inner join of the VISIBLE candidate rows against the
    * (AQE-broadcast) source, the by-source cascade via one anti-join
    * against the source keys — existing DVs applied first, so a dead
    * row can never resurrect as a match. Untouched and DV-hidden
    * survivors keep stable row ids by construction; the appended batch
    * claims fresh spans.
    *
    * Under `delta.enableChangeDataFeed` the commit writes
    * per-row-typed change-data files (`delete` / `update_preimage` /
    * `update_postimage` / `insert`); without CDF a later [[changeFeed]]
    * across the merge refuses loudly, as for [[mergeIntoDv]]. Gates as
    * [[mergeIntoDv]]: `delta.enableDeletionVectors` required,
    * `delta.appendOnly` refuses, source-key uniqueness enforced. */
  def mergeIntoDvClauses(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], clauses: Seq[MergeClause]): RewriteResult = {
    require(keys.nonEmpty, "mergeIntoDvClauses: at least one key column")
    val (matched, inserts, bySource) =
      splitClauses(clauses, "mergeIntoDvClauses")
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    if (!DeltaLog.tableConfig(table).get("delta.enableDeletionVectors")
        .contains("true"))
      sys.error(s"$dir: merge-on-read MERGE requires the deletionVectors " +
        "feature — setTableProperties(delta.enableDeletionVectors=true) " +
        "first (stock Delta's writer gate)")
    enforceAppendOnly(dir, "MERGE")
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    // an EMPTY source still drives the by-source family
    if (source.isEmpty && bySource.isEmpty) return RewriteResult(base, 0L, 0L)
    requireUniqueSourceKeys(source, keys, "mergeIntoDvClauses")
    // by-source clauses can touch any target row — pruning off (see
    // mergeIntoClauses)
    val prune =
      if (bySource.nonEmpty) Seq.empty[(String, Any, Any)]
      else {
        val bounds = source.select(keys.flatMap(k =>
          Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k"))): _*)
          .collect().head
        keys.zipWithIndex.map { case (k, i) =>
          (k, bounds.get(2 * i), bounds.get(2 * i + 1)) }
      }
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val idxExpr = matchedIdxExpr(matched)
    val bIdxExpr = matchedIdxExpr(bySource)
    val delIdxs = clauseIdxs(matched, deletes = true)
    val updIdxs = clauseIdxs(matched, deletes = false)
    val bysDelIdxs = clauseIdxs(bySource, deletes = true)
    val bysUpdIdxs = clauseIdxs(bySource, deletes = false)
    val insCond = insertCond(inserts)
    val prev = readManifest(table, base)
    val skipped: Set[String] =
      if (prune.isEmpty) Set.empty
      else scala.util.Try(DeltaLog.pruneFlags(spark, dir, prune)) match {
        case scala.util.Success((flags, _)) =>
          flags.collect { case (f, false) => f.path }.toSet
        case scala.util.Failure(_) => Set.empty
      }
    val candidates = prev.filterNot(skipped)
    val partCols = prev.headOption.map(pathPartCols).getOrElse(Seq.empty)
    if (candidates.isEmpty) {
      // no live file can hold any source key: conditional pure insert
      val rows = insCond.map(ic =>
        fillToTableSchema(dir, source.alias("s").filter(ic)))
      return rows match {
        case Some(r) if !r.isEmpty =>
          RewriteResult(commitAppend(r, dir, partCols), 0L,
            skipped.size.toLong)
        case _ => RewriteResult(base, 0L, skipped.size.toLong)
      }
    }
    val oldDvs = manifestDvs(table, base)
    val srcKeys = source.select(keys.map(col): _*)
    // hide exactly the visible rows SOME clause accepts — matched rows
    // through the matched cascade, unmatched-by-source rows through the
    // by-source cascade; rows no clause accepts stay live and untouched
    val updates =
      if (matched.isEmpty && bySource.isEmpty) Map.empty[String, String]
      else dvDescriptorUpdatesBy(spark, table, dir, candidates,
        { v =>
          val m =
            if (matched.isEmpty) None
            else Some(v.alias("t").join(source.alias("s"), keyCond, "inner")
              .withColumn("__idx", idxExpr).filter(col("__idx") =!= -1)
              .select(col("__f"), col("__p")))
          val b =
            if (bySource.isEmpty) None
            else Some(v.alias("t")
              .join(srcKeys.alias("s"), keyCond, "left_anti")
              .withColumn("__bidx", bIdxExpr).filter(col("__bidx") =!= -1)
              .select(col("__f"), col("__p")))
          (m.toSeq ++ b.toSeq).reduce(_.unionByName(_))
        },
        oldDvs, applyOldDvs = true)
    val visible = readRels(spark, table, candidates, dvs = oldDvs)
    val bad = (matched ++ bySource).collect {
      case MatchedUpdate(set, _) => set.keySet -- visible.columns.toSet
      case NotMatchedBySourceUpdate(set, _) =>
        set.keySet -- visible.columns.toSet
    }.fold(Set.empty)(_ ++ _)
    require(bad.isEmpty,
      s"mergeIntoDvClauses: unknown SET column(s) ${bad.mkString(", ")}")
    val visJoined = visible.alias("t")
      .join(source.alias("s"), keyCond, "inner")
      .withColumn("__idx", idxExpr)
    val updatedNew =
      if (updIdxs.isEmpty) None
      else Some(visJoined
        .filter(col("__idx").isin(updIdxs.map(Integer.valueOf): _*))
        .select(visible.schema.fields.toSeq
          .map(f => clauseValue(f, matched)): _*))
    // unmatched-by-source visible rows, routed through their cascade
    val bysJoined =
      if (bySource.isEmpty) None
      else Some(visible.alias("t")
        .join(srcKeys.alias("s"), keyCond, "left_anti")
        .withColumn("__bidx", bIdxExpr))
    val bysUpdNew = bysJoined.filter(_ => bysUpdIdxs.nonEmpty).map(
      _.filter(col("__bidx").isin(bysUpdIdxs.map(Integer.valueOf): _*))
        .select(visible.schema.fields.toSeq.map(f =>
          cascadeValue(f, bySource, "__bidx").as(f.name)): _*))
    // a source key in matchedKeys matched SOME visible row (unique
    // source keys make the anti-join exact); the rest are inserts — a
    // partial-width source null-fills target-only columns (stock
    // INSERT semantics, matching the copy-on-write twin)
    val matchedKeys = visJoined
      .select(keys.map(k => col(s"t.$k").as(k)): _*).dropDuplicates(keys)
    val insRows = insCond.map(ic =>
      fillToTarget(source.alias("s").filter(ic)
        .join(matchedKeys, keys, "left_anti"), visible.schema)
        .select(visible.columns.toSeq.map(col): _*))
    val batch = (updatedNew.toSeq ++ bysUpdNew.toSeq ++ insRows.toSeq)
      .reduceOption(_.unionByName(_))
    if (updates.isEmpty) {
      // no row hidden — nothing was updated or deleted; the batch (if
      // any) is pure inserts, a plain append
      return batch.filter(!_.isEmpty) match {
        case Some(b) => RewriteResult(commitAppend(b, dir, partCols), 0L,
          skipped.size.toLong)
        case None => RewriteResult(base, 0L, skipped.size.toLong)
      }
    }
    val replacement = batch.map(b => validateAndComplete(
      generatedColumnNames(dir).foldLeft(b)(_.drop(_)), dir))
    val added = replacement.map(writeBatch(_, table, partCols))
      .getOrElse(Seq.empty)
    val cdcRels =
      if (!cdfEnabled(table)) Seq.empty
      else {
        val tCols = visible.columns.toSeq.map(c => col(s"t.$c").as(c))
        val del =
          if (delIdxs.isEmpty) None
          else Some(visJoined
            .filter(col("__idx").isin(delIdxs.map(Integer.valueOf): _*))
            .select(tCols: _*).withColumn("_change_type", lit("delete")))
        val pre =
          if (updIdxs.isEmpty) None
          else Some(visJoined
            .filter(col("__idx").isin(updIdxs.map(Integer.valueOf): _*))
            .select(tCols: _*)
            .withColumn("_change_type", lit("update_preimage")))
        val bysDel = bysJoined.filter(_ => bysDelIdxs.nonEmpty).map(
          _.filter(col("__bidx").isin(bysDelIdxs.map(Integer.valueOf): _*))
            .select(tCols: _*).withColumn("_change_type", lit("delete")))
        val bysPre = bysJoined.filter(_ => bysUpdIdxs.nonEmpty).map(
          _.filter(col("__bidx").isin(bysUpdIdxs.map(Integer.valueOf): _*))
            .select(tCols: _*)
            .withColumn("_change_type", lit("update_preimage")))
        // postimages/inserts read back from the COMMITTED files, so
        // generated columns carry their final recomputed values; the
        // by-source updates' keys come from the TARGET side (they have
        // no source row by definition)
        val updKeysM =
          if (updIdxs.isEmpty) None
          else Some(visJoined
            .filter(col("__idx").isin(updIdxs.map(Integer.valueOf): _*))
            .select(keys.map(k => col(s"s.$k").as(k)): _*))
        val updKeysB = bysJoined.filter(_ => bysUpdIdxs.nonEmpty).map(
          _.filter(col("__bidx").isin(bysUpdIdxs.map(Integer.valueOf): _*))
            .select(keys.map(k => col(s"t.$k").as(k)): _*))
        val updKeys = (updKeysM.toSeq ++ updKeysB.toSeq)
          .reduceOption(_.unionByName(_)).map(_.dropDuplicates(keys))
        val appended =
          if (added.isEmpty) None else Some(readRels(spark, table, added))
        val post = appended.zip(updKeys).map { case (a, uk) =>
          a.join(uk, keys, "left_semi")
            .withColumn("_change_type", lit("update_postimage")) }
        val ins2 = appended.map(a =>
          updKeys.fold(a)(uk => a.join(uk, keys, "left_anti"))
            .withColumn("_change_type", lit("insert")))
        val all = (del.toSeq ++ pre.toSeq ++ bysDel.toSeq ++ bysPre.toSeq ++
          post.toSeq ++ ins2.toSeq)
          .reduce(_.unionByName(_, allowMissingColumns = true))
        writeCdcFiles(all, table)
      }
    val schemaJson = replacement.map(effectiveSchemaJson(_, dir))
      .orElse(DeltaLog.currentSchemaString(table))
      .getOrElse(sys.error(s"$dir: no mirrored metaData for a DV commit"))
    val v = commitDv(dir, base, updates, oldDvs, schemaJson, added = added,
      operation = "MERGE", cdcRels = cdcRels)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, updates.size.toLong, skipped.size.toLong)
  }

  /** The no-matched-clause degenerate of both clause merges: a
    * conditional idempotent insert. Source rows passing `insCond`
    * whose key matches NO visible row append; nothing else changes and
    * no file is touched in either DML family. Matches can only live in
    * envelope-pruned candidate files, so only those are scanned. */
  private def clauseInsertOnly(spark: SparkSession, dir: String,
      source: DataFrame, keys: Seq[String], prune: Seq[(String, Any, Any)],
      insCond: Column): RewriteResult = {
    val table = Paths.get(dir)
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    val prev = readManifest(table, base)
    val skipped: Set[String] =
      scala.util.Try(DeltaLog.pruneFlags(spark, dir, prune)) match {
        case scala.util.Success((flags, _)) =>
          flags.collect { case (f, false) => f.path }.toSet
        case scala.util.Failure(_) => Set.empty
      }
    val candidates = prev.filterNot(skipped)
    val partCols = prev.headOption.map(pathPartCols).getOrElse(Seq.empty)
    val eligible = fillToTableSchema(dir,
      source.alias("s").filter(insCond))
    val rows =
      if (candidates.isEmpty) eligible
      else eligible.join(
        readRels(spark, table, candidates, dvs = manifestDvs(table, base))
          .select(keys.map(col): _*),
        keys, "left_anti")
    if (rows.isEmpty) RewriteResult(base, 0L, skipped.size.toLong)
    else RewriteResult(commitAppend(rows, dir, partCols), 0L,
      skipped.size.toLong)
  }

  /** RESTORE to an earlier committed version (Delta's RESTORE): one
    * METADATA-ONLY commit whose manifest equals `version`'s — files
    * removed since then come back, files added since then drop out; no
    * data is copied or rewritten, so restoring a 100 TB table is an
    * O(files) log operation. Fails loudly when VACUUM already deleted a
    * needed file (the stock contract: restore works within retention).
    * History is preserved — the restore is a NEW version, so it can
    * itself be undone by another restore.
    */
  def restoreTo(spark: SparkSession, dir: String, version: Long): Long = {
    val table = Paths.get(dir)
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    require(version >= 1L && version <= base,
      s"restoreTo: version $version outside committed range 1..$base")
    if (version == base) return base
    if (!Files.exists(manifestPath(table, version)))
      sys.error(s"$dir: cannot restore to v$version — its manifest is " +
        "expired (vacuumed past the retention window)")
    val target = readManifest(table, version)
    val prevSet = readManifest(table, base).toSet
    val missing = target.filterNot(rel => Files.exists(table.resolve(rel)))
    if (missing.nonEmpty)
      sys.error(s"$dir: cannot restore to v$version — ${missing.size} data " +
        s"file(s) already vacuumed (e.g. ${missing.head})")
    val removedSet = prevSet -- target.toSet
    val added = target.filterNot(prevSet)
    // the restored version's schema travels with the commit, so the
    // mirror's metaData rolls back (or forward) with the data
    val schemaJson = snapshotAt(spark, dir, version).schema.json
    // restore FIDELITY for commit-point metadata: every file gets the
    // TARGET version's deletion vector (carrying the base's could hide
    // more rows than the restored state did; re-added files would
    // otherwise come back DV-less and resurrect deleted rows), and
    // re-added files on row-tracked tables bring back their ORIGINAL
    // rid entries and materialization markers
    val targetDvs = manifestDvs(table, version)
    val addedSet = added.toSet
    val targetRids = manifestRids(table, version).filter(r => addedSet(r._1))
    val targetMat = manifestRidMat(table, version).filter(addedSet)
    val v = commitRewrite(dir, base, removedSet, added, schemaJson,
      operation = "RESTORE", restoredRids = targetRids,
      restoredMat = targetMat, dvOverride = Some(targetDvs))
    DeltaLog.maybeCheckpoint(spark, dir, v)
    v
  }

  /** OPTIMIZE (bin-packing compaction): rewrite live data files smaller
    * than `smallBytes` into ~`targetBytes` outputs in one serializable
    * commit — the answer to streaming ingest's small-file problem
    * (micro-batch appends at a 5 s trigger write thousands of tiny
    * files a day; scans pay per-file open cost). The commit mirrors
    * with `dataChange=false`, so Delta-mirror change feeds skip it
    * (stock OPTIMIZE's contract: a compaction carries no new rows) —
    * the manifest-level [[changesBetween]] cannot make that
    * distinction (manifests don't record dataChange), so incremental
    * consumers spanning an optimize should read the mirror feed
    * (`DeltaLog.changesBetween`). Partitioned tables re-pack per
    * partition; the hive layout is preserved. Skipped = files already
    * at/above `smallBytes`.
    */
  def optimize(spark: SparkSession, dir: String,
      smallBytes: Long = 64L << 20,
      targetBytes: Long = 128L << 20): RewriteResult = {
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    val prev = readManifest(table, base)
    val (small, big) = prev.partition(rel =>
      Files.size(table.resolve(rel)) < smallBytes)
    if (small.size < 2) // nothing to pack (0/1 small file = no win)
      return RewriteResult(base, 0L, prev.size.toLong)
    val partCols = pathPartCols(small.head)
    val bytes = small.map(rel => Files.size(table.resolve(rel))).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // ROW-TRACKED tables compact with their ids MATERIALIZED: the
    // packed files carry each row's preserved id under the config-named
    // column (hidden from the table schema), so stable identity
    // survives the rewrite — the spec's materialization rule. The scan
    // is the same one pass the plain path pays, plus one long column.
    val tracked = rowTrackingOn(dir)
    val df =
      if (tracked) relsWithRowIds(spark, dir, base, small)
        .withColumnRenamed("_row_id", matRowIdCol(dir).getOrElse(
          sys.error(s"$dir: row tracking on but no materialized row-id " +
            "column name configured")))
      else readRels(spark, table, small, dvs = manifestDvs(table, base))
    val packed =
      if (partCols.nonEmpty) df.repartition(nOut, partCols.map(col): _*)
      else df.repartition(nOut)
    val added = writeBatch(packed, table, partCols)
    // the committed schema must stay the TABLE schema — the
    // materialized id column is file-level, never a table column
    val sjOpt = effectiveSchemaJson(
      matRowIdCol(dir).filter(_ => tracked).foldLeft(packed)(_.drop(_)), dir)
    val v = commitRewrite(dir, base, small.toSet, added, sjOpt,
      dataChange = false, operation = "OPTIMIZE",
      matAdded = if (tracked) added.toSet else Set.empty)
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, small.size.toLong, big.size.toLong)
  }

  /** OPTIMIZE ZORDER: rewrite the table's live files CLUSTERED on the
    * Morton interleave of two integral dimensions — the multi-dim
    * data-skipping layout (`OPTIMIZE ... ZORDER BY (x, y)`). Files are
    * split by `repartitionByRange` over the z-value and sorted within,
    * so every output file covers a compact z-range ⇒ tight min/max on
    * BOTH dimensions in its footer stats ⇒ the mirror's add.stats let
    * [[DeltaLog.skipScan]] prune 2-D box predicates — neither dimension
    * alone could deliver that. Commits `dataChange=false` like packing
    * OPTIMIZE: bytes move, no row changes, feeds and streams skip it.
    * At 100 TB the rewrite is one shuffle of the table — the standard
    * price of re-clustering, paid once per maintenance cycle.
    * Partitioned tables z-order WITHIN partitions (stock OPTIMIZE's
    * semantics) — the hive layout survives and partition pruning
    * composes with the 2-D skipping.
    */
  def optimizeZorder(spark: SparkSession, dir: String,
      xCol: String, yCol: String, nFiles: Int = 16): RewriteResult = {
    val table = Paths.get(dir)
    DeltaLog.warmMetaCache(spark, table)
    val base = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    val prev = readManifest(table, base)
    require(prev.nonEmpty, s"$dir: nothing to cluster")
    // PARTITIONED tables z-order WITHIN partitions (stock OPTIMIZE's
    // semantics): the range split runs on (partition cols, z-value),
    // so each output file covers one partition's compact z-range, and
    // the partitioned write preserves the hive layout — partition
    // pruning composes with the 2-D stats skipping
    val partCols = pathPartCols(prev.head)
    val df = readRels(spark, table, prev, dvs = manifestDvs(table, base))
    val zv = Layout.zval(col(xCol).cast("bigint"), col(yCol).cast("bigint"))
    val rangeKeys = partCols.map(col) :+ col("__zv")
    val clustered = df.withColumn("__zv", zv)
      .repartitionByRange(nFiles, rangeKeys: _*)
      .sortWithinPartitions(rangeKeys: _*)
      .drop("__zv")
    val added = writeBatch(clustered, table, partCols)
    val v = commitRewrite(dir, base, prev.toSet, added,
      effectiveSchemaJson(clustered, dir),
      dataChange = false, operation = "OPTIMIZE ZORDER")
    DeltaLog.maybeCheckpoint(spark, dir, v)
    RewriteResult(v, prev.size.toLong, 0L)
  }

  /** VACUUM: expire all but the last `retainVersions` manifests and
    * physically delete every data file no retained manifest references
    * — overwritten-away files AND orphans from dead writers — plus
    * every deletion-vector bin no retained manifest's `#dv` headers
    * name (superseded by a later merged bitmap, dropped by a
    * materializing rewrite, or orphaned), plus every `_change_data/`
    * cdc parquet no retained manifest's `#cdc` headers name (stock
    * Delta's VACUUM reclaims change data past retention the same way —
    * the feed's storage must not grow forever). Returns
    * (files deleted, files retained). Time travel keeps working within
    * the retention window and (correctly) fails beyond it — the same
    * contract as Delta's VACUUM/logRetention. At scale this runs from
    * the manifest listing (O(files) driver work or a parallelized
    * listing join), never a data scan.
    *
    * `minAgeMs` is the Delta-style modification-time threshold,
    * enforced PER BATCH (a directory with ANY file younger than the
    * threshold is left whole): an unreferenced young batch is
    * indistinguishable from an in-flight optimistic committer that has
    * written its data but not yet linked its manifest, and a per-file
    * check would still sweep the earliest files of a slow multi-file
    * write. Tests and the oracle query pass 0 (single-writer);
    * production keeps the Delta-scale default (7 days).
    */
  def vacuum(dir: String, retainVersions: Int = 1,
      minAgeMs: Long = 7L * 24 * 3600 * 1000L): (Long, Long) = {
    val table = Paths.get(dir)
    val cur = currentVersion(dir).getOrElse(sys.error(s"no committed version in $dir"))
    val oldest = math.max(1L, cur - retainVersions + 1)
    // a prior, tighter vacuum may already have expired manifests inside
    // this window — keep is the union of those that still exist
    val retained = (oldest to cur)
      .filter(v => Files.exists(manifestPath(table, v)))
    val keep = retained.flatMap(readManifest(table, _)).toSet
    // deletion-vector files referenced by any retained manifest's #dv
    // headers: every OTHER deletion_vector_*.bin at the table root is
    // superseded (each DV update replaces a file's bin with a merged
    // one) or orphaned by a dead writer — without this sweep they
    // accumulate forever, unbounded growth at exactly the scale DVs
    // exist for. Same retention contract as data files: a bin needed
    // only by an expired version goes with that version.
    val keepDv: Set[Path] = retained
      .flatMap(v => manifestDvs(table, v).values)
      .map(DeletionVectors.parseDescriptor)
      .collect { case d if d.storageType == "u" =>
        DeletionVectors.uPath(table, d.pathOrInlineDv).toAbsolutePath
      }.toSet
    // expire manifests below the retention floor
    listDir(logDir(table)).foreach { m =>
      val n = m.getFileName.toString
      if (n.startsWith("v") && n.endsWith(".manifest") &&
        n.stripPrefix("v").stripSuffix(".manifest").toLong < oldest)
        Files.delete(m)
    }
    val cutoff = System.currentTimeMillis() - minAgeMs
    def oldEnough(p: Path): Boolean = Files.getLastModifiedTime(p).toMillis <= cutoff
    var deleted = 0L
    listDir(table)
      .filter(d => Files.isDirectory(d) && d.getFileName.toString.startsWith("data-"))
      .foreach { d =>
        val batch = d.getFileName.toString
        // recursive: partitioned batches nest col=value directories
        def allFiles(p: Path): Seq[Path] = listDir(p).flatMap(f =>
          if (Files.isDirectory(f)) allFiles(f) else Seq(f))
        val (keptRels, junkRels) =
          dataFilesUnder(d, s"$batch/").partition(keep)
        // per-batch age gate: any young file marks the whole directory
        // as a possible in-flight write — touch nothing in it
        if (allFiles(d).forall(oldEnough)) {
          if (keptRels.isEmpty) {
            // whole batch unreferenced and aged out: remove the tree,
            // sidecars included
            def rm(p: Path): Unit = {
              listDir(p).foreach(f =>
                if (Files.isDirectory(f)) rm(f) else Files.delete(f))
              Files.delete(p)
            }
            deleted += junkRels.size
            rm(d)
          } else {
            junkRels.foreach { rel =>
              val f = table.resolve(rel)
              Files.delete(f)
              // the .crc sidecar goes with its parquet, or the dir-prune
              // below can never fire for swept partition directories
              Files.deleteIfExists(
                f.resolveSibling("." + f.getFileName.toString + ".crc"))
              deleted += 1
            }
            // prune partition dirs the sweep emptied
            def pruneEmpty(p: Path): Unit = {
              listDir(p).filter(Files.isDirectory(_)).foreach(pruneEmpty)
              if (p != d && listDir(p).isEmpty) Files.delete(p)
            }
            pruneEmpty(d)
          }
        }
      }
    // sweep unreferenced DV bins (table-root files, where this engine's
    // DV writers put them). The same age gate protects an in-flight
    // committer that has written its bin but not yet linked its
    // manifest.
    listDir(table).foreach { f =>
      val n = f.getFileName.toString
      if (!Files.isDirectory(f) && n.startsWith("deletion_vector_") &&
          n.endsWith(".bin") && !keepDv(f.toAbsolutePath) && oldEnough(f)) {
        Files.delete(f)
        deleted += 1
      }
    }
    // sweep unreferenced change-data parquet (PROTOCOL.md cdc files
    // under `_change_data/`) not named by any retained manifest's
    // `#cdc` header — every CDF-enabled DELETE/UPDATE/MERGE writes
    // them, so without this sweep the feed's storage grows forever
    // (the same unbounded-growth shape as the DV-bin leak; stock
    // Delta's VACUUM reclaims `_change_data` past retention too).
    // Same contracts as the data-batch walk: a cdc file needed only by
    // expired versions goes with them, and the per-directory age gate
    // protects an in-flight committer that has written its cdc files
    // but not yet linked the manifest.
    val cdcRoot = table.resolve("_change_data")
    if (Files.isDirectory(cdcRoot)) {
      val keepCdc: Set[String] =
        retained.flatMap(v => manifestCdc(table, v)).toSet
      def allFiles(p: Path): Seq[Path] = listDir(p).flatMap(f =>
        if (Files.isDirectory(f)) allFiles(f) else Seq(f))
      def rm(p: Path): Unit = {
        listDir(p).foreach(f =>
          if (Files.isDirectory(f)) rm(f) else Files.delete(f))
        Files.delete(p)
      }
      listDir(cdcRoot).filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith("cdc-")).foreach { d =>
        val (keptRels, junkRels) =
          dataFilesUnder(d, s"_change_data/${d.getFileName}/")
            .partition(keepCdc)
        if (allFiles(d).forall(oldEnough)) {
          if (keptRels.isEmpty) { deleted += junkRels.size; rm(d) }
          else junkRels.foreach { r =>
            val f = table.resolve(r)
            Files.delete(f)
            Files.deleteIfExists(
              f.resolveSibling("." + f.getFileName.toString + ".crc"))
            deleted += 1
          }
        }
      }
      if (listDir(cdcRoot).isEmpty) Files.delete(cdcRoot)
    }
    (deleted, keep.size.toLong)
  }

  /** Snapshot-isolated read of a committed version (default: latest).
    * Files are read PER BATCH with the batch directory as `basePath`:
    * Spark's partition discovery then turns a partitioned batch's
    * `col=value` segments into typed partition columns (pruned by
    * partition predicates), and demands nothing of the other batches —
    * partition dirs must sit directly under basePath, which holds
    * within a batch but not across them. Flat batches read identically
    * to before (basePath is inert without partition dirs); the union is
    * O(batches) in plan size, the same count the manifest already
    * enumerates. Partition-column types are INFERRED here (manifests
    * don't record a schema); the Delta mirror read
    * (`DeltaLog.snapshot`) types them from metaData.schemaString when
    * exactness matters.
    */
  /** Read a set of manifest-relative files, recovering partition
    * columns. Flat layouts (no hive segment anywhere) keep the single
    * flat scan — identical plan AND identical float-sum association to
    * always; partitioned layouts read per batch so each batch dir
    * anchors its own partition discovery.
    */
  /** `provenance = true` appends a `__file` column (the normalized
    * absolute data-file path — [[IcebergLog.normPathCol]]'s shared
    * spelling rule, so it joins against `table.resolve(rel)` forms) —
    * the by-source merge's touched-file discovery needs to know which
    * FILE each visible row came from. */
  private def readRels(spark: SparkSession, table: Path, rels: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      dvs: Map[String, String] = Map.empty,
      provenance: Boolean = false): DataFrame = {
    def rd = schema.map(spark.read.schema).getOrElse(spark.read)
    // deletion vectors filter EACH scan before any union: the row-index
    // UDF needs `_metadata`, which a union does not carry through
    def post(df: DataFrame): DataFrame = {
      val withP =
        if (!provenance) df
        else df.withColumn("__file",
          IcebergLog.normPathCol(col("_metadata.file_path")))
      if (dvs.isEmpty) withP
      else {
        val cols = withP.columns.toSeq
        val keep = DeletionVectors.keepUdf(spark, table, dvs)
        withP.filter(
          keep(col("_metadata.file_path"), col("_metadata.row_index")))
          .select(cols.map(col): _*)
      }
    }
    if (!rels.exists(_.split("/").exists(_.contains("="))))
      post(rd.parquet(rels.map(rel => table.resolve(rel).toString): _*))
    else rels.groupBy(_.split("/").head)
      .toSeq.sortBy(_._1)
      .map { case (batch, fs) =>
        post(rd.option("basePath", table.resolve(batch).toString)
          .parquet(fs.map(rel => table.resolve(rel).toString): _*))
      }
      .reduce(_.unionByName(_))
  }

  /** Snapshots are TYPED by the Delta mirror's metaData schema in force
    * at that version (tx version v maps to Delta version v−1), so a
    * schema-EVOLVED table reads correctly: files committed before a
    * column existed yield nulls for it instead of the whole snapshot
    * silently taking one random footer's schema. When the JSON prefix
    * is compacted away the schema comes from the newest CHECKPOINT at
    * or below the version; footer inference is the last resort for
    * tables with no mirror at all.
    */
  def snapshotAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val table = Paths.get(dir)
    readRels(spark, table, readManifest(table, version),
      DeltaLog.mirroredSchemaAt(spark, table, version - 1),
      dvs = manifestDvs(table, version))
  }

  def snapshot(spark: SparkSession, dir: String): DataFrame =
    snapshotAt(spark, dir, currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir")))

  /** Snapshot with each row's STABLE id attached as `_row_id`
    * (= the file's baseRowId + the row's physical position — exactly
    * the Delta rowTracking fresh-id rule). Deletion vectors hide rows
    * without moving survivors, so ids are delete-stable by
    * construction; appends extend the id space monotonically. The
    * per-file base map is config-scale (one row per live file,
    * broadcast): the corpus itself is never shuffled, and the position
    * comes free from the scan's `_metadata.row_index` — at 100 TB this
    * costs one broadcast-hash-join probe per row, no window, no sort.
    *
    * Files committed before row tracking was enabled have no id span;
    * nonzero-row legacy files refuse loudly (enable
    * `delta.enableRowTracking` before the first data commit).
    */
  def snapshotWithRowIds(spark: SparkSession, dir: String): DataFrame = {
    val version = currentVersion(dir).getOrElse(
      sys.error(s"no committed version in $dir"))
    relsWithRowIds(spark, dir, version,
      readManifest(Paths.get(dir), version))
  }

  /** The row-id-attaching scan over a rel subset of `version`'s live
    * set — shared by [[snapshotWithRowIds]] (all rels) and OPTIMIZE's
    * materializing rewrite (the files being compacted). A file with a
    * MATERIALIZED id column (`#ridmat`) contributes ids from that
    * column; everything else derives base + position. */
  private def relsWithRowIds(spark: SparkSession, dir: String, version: Long,
      rels: Seq[String]): DataFrame = {
    val table = Paths.get(dir)
    // config may live only in the checkpoint after the JSON prefix ages
    DeltaLog.warmMetaCache(spark, table)
    if (!rowTrackingOn(dir))
      sys.error(s"$dir: snapshotWithRowIds needs delta.enableRowTracking=true")
    val rids = manifestRids(table, version)
    val mat = manifestRidMat(table, version)
    val matCol = matRowIdCol(dir)
    val missing = rels.filterNot(rids.contains)
      .filterNot(rel => DeltaLog.fileRowCount(table.resolve(rel)).contains(0L))
    if (missing.nonEmpty)
      sys.error(s"$dir: ${missing.size} data file(s) predate row tracking " +
        "and carry rows — enable delta.enableRowTracking before the first " +
        "data commit")
    if (mat.nonEmpty && matCol.isEmpty)
      sys.error(s"$dir: #ridmat files present but " +
        "delta.rowTracking.materializedRowIdColumnName is unset")
    val dvs = manifestDvs(table, version)
    val schema = DeltaLog.mirroredSchemaAt(spark, table, version - 1)
      .getOrElse(sys.error(s"$dir: row-id reads need the mirrored schema"))
    // materialized ids live in a column HIDDEN from the table schema:
    // extend the read schema so files that carry it surface it (files
    // that don't read it as null — exactly what coalesce wants)
    val readSchema = matCol.filterNot(schema.fieldNames.contains)
      .map(c => schema.add(c, org.apache.spark.sql.types.LongType,
        nullable = true)).getOrElse(schema)
    // canonicalize `_metadata.file_path` (URI-escaped) to the raw path
    // the manifest-derived map keys on — same rule the Iceberg reader
    // applies to its delete-file joins
    val norm = (c: Column) =>
      when(c.startsWith("file:"),
        regexp_replace(url_decode(regexp_replace(c, "\\+", "%2B")),
          "^file:/+", "/"))
        .otherwise(c)
    def withProvenance(df: DataFrame): DataFrame = {
      val out = df
        .withColumn("__file", norm(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
      if (dvs.isEmpty) out
      else {
        val keep = DeletionVectors.keepUdf(spark, table, dvs)
        out.filter(keep(col("_metadata.file_path"), col("_metadata.row_index")))
      }
    }
    def rd = spark.read.schema(readSchema)
    val scanned =
      if (!rels.exists(_.split("/").exists(_.contains("="))))
        withProvenance(rd.parquet(rels.map(r => table.resolve(r).toString): _*))
      else rels.groupBy(_.split("/").head).toSeq.sortBy(_._1)
        .map { case (batch, fs) =>
          withProvenance(rd.option("basePath", table.resolve(batch).toString)
            .parquet(fs.map(r => table.resolve(r).toString): _*))
        }.reduce(_.unionByName(_))
    import spark.implicits._
    val bases = rids.toSeq.map { case (rel, r) =>
      (table.resolve(rel).toAbsolutePath.toString, r.base)
    }.toDF("__file_abs", "__base")
    val internal = Set("__file", "__pos") ++ matCol
    val cols = scanned.columns.filterNot(internal).map(col).toSeq
    val rowId = matCol
      .map(c => coalesce(col(c), col("__base") + col("__pos")))
      .getOrElse(col("__base") + col("__pos"))
    scanned.join(broadcast(bases), col("__file") === col("__file_abs"))
      .select(cols :+ rowId.as("_row_id"): _*)
  }

  /** The reference dashboard's raw directory glob (`dashboard.py:29-31`):
    * sees every parquet fragment, committed or not.
    */
  def dirtyScan(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(dir)

  // Staged fixture tables, built ONCE per corpus dir (the same memoized
  // ETL-staging pattern as Layout/Streams — the commit machinery is
  // exercised on first build; repeated query invocations time the READ
  // side and no temp directories leak per call).
  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Two committed batches + one orphaned (uncommitted) write. */
  private def snapshotTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"snap:$dir", {
      val table = graft.Scratch.dir("graft_txlog").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
      commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 1), table)
      // a writer that died before its commit: files on disk, never logged
      ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .write.parquet(Paths.get(table).resolve("data-orphan").toString)
      table
    })

  /** Governed ingest: append → install CHECK constraint + appendOnly →
    * a violating append and an overwrite both REFUSE (asserted here —
    * the fixture itself proves enforcement) → a conforming append
    * lands. The final table holds exactly the conforming batches.
    */
  private def constrainedTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"constr:$dir", {
      val table = graft.Scratch.dir("graft_txlog_constr").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") < 400), table)
      setTableProperties(spark, table, Map(
        "delta.constraints.idBound" -> "event_id < 800",
        "delta.appendOnly" -> "true"))
      val violating = scala.util.Try(
        commitAppend(ev.filter(col("event_id") >= 800), table))
      require(violating.isFailure &&
        violating.failed.get.getMessage.contains("idBound"),
        s"violating append must refuse: $violating")
      val over = scala.util.Try(
        commitOverwrite(ev.filter(col("event_id") < 100), table))
      require(over.isFailure &&
        over.failed.get.getMessage.contains("appendOnly"),
        s"overwrite must refuse under appendOnly: $over")
      commitAppend(ev.filter(col("event_id").between(400, 799)), table)
      table
    })

  /** Generated-date-partition ingest: first commit provides
    * `event_date` explicitly (partitioning is fixed at commit 1), the
    * generation expression installs, and every later batch OMITS the
    * column — computed at write, landed hive-partitioned. A
    * deliberately WRONG provided value must refuse (asserted here).
    */
  private def generatedTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"gen:$dir", {
      val table = graft.Scratch.dir("graft_txlog_gen").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") < 300)
        .withColumn("event_date", col("ts").cast("date")),
        table, partitionBy = Seq("event_date"))
      setGenerationExpression(spark, table, "event_date", "CAST(ts AS DATE)")
      // later batches omit the column entirely — it generates
      commitAppend(ev.filter(col("event_id").between(300, 649)),
        table, partitionBy = Seq("event_date"))
      // a batch that LIES about the generated value refuses
      val lying = scala.util.Try(commitAppend(
        ev.filter(col("event_id") >= 650)
          .withColumn("event_date", lit("1970-01-01").cast("date")),
        table, partitionBy = Seq("event_date")))
      require(lying.isFailure &&
        lying.failed.get.getMessage.contains("generated column"),
        s"divergent generated values must refuse: $lying")
      commitAppend(ev.filter(col("event_id") >= 650),
        table, partitionBy = Seq("event_date"))
      table
    })

  /** Events committed in a z-hostile layout (hash-partitioned — every
    * file spans both full dimension ranges), then OPTIMIZE ZORDER on
    * (event_id, user_id). */
  private def zorderedTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"zorder:$dir", {
      val table = graft.Scratch.dir("graft_txlog_zorder").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartition(8, col("event_type")), table)
      optimizeZorder(spark, table, "event_id", "user_id")
      table
    })

  /** Defaulted-column ingest: a pre-ADD batch, the ALTER adding
    * `fee DEFAULT 2.5`, a batch omitting it (filled at write), and a
    * batch providing an explicit value (wins). */
  private def defaultedTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"default:$dir", {
      val table = graft.Scratch.dir("graft_txlog_default").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") < 300), table)
      addColumnWithDefault(spark, table, "fee",
        org.apache.spark.sql.types.DoubleType, "2.5")
      commitAppend(ev.filter(col("event_id").between(300, 649)), table)
      commitAppend(ev.filter(col("event_id") >= 650)
        .withColumn("fee", lit(5.0)), table)
      table
    })

  /** Append v1, OVERWRITE to v2, orphan write, vacuum to latest. */
  private def vacuumedTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"vac:$dir", {
      val table = graft.Scratch.dir("graft_txlog_vac").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
      commitOverwrite(ev.filter(pmod(col("event_id"), lit(3)) === 1), table)
      ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .write.parquet(Paths.get(table).resolve("data-orphan").toString)
      vacuum(table, retainVersions = 1, minAgeMs = 0L) // single-writer: no in-flight committers
      table
    })

  /** Two appended versions for the change feed. */
  private def changesTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"cdf:$dir", {
      val table = graft.Scratch.dir("graft_txlog_cdf").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
      commitAppend(ev.filter(pmod(col("event_id"), lit(3)) === 1), table)
      table
    })

  /** Events laid out range-partitioned on event_id (8 files with
    * disjoint id ranges — the layout stats skipping prunes on), then a
    * row-level DELETE of the `event_id <= 300` band: only the low-range
    * file(s) get rewritten, the rest skip via mirror stats.
    */
  private def deleteTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"del:$dir", {
      val table = graft.Scratch.dir("graft_txlog_del").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(8, col("event_id")), table)
      deleteWhere(spark, table, col("event_id") <= 300,
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      table
    })

  /** Same layout, row-level UPDATE doubling `value` in the id band. */
  private def updateTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"upd:$dir", {
      val table = graft.Scratch.dir("graft_txlog_upd").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(8, col("event_id")), table)
      updateWhere(spark, table, col("event_id") <= 300,
        Map("value" -> (col("value") * 2)),
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      table
    })

  /** Base = events above id 200; merge source = the id<=200 rows (pure
    * inserts) plus the 201..300 band with doubled value (updates) — the
    * CDC-batch shape. The source key envelope [0,300] prunes every
    * higher-range base file.
    */
  private def mergeTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"mrg:$dir", {
      val table = graft.Scratch.dir("graft_txlog_mrg").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") > 200)
        .repartitionByRange(8, col("event_id")), table)
      val source = ev.filter(col("event_id") <= 200)
        .unionByName(ev.filter(col("event_id").between(201, 300))
          .withColumn("value", col("value") * 2))
      mergeInto(spark, table, source, Seq("event_id"))
      table
    })

  /** The [[mergeTable]] history replayed MERGE-ON-READ: same base
    * (events above id 200, 8 range files), same CDC-shaped source
    * (id<=200 inserts + the 201..300 band doubled), but the merge
    * hides matched rows with DVs and appends the source — no data file
    * rewritten. The oracle is IDENTICAL to [[mergeQuery]]'s: the two
    * merge paths must be row-for-row equivalent. */
  private def dvMergeTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"dvmrg:$dir", {
      val table = graft.Scratch.dir("graft_txlog_dvmrg").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") > 200)
        .repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableDeletionVectors" -> "true"))
      val source = ev.filter(col("event_id") <= 200)
        .unionByName(ev.filter(col("event_id").between(201, 300))
          .withColumn("value", col("value") * 2))
      mergeIntoDv(spark, table, source, Seq("event_id"))
      table
    })

  /** The conditional-MERGE clause list shared by both DML-family
    * fixtures — the full CDC shape: tombstone DELETEs (ids 301..350),
    * a partial UPDATE whose SET references BOTH sides (ids 201..300 →
    * `t.value + s.value` = 3×value, `ts` et al. untouched), matched
    * rows no clause accepts (351..400 — must stay byte-identical), and
    * a conditional INSERT that drops ids ≤ 100. */
  private def clauseMergeClauses: Seq[MergeClause] = Seq(
    MatchedDelete(Some(col("s.event_id").between(301, 350))),
    MatchedUpdate(Map("value" -> (col("t.value") + col("s.value"))),
      Some(col("s.event_id") <= 300)),
    NotMatchedInsert(Some(col("s.event_id") > 100)))

  private def clauseMergeSource(ev: DataFrame): DataFrame =
    ev.filter(col("event_id") <= 400).withColumn("value", col("value") * 2)

  /** Base = events above id 200 (8 range files, CDF on); clause merge
    * COPY-ON-WRITE — see [[clauseMergeClauses]] for the shape. */
  private def clauseMergeTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"clmrg:$dir", {
      val table = graft.Scratch.dir("graft_txlog_clmrg").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") > 200)
        .repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableChangeDataFeed" -> "true"))
      mergeIntoClauses(spark, table, clauseMergeSource(ev),
        Seq("event_id"), clauseMergeClauses)
      table
    })

  /** The [[clauseMergeTable]] history replayed MERGE-ON-READ: same
    * base, same source, same clauses — deletes and update preimages
    * hidden by DVs, new versions + inserts as one appended batch, no
    * file rewritten. The snapshot AND change-feed oracles are shared
    * with the copy-on-write twin: the two families must be
    * row-for-row equivalent. */
  private def clauseMergeDvTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"clmrgdv:$dir", {
      val table = graft.Scratch.dir("graft_txlog_clmrgdv").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") > 200)
        .repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table, Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
      mergeIntoDvClauses(spark, table, clauseMergeSource(ev),
        Seq("event_id"), clauseMergeClauses)
      table
    })

  /** The FULL-SYNC clause list: [[clauseMergeClauses]] plus the
    * BY SOURCE family — target rows the source feed no longer carries
    * (ids > 400 here) are flagged (401..500 → value negated) or aged
    * out (501..550 → DELETE); rows above 550 match no by-source clause
    * and stay byte-identical. */
  private def clauseSrcMergeClauses: Seq[MergeClause] =
    clauseMergeClauses ++ Seq(
      NotMatchedBySourceUpdate(Map("value" -> (-col("t.value"))),
        Some(col("t.event_id").between(401, 500))),
      NotMatchedBySourceDelete(Some(col("t.event_id").between(501, 550))))

  /** Base = events above id 200 (8 range files, CDF on); full-sync
    * clause merge COPY-ON-WRITE. */
  private def clauseSrcMergeTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"clmrgsrc:$dir", {
      val table = graft.Scratch.dir("graft_txlog_clmrgsrc").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") > 200)
        .repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableChangeDataFeed" -> "true"))
      mergeIntoClauses(spark, table, clauseMergeSource(ev),
        Seq("event_id"), clauseSrcMergeClauses)
      table
    })

  /** The [[clauseSrcMergeTable]] history replayed MERGE-ON-READ —
    * by-source flagged/aged rows hidden by DVs, their new versions +
    * inserts as one appended batch; snapshot and feed oracles shared
    * with the copy-on-write twin. */
  private def clauseSrcMergeDvTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"clmrgsrcdv:$dir", {
      val table = graft.Scratch.dir("graft_txlog_clmrgsrcdv").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(col("event_id") > 200)
        .repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table, Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
      mergeIntoDvClauses(spark, table, clauseMergeSource(ev),
        Seq("event_id"), clauseSrcMergeClauses)
      table
    })

  /** Full corpus committed, a band deleted, then RESTORE to v1: the
    * rollback must bring every deleted row back without copying data. */
  private def restoreTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"rst:$dir", {
      val table = graft.Scratch.dir("graft_txlog_rst").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(8, col("event_id")), table)
      deleteWhere(spark, table, col("event_id") <= 300,
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      restoreTo(spark, table, 1L)
      table
    })

  /** Five small streaming-shaped appends, then OPTIMIZE packs them. */
  private def optimizeTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"opt:$dir", {
      val table = graft.Scratch.dir("graft_txlog_opt").toString
      val ev = Tables.events(spark, dir)
      (0 until 5).foreach(i =>
        commitAppend(ev.filter(pmod(col("event_id"), lit(5)) === i), table))
      optimize(spark, table)
      table
    })

  /** Schema evolution: a second commit adds a `bonus` column — the
    * mirror emits a new metaData action, and snapshots type the table
    * by it (old files read bonus as null).
    */
  private def evolutionTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"evo:$dir", {
      val table = graft.Scratch.dir("graft_txlog_evo").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.filter(pmod(col("event_id"), lit(2)) === 0), table)
      commitAppend(ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .withColumn("bonus", col("value") * 2), table)
      table
    })

  /** Identity column installed after a schema-establishing empty
    * commit, then TWO deterministic appends (each a single sorted
    * partition, so the generated sequence is exactly row_number in
    * (batch, event_id) order — what the oracle reproduces with a
    * window). start=1000/step=5 exercises the non-default arithmetic.
    */
  private def identityTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"idn:$dir", {
      val table = graft.Scratch.dir("graft_txlog_idn").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.limit(0), table)
      addIdentityColumn(spark, table, "row_sid", start = 1000L, step = 5L)
      commitAppend(ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .coalesce(1).sortWithinPartitions("event_id"), table)
      commitAppend(ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .coalesce(1).sortWithinPartitions("event_id"), table)
      table
    })

  /** Row tracking enabled before the first data commit, two
    * deterministic single-sorted-file appends (ids = row_number in
    * (batch, event_id) order), then a merge-on-read DELETE — the
    * surviving rows must keep their ORIGINAL ids, which is the whole
    * point of stable row identity. */
  private def rowIdsTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"rid:$dir", {
      val table = graft.Scratch.dir("graft_txlog_rid").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.limit(0), table)
      setTableProperties(spark, table, Map(
        "delta.enableRowTracking" -> "true",
        "delta.enableDeletionVectors" -> "true"))
      commitAppend(ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .coalesce(1).sortWithinPartitions("event_id"), table)
      commitAppend(ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .coalesce(1).sortWithinPartitions("event_id"), table)
      deleteWhereDv(spark, table, pmod(col("event_id"), lit(7)) === 0)
      // compaction MATERIALIZES the ids: the oracle's expected values
      // are unchanged — that is the whole preservation claim
      optimize(spark, table)
      table
    })

  /** Materialize ALL fixture tables (idempotent) — bench-warmup hook.
    * Every `queries()` fixture must be staged here: an entry missing
    * from this list pays its multi-commit build inside the first TIMED
    * bench rep (the round-10 `q_txlog_update_dv` pathology — 1.63 s
    * driver rep vs 0.15 s steady-state median). */
  def prepare(spark: SparkSession, dir: String): Unit = {
    snapshotTable(spark, dir)
    constrainedTable(spark, dir)
    generatedTable(spark, dir)
    zorderedTable(spark, dir)
    defaultedTable(spark, dir)
    vacuumedTable(spark, dir)
    changesTable(spark, dir)
    deleteTable(spark, dir)
    updateTable(spark, dir)
    mergeTable(spark, dir)
    restoreTable(spark, dir)
    optimizeTable(spark, dir)
    evolutionTable(spark, dir)
    identityTable(spark, dir)
    rowIdsTable(spark, dir)
    dvDeleteTable(spark, dir)
    dvUpdateTable(spark, dir)
    dvMergeTable(spark, dir)
    cdfDvTable(spark, dir)
    cdcTable(spark, dir)
    cowCdcTable(spark, dir)
    clauseMergeTable(spark, dir)
    clauseMergeDvTable(spark, dir)
    clauseSrcMergeTable(spark, dir)
    clauseSrcMergeDvTable(spark, dir)
    ()
  }

  /** Oracle-checked query: the snapshot must aggregate exactly the
    * committed two-thirds of the corpus — proving readers never see a
    * half-finished writer.
    */
  def snapshotQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, snapshotTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val snapshotQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id % 3 < 2
      |GROUP BY 1""".stripMargin

  /** Oracle-checked VACUUM query: append v1, OVERWRITE to v2, leave an
    * orphan write, vacuum to the latest version only — then a RAW
    * recursive glob of the table directory must see exactly v2's rows.
    * The dirty scan is the proof: before vacuum it reads v1 + v2 +
    * orphan; only physical deletion of the expired/orphaned files can
    * make it equal the retained snapshot.
    */
  def vacuumQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet")
      .parquet(vacuumedTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val vacuumQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id % 3 = 1
      |GROUP BY 1""".stripMargin

  /** Live manifest-relative data files of one committed version — the
    * streaming source's first-batch (history) file list. */
  private[graft] def liveRelsAt(dir: String, v: Long): Seq[String] =
    readManifest(Paths.get(dir), v)

  /** The table's partition-column names (from the current manifest's
    * hive path segments; fixed at the first commit). */
  private[graft] def partitionColumnsOf(dir: String): Seq[String] =
    currentVersion(dir)
      .flatMap(v => readManifest(Paths.get(dir), v).headOption)
      .map(pathPartCols).getOrElse(Seq.empty)

  /** (version, added files, removed-anything?) for every version in
    * `[fromV, toV]`, each manifest read ONCE in one forward pass —
    * manifests are cumulative, so the naive per-version
    * [[commitDelta]] would read each O(total files) manifest twice and
    * turn a 1000-commit CDF planning call into O(V^2 · files) driver
    * IO. */
  private[graft] def commitDeltasRange(dir: String, fromV: Long,
      toV: Long): Seq[(Long, Seq[String], Boolean)] = {
    val table = Paths.get(dir)
    var prev: Set[String] =
      if (fromV <= 1) Set.empty
      else readManifest(table, fromV - 1).toSet
    (fromV to toV).map { v =>
      val cur = readManifest(table, v)
      val curSet = cur.toSet
      val out = (v, cur.filterNot(prev), prev.exists(p => !curSet(p)))
      prev = curSet
      out
    }
  }

  /** One commit's (added, removed) relative-path sets — the streaming
    * source's commit classifier (append / bytes-only rewrite / data
    * change). Metadata-scale: two manifest reads. */
  private[graft] def commitDelta(dir: String, v: Long): (Seq[String], Seq[String]) = {
    val table = Paths.get(dir)
    val prev = if (v <= 1) Seq.empty[String] else readManifest(table, v - 1)
    val cur = readManifest(table, v)
    (cur.filterNot(prev.toSet), prev.filterNot(cur.toSet))
  }

  /** Read specific committed files of `dir` with partition columns
    * reattached, TYPED by the mirrored metaData schema in force at
    * `asOfVersion` (footer inference over a schema-evolved file mix
    * could otherwise bind a stream batch to the wrong shape) — the
    * streaming source's per-batch read. */
  private[graft] def readFilesOf(spark: SparkSession, dir: String,
      rels: Seq[String], asOfVersion: Long): DataFrame = {
    val table = Paths.get(dir)
    readRels(spark, table, rels,
      DeltaLog.mirroredSchemaAt(spark, table, asOfVersion - 1),
      dvs = manifestDvs(table, asOfVersion))
  }

  /** Change data feed between two committed versions: with append-only
    * commits the change set is EXACTLY the files later manifests added,
    * so a change query READS ONLY the added files — O(changed data),
    * never a row-level diff of two snapshots. This is the Delta
    * CDF/`table_changes` efficiency claim expressed on the manifest
    * log; overwrite commits would add removed-file tracking to the
    * manifest format, not change the read shape.
    */
  def changesBetween(spark: SparkSession, dir: String, fromV: Long, toV: Long): DataFrame = {
    val table = Paths.get(dir)
    val before = readManifest(table, fromV).toSet
    val added = readManifest(table, toV).filterNot(before)
    // a DV delete changes rows WITHOUT adding files — this added-files
    // feed cannot express it (the change set is the newly-hidden rows
    // of UNCHANGED files). Refuse loudly rather than emit a feed that
    // silently misses the delete.
    if (manifestDvs(table, fromV) != manifestDvs(table, toV))
      sys.error(s"$dir: deletion vectors changed between versions $fromV " +
        s"and $toV — the added-files change feed cannot express a " +
        "merge-on-read delete; read the two snapshots instead")
    // an empty delta (identical manifests) is a valid empty feed, not a
    // schema-inference error: derive the schema from the target snapshot.
    // readRels keeps partition columns for partitioned batches — the
    // change feed must carry the same schema as the snapshot.
    if (added.nonEmpty) readRels(spark, table, added,
      dvs = manifestDvs(table, toV))
    else snapshotAt(spark, dir, toV).limit(0)
  }

  /** TYPED change feed (the Delta CDF row shape): the table's columns
    * plus `_change_type` and `_commit_version`, one entry per
    * data-changing version in (fromV, toV]. Where [[changesBetween]]
    * is an added-files feed that must refuse DV commits, this feed
    * SYNTHESIZES row-level changes from the DV DIFF — exactly what
    * stock Delta's CDF reader does for deletion-vector commits:
    *
    *  - `#op DELETE` (DV): the newly-hidden ordinals read back from
    *    their UNCHANGED files → `delete` rows carrying the deleted
    *    values;
    *  - `#op UPDATE` (DV): newly-hidden → `update_preimage`, the
    *    commit's appended batch → `update_postimage`;
    *  - appends → `insert`; dataChange=false commits (OPTIMIZE,
    *    ZORDER) emit nothing.
    *
    * Scale: the DV diff is bitmap set-difference per file
    * (O(hidden rows), driver-side like every DV descriptor walk); the
    * hidden rows come back through ONE pred-less scan of only the
    * AFFECTED files, semi-joined on broadcast (file, pos) pairs —
    * never a re-scan of the table. Copy-on-write rewrites refuse
    * loudly: without CDC files or DVs, "which rows changed" is not
    * derivable from a file swap — that refusal is what the
    * merge-on-read writers exist to remove.
    */
  def changeFeed(spark: SparkSession, dir: String, fromV: Long,
      toV: Long): DataFrame = {
    val table = Paths.get(dir)
    val norm = (c: Column) =>
      when(c.startsWith("file:"),
        regexp_replace(url_decode(regexp_replace(c, "\\+", "%2B")),
          "^file:/+", "/")).otherwise(c)
    def bitmapOf(json: String): Set[Long] =
      DeletionVectors.parse(DeletionVectors.readBytes(table,
        DeletionVectors.parseDescriptor(json))).values.toSet
    import spark.implicits._
    val feeds: Seq[DataFrame] = ((fromV + 1) to toV).flatMap { v =>
      val (op, dataChange) = manifestOp(table, v).getOrElse(("WRITE", true))
      if (!dataChange) Seq.empty
      else if (op == "MERGE") {
        // a MERGE's appended batch mixes update_postimage and insert
        // rows — the DV diff alone cannot attribute them (the source
        // keys are not in the manifest). Under CDF the commit wrote
        // per-row-typed change-data files: read those. Without CDF,
        // refuse loudly rather than mistype half the batch.
        val cdcRels = manifestCdc(table, v)
        if (cdcRels.isEmpty)
          sys.error(s"$dir: version $v is a MERGE without change-data " +
            "files — enable delta.enableChangeDataFeed before merging, " +
            "or read the two snapshots instead")
        Seq(readRels(spark, table, cdcRels)
          .withColumn("_commit_version", lit(v)))
      }
      else {
        val (added, removed) = commitDelta(dir, v)
        // a copy-on-write rewrite's file swap says nothing about WHICH
        // rows changed (the added batch mixes survivors with new
        // versions) — but under CDF the commit wrote per-row-typed
        // change-data files: read those. Only a cdc-less rewrite
        // (pre-CDF DML, RESTORE) still refuses.
        val cowCdc = if (removed.isEmpty) Seq.empty else manifestCdc(table, v)
        if (cowCdc.nonEmpty)
          Seq(readRels(spark, table, cowCdc)
            .withColumn("_commit_version", lit(v)))
        else {
        if (removed.nonEmpty)
          sys.error(s"$dir: version $v rewrote files (copy-on-write $op) — " +
            "row-level change synthesis needs merge-on-read (deletion " +
            "vectors) or delta.enableChangeDataFeed at DML time; read " +
            "the two snapshots instead")
        // v1 has no predecessor manifest — a (0, toV] range is the
        // "whole history" spelling and must not die reading v0
        val dvPrev =
          if (v <= 1L) Map.empty[String, String]
          else manifestDvs(table, v - 1)
        val dvNow = manifestDvs(table, v)
        val hiddenType = if (op == "UPDATE") "update_preimage" else "delete"
        val addedType = if (op == "UPDATE") "update_postimage" else "insert"
        val hidden: Option[DataFrame] =
          if (dvNow == dvPrev) None
          else {
            val pairs: Seq[(String, Long)] = dvNow.toSeq.flatMap {
              case (rel, json) =>
                val fresh = bitmapOf(json) --
                  dvPrev.get(rel).map(bitmapOf).getOrElse(Set.empty)
                val abs = table.resolve(rel).toString
                fresh.toSeq.sorted.map((abs, _))
            }
            if (pairs.isEmpty) None
            else {
              val rels = dvNow.keys.toSeq.filter(rel =>
                dvPrev.get(rel) != dvNow.get(rel)).sorted
              val raw = readRels(spark, table, rels) // RAW: the rows ARE hidden now
              val cols = raw.columns.toSeq
              Some(raw
                .withColumn("__file", norm(col("_metadata.file_path")))
                .withColumn("__pos", col("_metadata.row_index"))
                .join(broadcast(pairs.toDF("__df", "__dp")),
                  col("__file") === col("__df") && col("__pos") === col("__dp"),
                  "left_semi")
                .select(cols.map(col): _*)
                .withColumn("_change_type", lit(hiddenType)))
            }
          }
        val inserted: Option[DataFrame] =
          if (added.isEmpty) None
          else Some(readRels(spark, table, added)
            .withColumn("_change_type", lit(addedType)))
        (hidden.toSeq ++ inserted.toSeq)
          .map(_.withColumn("_commit_version", lit(v)))
        }
      }
    }
    // SCHEMA CONTRACT across evolution (stock Delta's CDF rule),
    // shared with DeltaLog.tableChanges: see [[CdfAlign]]. The
    // materialized row-id column is FILE-level (a row-tracked
    // OPTIMIZE bakes it into replacement footers, never into the
    // table schema) and must not trip the drop check.
    val aligned = CdfAlign.align(dir, "changeFeed", fromV, toV,
      snapshotAt(spark, dir, toV).schema, matRowIdCol(dir).toSet, feeds)
    aligned.reduceOption(_.unionByName(_))
      .getOrElse(snapshotAt(spark, dir, toV).limit(0)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(toV)))
  }

  /** Oracle-checked CDF query: two appended versions; the v1→v2 change
    * feed must aggregate to exactly the second batch's rows.
    */
  def changesQuery(spark: SparkSession, dir: String): DataFrame =
    changesBetween(spark, changesTable(spark, dir), 1L, 2L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val changesQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id % 3 = 1
      |GROUP BY 1""".stripMargin

  /** Oracle-checked row-level DELETE: after removing the id<=300 band
    * copy-on-write, the snapshot must aggregate to exactly the
    * surviving rows — and the untouched high-range files were never
    * rewritten (asserted file-level in TxLogSpec).
    */
  def deleteQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, deleteTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val deleteQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id > 300
      |GROUP BY 1""".stripMargin

  /** 8 range-split files; two MERGE-ON-READ deletes — the second band
    * overlaps the first, so overlap files exercise the DV UNION path —
    * with prune hints leaving the high-id files DV-free entirely. */
  private def dvDeleteTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"dvdel:$dir", {
      val table = graft.Scratch.dir("graft_txlog_dvdel").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableDeletionVectors" -> "true"))
      deleteWhereDv(spark, table, col("event_id") <= 300,
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      deleteWhereDv(spark, table, col("event_id").between(200L, 500L),
        Seq(("event_id", java.lang.Long.valueOf(200L),
          java.lang.Long.valueOf(500L))))
      table
    })

  /** Oracle-checked merge-on-read DELETE: no data file was rewritten
    * (both deletes committed pure-metadata DV descriptors), yet the
    * snapshot must aggregate exactly the surviving band — a
    * resurrected hidden row, a dropped survivor, or a lost bitmap
    * union on the overlap files all flip the hash. */
  def dvDeleteQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, dvDeleteTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val dvDeleteQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id > 500
      |GROUP BY 1""".stripMargin

  /** 8 range-split files; a MERGE-ON-READ delete, then two
    * merge-on-read UPDATEs: the first overlaps the delete band (hidden
    * rows must NOT resurrect as updates), the second overlaps the
    * FIRST's appended batch (update-over-update: the new rows' file
    * gets its own DV). Prune hints keep untouched bands DV-free. */
  private def dvUpdateTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"dvupd:$dir", {
      val table = graft.Scratch.dir("graft_txlog_dvupd").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(8, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableDeletionVectors" -> "true"))
      deleteWhereDv(spark, table, col("event_id") <= 200,
        Seq(("event_id", null, java.lang.Long.valueOf(200L))))
      updateWhereDv(spark, table,
        col("event_id").between(101L, 400L),
        Map("value" -> (col("value") * 3)),
        Seq(("event_id", java.lang.Long.valueOf(101L),
          java.lang.Long.valueOf(400L))))
      updateWhereDv(spark, table,
        col("event_id").between(301L, 600L),
        Map("value" -> (col("value") + 1)),
        Seq(("event_id", java.lang.Long.valueOf(301L),
          java.lang.Long.valueOf(600L))))
      table
    })

  /** Oracle-checked DSv2 read of a DV table: the connector's
    * row-path bitmap filtering must agree with the snapshot exactly —
    * same staged table and oracle as [[dvDeleteQuery]], but read
    * through `spark.read.format("graft-txlog")`, so a resurrected
    * ordinal, a bitmap misrouted across the single-file partitions, or
    * a dropped survivor row all flip the hash. */
  def dsv2DvQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-txlog")
      .option("path", dvDeleteTable(spark, dir)).load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked DSv2 TIME TRAVEL: the connector's `versionAsOf`
    * read of version 1 must aggregate exactly the FIRST committed
    * batch — the second batch leaking in, or the read resolving to the
    * current version, flips the hash. */
  def dsv2AsOfQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-txlog")
      .option("path", snapshotTable(spark, dir))
      .option("versionAsOf", "1").load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val dsv2AsOfQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id % 3 = 0
      |GROUP BY 1""".stripMargin

  /** History for the TYPED DV change feed: enable DVs, a DV DELETE, a
    * DV UPDATE on a disjoint band, then a plain append — the feed must
    * type each as delete / update_preimage+postimage / insert. */
  private def cdfDvTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"cdfdv:$dir", {
      val table = graft.Scratch.dir("graft_txlog_cdfdv").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(4, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableDeletionVectors" -> "true"))
      deleteWhereDv(spark, table, col("event_id") <= 300,
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      updateWhereDv(spark, table, col("event_id").between(400L, 500L),
        Map("value" -> (col("value") + 10)),
        Seq(("event_id", java.lang.Long.valueOf(400L),
          java.lang.Long.valueOf(500L))))
      commitAppend(ev.filter(col("event_id").between(900L, 1000L)), table)
      table
    })

  /** Oracle-checked TYPED change feed across merge-on-read commits:
    * the DV delete's rows surface as `delete` WITH their deleted
    * values (read back from unchanged files at the newly-hidden
    * ordinals), the DV update as preimage/postimage pairs, the append
    * as `insert` — a missed bitmap diff, a preimage read through the
    * wrong version's DVs, or a postimage double-count all flip the
    * hash. */
  def cdfDvQuery(spark: SparkSession, dir: String): DataFrame =
    changeFeed(spark, cdfDvTable(spark, dir), 2L, 5L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val cdfDvQueryOracle: String =
    """SELECT _change_type, count(*) AS n, round(sum(v), 2) AS total_value
      |FROM (
      |  SELECT 'delete' AS _change_type, value AS v FROM events
      |    WHERE event_id <= 300
      |  UNION ALL SELECT 'update_preimage', value FROM events
      |    WHERE event_id BETWEEN 400 AND 500
      |  UNION ALL SELECT 'update_postimage', value + 10 FROM events
      |    WHERE event_id BETWEEN 400 AND 500
      |  UNION ALL SELECT 'insert', value FROM events
      |    WHERE event_id BETWEEN 900 AND 1000
      |) GROUP BY 1""".stripMargin

  /** Like [[cdfDvTable]] but with `delta.enableChangeDataFeed=true`
    * installed BEFORE the DML, so every merge-on-read commit also
    * writes PROTOCOL.md change-data files + `cdc` actions. */
  private def cdcTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"cdc:$dir", {
      val table = graft.Scratch.dir("graft_txlog_cdc").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(4, col("event_id")), table)
      setTableProperties(spark, table, Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
      deleteWhereDv(spark, table, col("event_id") <= 300,
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      updateWhereDv(spark, table, col("event_id").between(400L, 500L),
        Map("value" -> (col("value") + 10)),
        Seq(("event_id", java.lang.Long.valueOf(400L),
          java.lang.Long.valueOf(500L))))
      commitAppend(ev.filter(col("event_id").between(900L, 1000L)), table)
      table
    })

  /** Like [[cdcTable]] but WITHOUT deletion vectors: the DML takes the
    * COPY-ON-WRITE paths, whose file swaps say nothing about changed
    * rows — the typed feed must come entirely from the protocol
    * change-data files the CDF property made each rewrite record. */
  private def cowCdcTable(spark: SparkSession, dir: String): String =
    staged.getOrElseUpdate(s"cowcdc:$dir", {
      val table = graft.Scratch.dir("graft_txlog_cowcdc").toString
      val ev = Tables.events(spark, dir)
      commitAppend(ev.repartitionByRange(4, col("event_id")), table)
      setTableProperties(spark, table,
        Map("delta.enableChangeDataFeed" -> "true"))
      deleteWhere(spark, table, col("event_id") <= 300,
        Seq(("event_id", null, java.lang.Long.valueOf(300L))))
      updateWhere(spark, table, col("event_id").between(400L, 500L),
        Map("value" -> (col("value") + 10)),
        Seq(("event_id", java.lang.Long.valueOf(400L),
          java.lang.Long.valueOf(500L))))
      commitAppend(ev.filter(col("event_id").between(900L, 1000L)), table)
      table
    })

  /** Oracle-checked TYPED change feed across COPY-ON-WRITE commits:
    * same change history and oracle as [[cdfDvQuery]], but every DML
    * version rewrote files — the feed reads the commits' change-data
    * parquet instead of synthesizing from DV diffs. A survivor row
    * leaking from the rewrite batch into the feed, a missing cdc file,
    * or a mistyped row all flip the hash. */
  def cowCdfQuery(spark: SparkSession, dir: String): DataFrame =
    changeFeed(spark, cowCdcTable(spark, dir), 2L, 5L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked FOREIGN-READABLE CDF: the same change history as
    * [[cdfDvQuery]], but read back through [[DeltaLog.tableChanges]] —
    * the Delta log's own `cdc` actions and change-data parquet, the
    * path any CDF-aware external reader takes. A cdc file missing from
    * a commit, a preimage written through the wrong DV state, or an
    * insert double-fed alongside its cdc records all flip the hash. */
  def cdcQuery(spark: SparkSession, dir: String): DataFrame =
    DeltaLog.tableChanges(spark, cdcTable(spark, dir), 2L, 5L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked merge-on-read UPDATE: deleted rows stay dead
    * through the overlapping update band, updated rows carry exactly
    * the composed assignments (×3 then +1 where the bands stack), and
    * no row is gained or lost — a resurrected hidden row, a
    * double-applied assignment, or an update lost on the appended
    * batch all flip the hash. */
  def dvUpdateQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, dvUpdateTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val dvUpdateQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE
      |    WHEN event_id BETWEEN 201 AND 300 THEN value * 3
      |    WHEN event_id BETWEEN 301 AND 400 THEN value * 3 + 1
      |    WHEN event_id BETWEEN 401 AND 600 THEN value + 1
      |    ELSE value END), 2) AS total_value
      |FROM events WHERE event_id > 200
      |GROUP BY 1""".stripMargin

  /** Oracle-checked row-level UPDATE: doubled values inside the band,
    * untouched outside, no rows gained or lost.
    */
  def updateQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, updateTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val updateQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE WHEN event_id <= 300 THEN value * 2 ELSE value END), 2)
      |    AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Oracle-checked MERGE: inserts restore the id<=200 rows, updates
    * double the 201..300 band, everything above is untouched — the
    * merged table must equal the full corpus with the band doubled.
    */
  def mergeQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, mergeTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val mergeQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE WHEN event_id BETWEEN 201 AND 300 THEN value * 2
      |            ELSE value END), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Oracle-checked MERGE-ON-READ MERGE: the identical upsert to
    * [[mergeQuery]] — inserts restore the id<=200 rows, updates double
    * the 201..300 band — committed as DV masks + one appended batch
    * instead of file rewrites. Shares [[mergeQueryOracle]]: a resurrected
    * hidden row, a matched row surviving unhidden (double-counted
    * against its replacement), or a lost insert all flip the hash. */
  def dvMergeQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, dvMergeTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked CONDITIONAL MERGE (copy-on-write): after the
    * clause-mixed merge the snapshot must hold 101..200 at 2×value
    * (conditional inserts), 201..300 at 3×value (partial UPDATE with a
    * both-sides SET), nothing in 301..350 (tombstone DELETE clause),
    * 351..400 untouched (matched, no clause accepts), ids ≤ 100 absent
    * (insert condition), everything above 400 untouched. A clause
    * applied out of order, a pass-through row lost, or an insert that
    * ignored its condition all flip the hash. */
  def clauseMergeQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, clauseMergeTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val clauseMergeQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE WHEN event_id BETWEEN 101 AND 200 THEN value * 2
      |                 WHEN event_id BETWEEN 201 AND 300 THEN value * 3
      |                 ELSE value END), 2) AS total_value
      |FROM events
      |WHERE event_id BETWEEN 101 AND 300 OR event_id > 350
      |GROUP BY 1""".stripMargin

  /** Oracle-checked CONDITIONAL MERGE, merge-on-read: identical history
    * and oracle to [[clauseMergeQuery]] — DV masks + one appended
    * batch instead of rewrites; the families must agree row-for-row. */
  def clauseMergeDvQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, clauseMergeDvTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked change feed over the merge-on-read conditional
    * MERGE: matched-DELETE rows must type `delete` (NOT
    * update_preimage), partial updates as preimage/postimage pairs
    * with the postimage carrying the composed SET, conditional inserts
    * as `insert` — read from the commit's per-row-typed change-data
    * files. */
  def clauseMergeCdfQuery(spark: SparkSession, dir: String): DataFrame =
    changeFeed(spark, clauseMergeDvTable(spark, dir), 2L, 3L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val clauseMergeCdfQueryOracle: String =
    """SELECT _change_type, count(*) AS n, round(sum(v), 2) AS total_value
      |FROM (
      |  SELECT 'delete' AS _change_type, value AS v FROM events
      |    WHERE event_id BETWEEN 301 AND 350
      |  UNION ALL SELECT 'update_preimage', value FROM events
      |    WHERE event_id BETWEEN 201 AND 300
      |  UNION ALL SELECT 'update_postimage', value * 3 FROM events
      |    WHERE event_id BETWEEN 201 AND 300
      |  UNION ALL SELECT 'insert', value * 2 FROM events
      |    WHERE event_id BETWEEN 101 AND 200
      |) GROUP BY 1""".stripMargin

  /** The same change-feed check over the COPY-ON-WRITE twin — the cdc
    * files a clause-mixed rewrite wrote must carry the identical typed
    * rows (shares [[clauseMergeCdfQueryOracle]]). */
  def clauseMergeCdfCowQuery(spark: SparkSession, dir: String): DataFrame =
    changeFeed(spark, clauseMergeTable(spark, dir), 2L, 3L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked FULL-SYNC MERGE (copy-on-write): on top of the
    * [[clauseMergeQuery]] expectations, 401..500 must read NEGATED
    * (by-source UPDATE), 501..550 must be gone (by-source DELETE), and
    * everything above 550 untouched (unmatched-by-source, no clause
    * accepts). A by-source clause applied to a MATCHED row, a missed
    * age-out, or a flag leaking past its condition all flip the hash. */
  def clauseSrcMergeQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, clauseSrcMergeTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val clauseSrcMergeQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE WHEN event_id BETWEEN 101 AND 200 THEN value * 2
      |                 WHEN event_id BETWEEN 201 AND 300 THEN value * 3
      |                 WHEN event_id BETWEEN 401 AND 500 THEN -value
      |                 ELSE value END), 2) AS total_value
      |FROM events
      |WHERE (event_id BETWEEN 101 AND 300)
      |   OR (event_id BETWEEN 351 AND 500) OR event_id > 550
      |GROUP BY 1""".stripMargin

  /** Oracle-checked FULL-SYNC MERGE, merge-on-read: identical history
    * and oracle to [[clauseSrcMergeQuery]] — the families must agree
    * row-for-row. */
  def clauseSrcMergeDvQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, clauseSrcMergeDvTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked change feed over the merge-on-read full sync: the
    * by-source family's rows must type exactly — aged-out rows
    * `delete`, flagged rows as preimage (original) / postimage
    * (negated) pairs — alongside the matched family's rows. */
  def clauseSrcMergeCdfQuery(spark: SparkSession, dir: String): DataFrame =
    changeFeed(spark, clauseSrcMergeDvTable(spark, dir), 2L, 3L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val clauseSrcMergeCdfQueryOracle: String =
    """SELECT _change_type, count(*) AS n, round(sum(v), 2) AS total_value
      |FROM (
      |  SELECT 'delete' AS _change_type, value AS v FROM events
      |    WHERE event_id BETWEEN 301 AND 350
      |  UNION ALL SELECT 'delete', value FROM events
      |    WHERE event_id BETWEEN 501 AND 550
      |  UNION ALL SELECT 'update_preimage', value FROM events
      |    WHERE event_id BETWEEN 201 AND 300
      |  UNION ALL SELECT 'update_preimage', value FROM events
      |    WHERE event_id BETWEEN 401 AND 500
      |  UNION ALL SELECT 'update_postimage', value * 3 FROM events
      |    WHERE event_id BETWEEN 201 AND 300
      |  UNION ALL SELECT 'update_postimage', -value FROM events
      |    WHERE event_id BETWEEN 401 AND 500
      |  UNION ALL SELECT 'insert', value * 2 FROM events
      |    WHERE event_id BETWEEN 101 AND 200
      |) GROUP BY 1""".stripMargin

  /** The same full-sync feed over the COPY-ON-WRITE twin (shares
    * [[clauseSrcMergeCdfQueryOracle]]). */
  def clauseSrcMergeCdfCowQuery(spark: SparkSession, dir: String): DataFrame =
    changeFeed(spark, clauseSrcMergeTable(spark, dir), 2L, 3L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Oracle-checked RESTORE: after delete + restore-to-v1, the snapshot
    * must equal the FULL corpus again — only a real rollback of the
    * removed files can produce that.
    */
  def restoreQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, restoreTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val restoreQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Oracle-checked OPTIMIZE: compaction must be row-invisible — the
    * packed table aggregates exactly like the raw corpus (file-count
    * shrinkage and feed invisibility are spec-asserted).
    */
  def optimizeQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, optimizeTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        round(sum(col("value")), 2).as("total_value"))

  val optimizeQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS users,
      |  round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Oracle-checked schema evolution: the snapshot must carry the
    * evolved schema, with pre-evolution rows reading the new column as
    * null — only metaData-typed reads (not footer inference, which
    * would pick one era's schema for everything) aggregate this right.
    */
  def evolutionQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, evolutionTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(coalesce(col("bonus"), lit(0.0))), 2).as("total_bonus"))

  val evolutionQueryOracle: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE WHEN event_id % 2 = 1 THEN value * 2 ELSE 0 END), 2)
      |    AS total_bonus
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Oracle-checked governed ingest: after the fixture's refused
    * violating append and refused overwrite, the snapshot must hold
    * EXACTLY the conforming batches — a constraint that silently let
    * rows through, or an overwrite that silently succeeded, flips the
    * hash.
    */
  def constraintsQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, constrainedTable(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val constraintsQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events WHERE event_id < 800
      |GROUP BY 1""".stripMargin

  /** Oracle-checked generated-partition read: a date-range filter over
    * the generated column — computed at write for every batch that
    * omitted it — must aggregate exactly like deriving the date from
    * `ts` directly; the refused lying batch must have left no rows.
    */
  def generatedQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, generatedTable(spark, dir))
      .filter(col("event_date").between("2024-01-05", "2024-01-10"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val generatedQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN '2024-01-05' AND '2024-01-10'
      |GROUP BY 1""".stripMargin

  /** Oracle-checked OPTIMIZE ZORDER: a 2-D box predicate over the
    * re-clustered table — the skip-scan must prune on the mirror's
    * per-file stats of BOTH dimensions and still aggregate exactly
    * (file-level prune counts are spec-asserted).
    */
  def zorderQuery(spark: SparkSession, dir: String): DataFrame =
    DeltaLog.skipScan(spark, zorderedTable(spark, dir),
      Seq(("event_id", 100L, 5000L), ("user_id", 0L, 10L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val zorderQueryOracle: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |WHERE event_id BETWEEN 100 AND 5000 AND user_id BETWEEN 0 AND 10
      |GROUP BY 1""".stripMargin

  /** Oracle-checked column DEFAULTS: pre-ADD rows must read the
    * default (EXISTS_DEFAULT through the schema-typed scan), an
    * omitting batch gets it at write (CURRENT_DEFAULT), and a provided
    * value wins — the three-way split the oracle derives from
    * event_id bands.
    */
  def defaultsQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, defaultedTable(spark, dir))
      .groupBy(col("fee"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  val defaultsQueryOracle: String =
    """SELECT CASE WHEN event_id >= 650 THEN 5.0 ELSE 2.5 END AS fee,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Oracle-checked IDENTITY: generated values must be exactly the
    * deterministic sequence the build order implies — unique, dense,
    * start/step arithmetic, batch-ordered — verified value-for-value
    * through a product checksum, not just count/min/max.
    */
  def identityQuery(spark: SparkSession, dir: String): DataFrame =
    snapshot(spark, identityTable(spark, dir))
      .agg(count(lit(1)).as("n"),
        count(col("row_sid")).as("n_ids"),
        countDistinct(col("row_sid")).as("n_distinct"),
        min(col("row_sid")).as("min_sid"),
        max(col("row_sid")).as("max_sid"),
        sum(col("row_sid") * col("event_id")).as("chk"))

  val identityQueryOracle: String =
    """WITH ordered AS (
      |  SELECT event_id,
      |    1000 + 5 * (row_number() OVER
      |      (ORDER BY (event_id % 2) <> 0, event_id) - 1) AS row_sid
      |  FROM events
      |)
      |SELECT count(*) AS n, count(row_sid) AS n_ids,
      |  CAST(count(DISTINCT row_sid) AS BIGINT) AS n_distinct,
      |  min(row_sid) AS min_sid, max(row_sid) AS max_sid,
      |  CAST(sum(row_sid * event_id) AS BIGINT) AS chk
      |FROM ordered""".stripMargin

  /** Oracle-checked ROW TRACKING: after a merge-on-read DELETE the
    * survivors must keep the ids assigned at append time — max(_row_id)
    * stays at the pre-delete ceiling while count shrinks, and the
    * product checksum pins every (row, id) pairing, not just the
    * envelope.
    */
  def rowIdsQuery(spark: SparkSession, dir: String): DataFrame =
    snapshotWithRowIds(spark, rowIdsTable(spark, dir))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("_row_id")).as("n_distinct"),
        min(col("_row_id")).as("min_rid"),
        max(col("_row_id")).as("max_rid"),
        sum(col("_row_id") * col("event_id")).as("chk"))

  val rowIdsQueryOracle: String =
    """WITH ordered AS (
      |  SELECT event_id,
      |    row_number() OVER (ORDER BY (event_id % 2) <> 0, event_id) - 1
      |      AS rid
      |  FROM events
      |)
      |SELECT count(*) AS n,
      |  CAST(count(DISTINCT rid) AS BIGINT) AS n_distinct,
      |  min(rid) AS min_rid, max(rid) AS max_rid,
      |  CAST(sum(rid * event_id) AS BIGINT) AS chk
      |FROM ordered WHERE event_id % 7 <> 0""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_txlog_identity" -> identityQuery _,
    "q_txlog_rowids" -> rowIdsQuery _,
    "q_txlog_defaults" -> defaultsQuery _,
    "q_txlog_zorder" -> zorderQuery _,
    "q_generated_partition" -> generatedQuery _,
    "q_txlog_constraints" -> constraintsQuery _,
    "q_txlog_snapshot" -> snapshotQuery _,
    "q_txlog_vacuum" -> vacuumQuery _,
    "q_txlog_changes" -> changesQuery _,
    "q_txlog_delete" -> deleteQuery _,
    "q_txlog_delete_dv" -> dvDeleteQuery _,
    "q_txlog_update_dv" -> dvUpdateQuery _,
    "q_txlog_cdf_dv" -> cdfDvQuery _,
    "q_txlog_cdf_cow" -> cowCdfQuery _,
    "q_txlog_dsv2_dv" -> dsv2DvQuery _,
    "q_txlog_dsv2_asof" -> dsv2AsOfQuery _,
    "q_delta_cdc" -> cdcQuery _,
    "q_txlog_update" -> updateQuery _,
    "q_txlog_merge" -> mergeQuery _,
    "q_txlog_merge_dv" -> dvMergeQuery _,
    "q_txlog_merge_clauses" -> clauseMergeQuery _,
    "q_txlog_merge_clauses_dv" -> clauseMergeDvQuery _,
    "q_txlog_merge_clauses_cdf" -> clauseMergeCdfQuery _,
    "q_txlog_merge_clauses_cdf_cow" -> clauseMergeCdfCowQuery _,
    "q_txlog_merge_clauses_src" -> clauseSrcMergeQuery _,
    "q_txlog_merge_clauses_src_dv" -> clauseSrcMergeDvQuery _,
    "q_txlog_merge_clauses_src_cdf" -> clauseSrcMergeCdfQuery _,
    "q_txlog_merge_clauses_src_cdf_cow" -> clauseSrcMergeCdfCowQuery _,
    "q_txlog_restore" -> restoreQuery _,
    "q_txlog_optimize" -> optimizeQuery _,
    "q_txlog_evolution" -> evolutionQuery _
  )

  def oracles: Map[String, String] = Map(
    "q_txlog_identity" -> identityQueryOracle,
    "q_txlog_rowids" -> rowIdsQueryOracle,
    "q_txlog_defaults" -> defaultsQueryOracle,
    "q_txlog_zorder" -> zorderQueryOracle,
    "q_generated_partition" -> generatedQueryOracle,
    "q_txlog_constraints" -> constraintsQueryOracle,
    "q_txlog_snapshot" -> snapshotQueryOracle,
    "q_txlog_vacuum" -> vacuumQueryOracle,
    "q_txlog_changes" -> changesQueryOracle,
    "q_txlog_delete" -> deleteQueryOracle,
    "q_txlog_delete_dv" -> dvDeleteQueryOracle,
    "q_txlog_update_dv" -> dvUpdateQueryOracle,
    "q_txlog_cdf_dv" -> cdfDvQueryOracle,
    "q_txlog_cdf_cow" -> cdfDvQueryOracle,
    "q_txlog_dsv2_dv" -> dvDeleteQueryOracle,
    "q_txlog_dsv2_asof" -> dsv2AsOfQueryOracle,
    "q_delta_cdc" -> cdfDvQueryOracle,
    "q_txlog_update" -> updateQueryOracle,
    "q_txlog_merge" -> mergeQueryOracle,
    "q_txlog_merge_dv" -> mergeQueryOracle,
    "q_txlog_merge_clauses" -> clauseMergeQueryOracle,
    "q_txlog_merge_clauses_dv" -> clauseMergeQueryOracle,
    "q_txlog_merge_clauses_cdf" -> clauseMergeCdfQueryOracle,
    "q_txlog_merge_clauses_cdf_cow" -> clauseMergeCdfQueryOracle,
    "q_txlog_merge_clauses_src" -> clauseSrcMergeQueryOracle,
    "q_txlog_merge_clauses_src_dv" -> clauseSrcMergeQueryOracle,
    "q_txlog_merge_clauses_src_cdf" -> clauseSrcMergeCdfQueryOracle,
    "q_txlog_merge_clauses_src_cdf_cow" -> clauseSrcMergeCdfQueryOracle,
    "q_txlog_restore" -> restoreQueryOracle,
    "q_txlog_optimize" -> optimizeQueryOracle,
    "q_txlog_evolution" -> evolutionQueryOracle
  )
}
