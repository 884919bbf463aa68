package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Stock Delta's batch-CDF SCHEMA CONTRACT, shared by the typed feeds
  * ([[TxLog.changeFeed]], [[DeltaLog.tableChanges]] — the DSv2 batch
  * has its metadata-driven twin in `TxLogScan.checkCdfRangeSchemas`):
  * every row presents under the END version's schema; additive ranges
  * null-fill older frames' missing columns; a frame carrying a column
  * the end schema lost (DROP/RENAME) or re-typed refuses loudly.
  * Frames carry their files' REAL footer columns, so the check rides
  * the rows actually presented.
  *
  * `exclude` names FILE-LEVEL hidden columns that are legitimately in
  * footers but never in any table schema — the materialized row-id
  * column a row-tracked OPTIMIZE/rewrite bakes into replacement files.
  * Without the exclusion a row-tracked table's feed would refuse a
  * range spanning NO schema change at all.
  */
private[sources] object CdfAlign {

  def align(dir: String, label: String, fromV: Long, toV: Long,
      endSchema: StructType, exclude: Set[String],
      frames: Seq[DataFrame]): Seq[DataFrame] = {
    val pseudo = Set("_change_type", "_commit_version")
    frames.map { raw =>
      val df = exclude.foldLeft(raw)(_.drop(_))
      df.schema.fields.filterNot(f => pseudo(f.name)).foreach { f =>
        endSchema.fields.find(_.name == f.name) match {
          case Some(p) if p.dataType == f.dataType => ()
          case Some(p) => sys.error(s"$dir: $label ($fromV, $toV] " +
            s"spans a schema change — column '${f.name}' was " +
            s"${f.dataType.simpleString} in an older version but is " +
            s"${p.dataType.simpleString} at version $toV; stock Delta " +
            "refuses read-incompatible CDF ranges — narrow the range " +
            "or read the snapshots")
          case None => sys.error(s"$dir: $label ($fromV, $toV] spans " +
            s"a DROP/RENAME — column '${f.name}' exists in an older " +
            s"version's rows but not in version $toV's schema; stock " +
            "Delta refuses read-incompatible CDF ranges — narrow the " +
            "range or read the snapshots")
        }
      }
      df.select(endSchema.fields.map(f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)).toSeq ++
        Seq(col("_change_type"), col("_commit_version")): _*)
    }
  }
}
