package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared token normalization — the SINGLE source of truth for every
  * text operator (Dedup, Curation and their DuckDB oracles). A tweak to
  * the keep-class or the split applied in one consumer but not another
  * would silently desynchronize the curation pipeline's dedup stage
  * from the standalone dedup operators while each individual oracle
  * still passed; one definition makes that impossible.
  */
private[ext] object TextNorm {

  /** Normalized word tokens: lowercase, non-alphanumerics to spaces,
    * whitespace split.
    */
  def toks(c: Column): Column =
    split(trim(regexp_replace(lower(c), "[^a-z0-9 ]", " ")), " +")

  /** The identical derivation in DuckDB SQL (over a `text` column). */
  val toksSql: String =
    "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')"

  /** RAW whitespace token count — the packing/mixing currency (budget
    * math counts what the text actually holds, no normalization).
    * Single source of truth for every consumer (sequencePack,
    * packSegments, mixWeights, lengthHistogram) and their oracles: a
    * tweak applied to one copy but not another would silently
    * desynchronize the packing stack while each oracle still passed.
    */
  def rawCount(c: Column): Column = size(split(trim(c), " +"))

  /** The identical count in DuckDB SQL (over a `text` column). */
  val rawCountSql: String = "len(regexp_split_to_array(trim(text), ' +'))"
}
