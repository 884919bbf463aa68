package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and verified n-gram-Jaccard near-dup detection.
  *
  * Frame contract: every operator takes the documents frame and
  * requires its `doc_id` column even where the computation itself only
  * reads source/text — `doc_id` is the corpus's unique key and the
  * fan-out/repartition key ([[graft.Tables.fanOut]] needs a
  * high-cardinality key; `source` is low-cardinality and would skew).
  *
  * Portability: every hash is derived from `md5(...)` (identical output
  * in Spark and DuckDB), so oracle comparisons are byte-exact. MinHash_i
  * = min over shingles of md5(shingle || '#' || i) — a string-min is a
  * valid uniform min-hash because md5 output is uniformly distributed
  * over hex strings.
  *
  * Scale notes (100 TB):
  *  - exact dedup = hash-groupBy on a 128-bit key: one shuffle of
  *    (key, doc_id) pairs only — never the payload; AQE coalesces.
  *  - MinHash+LSH: signatures are a map-only pass; candidate generation
  *    shuffles (band_key → doc ids), i.e. the classic
  *    shingle→minhash→band→bucket-join, linear in corpus size instead
  *    of O(n²) pairwise. Hot buckets (boilerplate docs) are the skew
  *    risk — cap bucket size before pairing (documented, not needed at
  *    test SF).
  *  - verification (true Jaccard) runs only on LSH candidates.
  *  - SimHash: 16-bit signatures via bit-majority vote, one explode +
  *    groupBy; near-dup lookup is an equality join on the signature
  *    (hamming-0) or banded signature pieces (hamming-k).
  */
object Dedup {

  /** Normalized word tokens shared by all dedup ops (see TextNorm). */
  private def toks(c: Column): Column = TextNorm.toks(c)

  private val toksSql = TextNorm.toksSql

  /** (doc_id, sh): distinct word 3-gram shingles as ONE ARRAY per doc.
    *
    * Shuffle-free: the token array is materialized once per doc behind a
    * Generate barrier (`explode(array(toks))`) — a Generate node is a
    * hard boundary CollapseProject cannot inline through, so the regex
    * token split runs exactly once per document (inlining it into the
    * per-element lambda would re-evaluate the split O(tokens) times —
    * measured 10× slower). Shingling + per-doc dedup then happen inside
    * one narrow map (`transform` over positions + `array_distinct`).
    * The shingle set stays PACKED: signature derivation can then run as
    * a narrow per-row fold (`array_min` over `transform`) with ZERO
    * exchanges, instead of exploding to rows and paying a hash-agg
    * shuffle to regroup them. Safe because a document is bounded-size:
    * the array never exceeds the doc's own token count.
    */
  private def shingleArrays(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
        array_distinct(graft.functions.NGramsOps.ngrams(spark, toks(col("text")), shingleWidth)).as("sh"))
  }

  // shingle width aliased from the native signature expression: the
  // verification shingles MUST match the width the signatures hashed,
  // or Jaccard verify silently diverges from the LSH candidates
  private val shingleWidth: Int = graft.functions.MinHashSigs.shingleWidth

  private val shinglesSql =
    s"""list_distinct(list_transform(range(1, greatest(len($toksSql) - ${shingleWidth - 1}, 1) + 1),
       |                  i -> array_to_string(($toksSql)[i:i+${shingleWidth - 1}], ' ')))""".stripMargin

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group on md5 of normalized text, keep min doc_id.
    * Output: per-source doc/dup accounting (the pipeline's dedup report).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    Tables.fanOut(docs.select(col("doc_id"), col("source"), col("text")), "doc_id")
      .withColumn("key", md5(concat_ws(" ", toks(col("text")))))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("key")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("key"))).as("n_dupes"))

  val exactDedupOracle: String =
    s"""SELECT source, count(*) AS n_docs,
       |       count(DISTINCT key) AS n_distinct,
       |       count(*) - count(DISTINCT key) AS n_dupes
       |FROM (SELECT source, md5(array_to_string($toksSql, ' ')) AS key FROM documents)
       |GROUP BY 1""".stripMargin

  /** Exact dedup, keep-first: survivor = min doc_id per key (the actual
    * dedup operator, not just the report).
    */
  def exactSurvivors(docs: DataFrame): DataFrame =
    Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("key", md5(concat_ws(" ", toks(col("text")))))
      .groupBy(col("key"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  val exactSurvivorsOracle: String =
    s"""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
       |FROM (SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS key FROM documents)
       |GROUP BY key""".stripMargin

  // -------------------------------------------------------------- minhash

  // k minhash functions — aliased from the native expression that
  // actually PRODUCES the signature array, so the unpack width, the
  // banding math, and the oracle SQL can never drift from it
  val numHashes: Int = graft.functions.MinHashSigs.numHashes
  val bandRows = 2   // r rows per band → b = k/r = 4 bands

  /** Hot-bucket cap: max docs admitted per (band, bucket) into candidate
    * pairing. Boilerplate-heavy corpora (license headers, templated
    * pages) put millions of docs into one LSH bucket, whose pair count
    * grows quadratically — the classic skew failure of banded LSH at
    * scale. Capping membership (deterministically: the `cap` lowest
    * doc_ids survive) bounds any bucket's contribution to C(cap, 2)
    * pairs. 256 is far above every bucket at test SF, so capped and
    * uncapped results coincide there (the oracle stays the uncapped
    * SQL); at 100 TB the knob is load-bearing.
    */
  val hotBucketCap = 256

  /** MinHash signature per doc: sig_i = min md5(shingle || '#' || i).
    *
    * Shape: the native `graft_minhash8` expression
    * (graft.functions.MinHashSigs) builds the distinct 3-gram shingles
    * and all k min-hashes in ONE tight JVM pass per row — zero
    * exchanges, whole-stage codegen, and no corpus-wide shingle-array
    * materialization. The previous formulation ran k interpreted
    * `array_min(transform(...))` lambdas per document (one md5 lambda
    * dispatch per shingle per hash) — the same interpreted-HOF hotspot
    * the SimHash expression eliminated.
    */
  def minhashSignatures(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val keep = col("doc_id") +: carry.map(col)
    Tables.fanOut(docs.select(keep :+ col("text"): _*), "doc_id")
      .select(keep :+
      graft.functions.SimHashOps.minhash8(
        docs.sparkSession, toks(col("text"))).as("sigs"): _*)
      .select(keep ++
        (0 until numHashes).map(i => element_at(col("sigs"), i + 1).as(s"sig_$i")): _*)
  }

  /** (band, bucket, doc_id[, carry…]) rows from a signature frame — one
    * explode, not one plan copy per band. The SINGLE Scala home of the
    * banding math (bucket = md5 of the band's sig columns); the SQL
    * twin is `bandsCteSql`.
    */
  private def bandBuckets(sig: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val bandStructs = (0 until numHashes / bandRows).map { j =>
      val parts = (0 until bandRows).map(r => col(s"sig_${j * bandRows + r}"))
      struct(lit(j).as("band"), md5(concat(parts: _*)).as("bucket"))
    }
    sig.select((col("doc_id") +: carry.map(col)) :+
        explode(array(bandStructs: _*)).as("bb"): _*)
      .select(Seq(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("doc_id")) ++ carry.map(col): _*)
  }

  val minhashSignaturesOracle: String = {
    val sigs = (0 until numHashes).map { i =>
      s"list_min(list_transform(sh, s -> md5(s || '#$i'))) AS sig_$i"
    }.mkString(",\n       |       ")
    s"""SELECT doc_id,
       |       $sigs
       |FROM (SELECT doc_id, $shinglesSql AS sh FROM documents)""".stripMargin
  }

  /** Public (band, bucket, doc_id) derivation straight from a documents
    * frame — stateless (native signature expression + one explode), so
    * it plans identically over a batch OR a streaming source; the
    * streaming near-dup operator (graft.streaming.Streams) keys its
    * state on these rows.
    */
  def bandedDocs(docs: DataFrame): DataFrame = bandedDocsWith(docs, Nil)

  /** `bandedDocs` variant carrying extra columns (e.g. the event-time
    * column a horizon-bounded streaming state needs) through the
    * banding — same native signature pass and single explode, delegated
    * to the one `bandBuckets` implementation.
    */
  def bandedDocsWith(docs: DataFrame, carry: Seq[String]): DataFrame =
    bandBuckets(minhashSignatures(docs, carry), carry)

  /** Oracle twin of `bandedDocs` as a reusable CTE body: interpolate as
    * `WITH $bandsCteSql, ...` to get `sigs` and `bands(band, bucket,
    * doc_id)` in scope, guaranteed to track the Spark banding math.
    */
  def bandsCteSql: String = {
    val bandSelects = (0 until numHashes / bandRows).map { j =>
      val parts = (0 until bandRows).map(r => s"sig_${j * bandRows + r}").mkString(" || ")
      s"SELECT $j AS band, md5($parts) AS bucket, doc_id FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""sigs AS (${minhashSignaturesOracle}),
       |bands AS (
       |  $bandSelects
       |)""".stripMargin
  }

  /** LSH bands: band_j = md5(sig_{j·r} || … || sig_{j·r+r−1}); docs
    * sharing any band key are near-dup candidates. Output: per-band
    * bucket statistics (buckets, max size, candidate pairs), plus the
    * hot-bucket cap in force and how many buckets exceed it (0 at test
    * SF — the skew report an operator reads before a 100 TB run).
    */
  def lshBucketStats(docs: DataFrame): DataFrame =
    bandBuckets(minhashSignatures(docs)).groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_bucket"),
        sum(col("sz") * (col("sz") - 1) / 2).cast("bigint").as("n_candidate_pairs"),
        lit(hotBucketCap).as("cap"),
        sum(when(col("sz") > hotBucketCap, 1).otherwise(0)).cast("bigint").as("n_hot_buckets"))

  val lshBucketStatsOracle: String = {
    s"""WITH $bandsCteSql
       |SELECT band, count(*) AS n_buckets, max(sz) AS max_bucket,
       |       CAST(sum(sz * (sz - 1) / 2) AS BIGINT) AS n_candidate_pairs,
       |       $hotBucketCap AS cap,
       |       CAST(sum(CASE WHEN sz > $hotBucketCap THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_buckets
       |FROM (SELECT band, bucket, count(*) AS sz FROM bands GROUP BY 1, 2)
       |GROUP BY 1""".stripMargin
  }

  /** Full near-dup pipeline: LSH candidates → verify true 3-gram
    * Jaccard ≥ threshold. Returns confirmed pairs (a < b). Bucket
    * membership is capped at `cap` docs (lowest doc_ids survive) so a
    * boilerplate bucket contributes at most C(cap, 2) candidate pairs
    * instead of exploding quadratically. The oracle applies the
    * IDENTICAL row_number-per-bucket cap, so capped Spark results stay
    * hash-exact against it even when a corpus actually trips the cap
    * (inert at test SF, load-bearing at corpus scale).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5,
      cap: Int = hotBucketCap): DataFrame = {
    // Signatures come straight from the native expression — a single
    // narrow corpus pass with NOTHING cached corpus-wide (round-2's
    // packed-shingle cache is gone: at 100 TB an in-memory corpus-sized
    // intermediate was the weakest assumption in this pipeline).
    // (bucket, doc_id) is already unique: one row per band per doc, and
    // band buckets from different bands hash different sig columns — no
    // distinct needed (an md5 cross-band collision would only add a
    // candidate pair, which verification filters anyway). The hot-bucket
    // cap ranks within the bucket key ALONE — the same hash partitioning
    // the bucket self-join needs, so the window rides the join's
    // exchange instead of adding one (md5 collisions across bands are
    // negligible, and a collision could only tighten the cap).
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    // cached: the bucket self-join reads this frame on BOTH sides — the
    // band table is (bucket, doc_id) per band per doc, bytes per row,
    // and without the cache the native signature pass + cap window
    // would run twice
    val bands = bandBuckets(minhashSignatures(docs))
      .withColumn("bpos", row_number().over(wBucket))
      .filter(col("bpos") <= cap)
      .select(col("bucket"), col("doc_id"))
      .cache()
    val cand = bands.as("x").join(bands.as("y"), col("x.bucket") === col("y.bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct().cache() // candidate-pair-sized; read by candDocs + the pair join
    // True Jaccard on LSH candidates only: restrict the shingle arrays
    // to docs that appear in some candidate pair (semi-join — at 100 TB
    // that is the entire point: the verify step touches a vanishing
    // fraction of the corpus) and verify pairs with array_intersect.
    // The semi-joined side is candidate-sized, so AQE plans both
    // pair-joins as broadcasts; nothing quadratic and no full-corpus
    // shuffle ever runs.
    // no distinct: a left-semi probe side needs no dedup, the join
    // itself is set-semantic (saves a full shuffle of the id stream)
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
    // packed shingle arrays are built ONLY for candidate docs — the
    // semi-join runs before the Generate, so the expensive shingling
    // touches a vanishing fraction of the corpus
    val shArr = shingleArrays(docs.join(candDocs, Seq("doc_id"), "left_semi"))
      .cache() // candidate-doc-sized; feeds both sides of the pair join
    cand
      .join(shArr.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shArr.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(
        col("n_inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def nearDupPairsOracle(threshold: Double = 0.5, cap: Int = hotBucketCap): String = {
    s"""WITH $bandsCteSql,
       |capped AS (
       |  SELECT bucket, doc_id FROM (
       |    SELECT bucket, doc_id,
       |           row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS bpos
       |    FROM bands)
       |  WHERE bpos <= $cap
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM capped x JOIN capped y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
       |),
       |sh AS (SELECT doc_id, $shinglesSql AS sh FROM documents)
       |SELECT doc_a, doc_b,
       |       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
       |             len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
       |FROM cand JOIN sh a ON cand.doc_a = a.doc_id
       |          JOIN sh b ON cand.doc_b = b.doc_id
       |WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
       |            len(list_distinct(list_concat(a.sh, b.sh))), 6) >= $threshold""".stripMargin
  }

  // ---------------------------------------------------- incremental dedup

  /** INCREMENTAL cross-corpus dedup — the production crawl loop: a new
    * batch of documents is admitted against an already-indexed corpus
    * (is this new doc a near-dup of anything we already hold?), which
    * is a different operator from within-corpus dedup: candidate pairs
    * are generated ONLY across the index↔batch boundary (no index
    * self-pairs — the index was deduped when it was ingested; no
    * batch self-pairs — that is a separate within-batch pass), and the
    * output is an admission decision per new doc, not a pair list.
    *
    * Shape: one native signature pass over each side, the same banded
    * LSH bucket join as `nearDupPairs` restricted to cross-side pairs,
    * true-Jaccard verification on candidate docs only, then the best
    * match per new doc (highest verified Jaccard, lowest index doc_id
    * on ties — both engines rank the identical rounded value). A new
    * doc with no verified match above `threshold` is admitted.
    *
    * Scale: in production the index side's (bucket, doc_id) band table
    * is precomputed and PERSISTED (write-once at ingest — exactly the
    * frame this operator derives); a day's crawl batch is orders of
    * magnitude smaller than the accumulated index, so the bucket join
    * is a shuffle of band keys where the batch side is tiny and the
    * index side is partition-pruned by the bucket hash. The hot-bucket
    * cap bounds boilerplate buckets on both sides (identically in the
    * oracle, so capped results stay hash-exact).
    */
  def incrementalDedup(index: DataFrame, batch: DataFrame,
      threshold: Double = 0.5, cap: Int = hotBucketCap): DataFrame =
    incrementalDedupFromBands(indexBandTable(index), index, batch, threshold, cap)

  /** The index side's (bucket, doc_id) band table — the WRITE-ONCE
    * frame a production admission service persists at ingest and reads
    * on every batch (and every micro-batch: the streaming admission
    * runner computes this once and reuses it across triggers).
    */
  def indexBandTable(index: DataFrame): DataFrame =
    bandBuckets(minhashSignatures(index)).select(col("bucket"), col("doc_id"))

  /** `incrementalDedup` against an already-materialized index band
    * table — the signature pass over the index never re-runs.
    */
  def incrementalDedupFromBands(idxBands: DataFrame, index: DataFrame,
      batch: DataFrame, threshold: Double = 0.5, cap: Int = hotBucketCap): DataFrame = {
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    // banded sides, capped within the SAME window shape as
    // nearDupPairs (the cap ranks by doc_id over the union of sides —
    // computed on the concatenation so both engines see one ranking)
    val bands = idxBands.select(col("bucket"), col("doc_id"))
      .withColumn("side", lit("idx"))
      .union(bandBuckets(minhashSignatures(batch))
        .select(col("bucket"), col("doc_id")).withColumn("side", lit("new")))
      .withColumn("bpos", row_number().over(wBucket))
      .filter(col("bpos") <= cap)
      .select(col("bucket"), col("doc_id"), col("side"))
      .localCheckpoint() // both join sides read this; unlike cache(),
                         // the ContextCleaner reclaims it once the
                         // returned frame is unreachable (no per-call
                         // storage-memory leak across invocations)
    val cand = bands.filter(col("side") === "idx").as("x")
      .join(bands.filter(col("side") === "new").as("y"), col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("idx_id"), col("y.doc_id").as("new_id"))
      .distinct().localCheckpoint()
    // shingle arrays only for docs in some cross-side candidate pair
    val shIdx = shingleArrays(
      index.join(cand.select(col("idx_id").as("doc_id")), Seq("doc_id"), "left_semi"))
    val shNew = shingleArrays(
      batch.join(cand.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_semi"))
    admitAgainst(cand, shIdx, shNew, batch, threshold)
  }

  /** Shared admission tail: verify candidate pairs by true Jaccard,
    * pick each new doc's best match (rounded-Jaccard rank, index-id
    * tie-break), left-join back so every batch doc gets a decision.
    */
  private def admitAgainst(cand: DataFrame, shIdx: DataFrame, shNew: DataFrame,
      batch: DataFrame, threshold: Double): DataFrame = {
    val scored = cand
      .join(shIdx.select(col("doc_id").as("idx_id"), col("sh").as("sh_a")), "idx_id")
      .join(shNew.select(col("doc_id").as("new_id"), col("sh").as("sh_b")), "new_id")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(
        col("n_inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("new_id")).orderBy(col("jaccard").desc, col("idx_id"))
    val best = scored
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("new_id"), col("idx_id"), col("jaccard"))
    batch.select(col("doc_id"))
      .join(best.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("idx_id"), lit(-1L)).as("match_id"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"),
        when(col("idx_id").isNull, 1L).otherwise(0L).as("admitted"))
  }

  /** The index side's shingle-array table (doc_id, sh) — the second
    * write-once index artifact (verification needs the indexed docs'
    * shingles; a production service stores them next to the band
    * table instead of re-deriving them from raw text per batch).
    */
  def indexShingleTable(index: DataFrame): DataFrame = shingleArrays(index)

  /** Admission against FULLY-PREPARED index artifacts — the steady-state
    * loop a streaming admission service runs per micro-batch: the index
    * band table arrives pre-capped per bucket and the index shingle
    * table pre-materialized, so per-batch work is only the batch's own
    * signature pass, the bucket join, and candidate verification — a
    * deliberately SHALLOW plan (no union-wide cap window, no semi-join
    * back into the index corpus, no per-call caches to leak across
    * triggers). Capping per side instead of over the union diverges
    * from the batch operator only when a bucket actually trips the cap
    * (never at test SF — the oracle comparison stays hash-exact; at
    * corpus scale order-dependence under the cap is inherent to
    * incremental admission).
    */
  def incrementalDedupPrepared(idxBands: DataFrame, idxShingles: DataFrame,
      batch: DataFrame, threshold: Double = 0.5, cap: Int = hotBucketCap): DataFrame = {
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    val bBands = bandBuckets(minhashSignatures(batch))
      .select(col("bucket"), col("doc_id"))
      .withColumn("bpos", row_number().over(wBucket))
      .filter(col("bpos") <= cap)
      .select(col("bucket"), col("doc_id"))
    val cand = idxBands.as("x").join(bBands.as("y"), col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("idx_id"), col("y.doc_id").as("new_id"))
      .distinct()
    // the batch is micro-batch-sized: shingling it whole is cheaper
    // than a semi-join restriction (and keeps the per-trigger DAG flat)
    admitAgainst(cand, idxShingles, shingleArrays(batch), batch, threshold)
  }

  /** Deterministic index/batch split of the `documents` table for the
    * oracle-checked query: doc_id % 5 == 4 is "today's crawl batch"
    * (20%), the rest is the indexed corpus.
    */
  def incrementalDedupOracle(threshold: Double = 0.5, cap: Int = hotBucketCap): String =
    s"""WITH $bandsCteSql,
       |sided AS (
       |  SELECT bucket, doc_id,
       |         CASE WHEN doc_id % 5 = 4 THEN 'new' ELSE 'idx' END AS side
       |  FROM bands
       |),
       |capped AS (
       |  SELECT bucket, doc_id, side FROM (
       |    SELECT bucket, doc_id, side,
       |           row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS bpos
       |    FROM sided)
       |  WHERE bpos <= $cap
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS idx_id, y.doc_id AS new_id
       |  FROM capped x JOIN capped y ON x.bucket = y.bucket
       |  WHERE x.side = 'idx' AND y.side = 'new'
       |),
       |sh AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
       |scored AS (
       |  SELECT new_id, idx_id,
       |         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
       |               len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
       |  FROM cand JOIN sh a ON cand.idx_id = a.doc_id
       |            JOIN sh b ON cand.new_id = b.doc_id
       |  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
       |              len(list_distinct(list_concat(a.sh, b.sh))), 6) >= $threshold
       |),
       |best AS (
       |  SELECT new_id, idx_id, jaccard FROM (
       |    SELECT new_id, idx_id, jaccard,
       |           row_number() OVER (PARTITION BY new_id
       |                              ORDER BY jaccard DESC, idx_id) AS rn
       |    FROM scored)
       |  WHERE rn = 1
       |)
       |SELECT d.doc_id,
       |       coalesce(b.idx_id, -1) AS match_id,
       |       coalesce(b.jaccard, 0.0) AS jaccard,
       |       CAST(CASE WHEN b.idx_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS admitted
       |FROM documents d LEFT JOIN best b ON d.doc_id = b.new_id
       |WHERE d.doc_id % 5 = 4""".stripMargin

  // ----------------------------------------------------- substring level

  /** Cross-document repeated-k-gram accounting — the SUBSTRING-level
    * dedup primitive (how much of this doc's text appears elsewhere in
    * the corpus): per doc, the distinct token 5-gram count, how many of
    * those 5-grams occur in at least one OTHER doc, and the repeated
    * fraction a substring-dedup filter thresholds on. Doc-level
    * near-dup misses boilerplate spans embedded in otherwise-unique
    * documents; this is the metric that catches them.
    *
    * Scale: repeated = total − unique. The per-doc total is the SIZE of
    * the distinct-gram array (map-only, no shuffle); a gram is unique
    * iff its corpus count is 1, in which case min(doc_id) IS its owner
    * — so one gram-keyed agg (count + min, partial aggregation
    * collapses even a boilerplate mega-gram map-side) and one tiny
    * rollup of the singleton grams give per-doc unique counts, joined
    * back on the UNIQUE doc key. Every aggregate is map-side-combined
    * and the only join is doc-keyed — no window over the gram key
    * (that would put every row of a hot gram into a single task, the
    * one shape that cannot absorb boilerplate skew) and no gram-keyed
    * join probe. Nothing quadratic, nothing materialized corpus-wide.
    */
  def repeatedKgrams(docs: DataFrame, k: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    val base = Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
      array_distinct(
        graft.functions.NGramsOps.ngrams(spark, toks(col("text")), k)).as("garr"))
    val perDoc = base.select(col("doc_id"), size(col("garr")).cast("bigint").as("n_kgrams"))
    val uniques = base.select(col("doc_id"), explode(col("garr")).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("owner"))
      .filter(col("n_docs") === 1)
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    perDoc.join(uniques, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_kgrams"),
        (col("n_kgrams") - coalesce(col("n_unique"), lit(0L))).as("n_repeated"))
      .withColumn("repeated_frac",
        round(col("n_repeated").cast("double") / col("n_kgrams"), 6))
  }

  def repeatedKgramsOracle(k: Int = 5): String =
    s"""WITH grams AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(t) - ${k - 1}, 1) + 1),
       |    i -> array_to_string(t[i:i+${k - 1}], ' ')))) AS g
       |  FROM (SELECT doc_id, $toksSql AS t FROM documents)
       |),
       |counts AS (SELECT g, count(*) AS n_docs FROM grams GROUP BY 1)
       |SELECT doc_id, count(*) AS n_kgrams,
       |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       |       round(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS repeated_frac
       |FROM grams JOIN counts USING (g)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- clusters

  /** Duplicate-CLUSTER formation: connected components over the verified
    * near-dup pair graph — the step after pair generation in a real
    * dedup pipeline (pairs alone can't pick survivors when A≈B≈C but
    * A!≈C; the component's min doc_id becomes the canonical doc).
    *
    * Algorithm: iterative min-label propagation to a fixpoint — the
    * standard Spark shape for connected components (what GraphX/
    * GraphFrames run underneath). Each iteration is one equi-join + one
    * min-agg over EDGE-sized data (candidate pairs, a vanishing
    * fraction of the corpus — the corpus-sized work already happened in
    * `nearDupPairs`), with `localCheckpoint` truncating lineage so the
    * plan doesn't grow with iterations. The fixpoint (min reachable
    * doc_id per vertex) is unique, so the result is deterministic and
    * the DuckDB oracle reproduces it with a recursive CTE. Each round
    * pairs the min-propagation with a pointer-jumping compression
    * (l(v) := l(l(v))), giving O(log n) rounds instead of O(component
    * diameter) — the guarantee that matters for deep boilerplate
    * chains at corpus scale; a round cap of 64 therefore covers any
    * physically possible component and tripping it throws rather than
    * returning silently-partial labels. At the combined fixpoint,
    * labels are constant along every edge (propagation fixed at both
    * endpoints forces l(u) = l(v)), and the constant can only be the
    * component min.
    */
  def dupClusters(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    dupClustersFromPairs(nearDupPairs(docs, threshold))

  /** Cluster formation over an already-materialized pair set — the
    * production shape: pairs are computed once, written out, and read
    * by both the verification report and the clustering step (the
    * per-corpus memo below is the single-node analog of that reuse).
    */
  def dupClustersFromPairs(pairSet: DataFrame,
      driverMaxEdges: Long = Dedup.defaultDriverMaxEdges): DataFrame = {
    val spark = pairSet.sparkSession
    // normalize ids up front so BOTH paths emit the same (bigint,
    // bigint) schema regardless of which the size guard picks
    val pairs = pairSet.select(col("doc_a").cast("long").as("doc_a"),
      col("doc_b").cast("long").as("doc_b"))
    val edges = pairs.select(col("doc_a").as("s"), col("doc_b").as("d"))
      .union(pairs.select(col("doc_b").as("s"), col("doc_a").as("d")))
      .localCheckpoint()
    // ADAPTIVE path choice, the same judgement Spark itself applies to
    // broadcast-vs-shuffle joins: the verified pair graph is usually
    // orders of magnitude smaller than the corpus (KBs–MBs), and the
    // iterative loop below pays several job schedules + plan passes
    // PER ROUND — ~3.5 s for a thousand-vertex graph that a
    // path-compressed union-find solves in microseconds. Below the
    // size guard, solve it where it fits; past it, run the
    // distributed O(log n) loop, which remains the scale path and
    // keeps its own tests (forced via driverMaxEdges = 0; the strict
    // `<` keeps the empty graph on the distributed path when forced).
    val nEdges = edges.count()
    if (nEdges / 2 < driverMaxEdges) {
      // read from the CHECKPOINT (edges is materialized for the count
      // above) — collecting the raw pair plan would re-run the whole
      // upstream pair-generation pipeline a second time; <= keeps
      // self-loops (they register a vertex even without a neighbor)
      val es = edges.filter(col("s") <= col("d")).collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union roots onto the SMALLER id: every union preserves
        // "root = min of its component so far", so the fixpoint root
        // is the component min — identical to the distributed loop
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val rows = parent.keysIterator.toArray.sorted.map(v => (v, find(v))).toSeq
      val sp = spark
      import sp.implicits._
      return spark.createDataset(spark.sparkContext.parallelize(rows,
          math.max(1, math.min(spark.conf.get("spark.sql.shuffle.partitions").toInt,
            (rows.size / 500000) + 1))))
        .toDF("doc_id", "cluster_id")
    }
    {
    // init one propagation step ahead: l(v) = min(v, min neighbor) is a
    // single groupBy over the edge list (the vertex-distinct was a
    // shuffle anyway) — for star/pair components, the common shape of a
    // near-dup graph, this IS the fixpoint, so the loop's first round
    // only confirms instead of computing
    var labels = edges.groupBy(col("s")).agg(min(col("d")).as("mn"))
      .select(col("s").as("v"), least(col("s"), col("mn")).as("l"))
      .localCheckpoint()
    // convergence probe: propagation only ever LOWERS labels, so the
    // fixpoint is reached exactly when sum(l) stops decreasing — one
    // cheap aggregate per round instead of an old-vs-new join. Decimal
    // sum: overflow-proof for arbitrary id ranges (ANSI mode makes a
    // long-sum overflow an error, not a wrap).
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("l").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    val maxIters = 64
    while (!converged && iter < maxIters) {
      // propagate: l(v) := min(l(v), min over neighbors' labels)
      val nbrMin = edges.join(labels.select(col("v").as("d"), col("l").as("nl")), "d")
        .groupBy(col("s")).agg(min(col("nl")).as("nbr_min"))
        .withColumnRenamed("s", "v")
      val stepped = labels.join(nbrMin, Seq("v"), "left")
        .select(col("v"), least(col("l"), coalesce(col("nbr_min"), col("l"))).as("l"))
        .localCheckpoint() // materialized: the compress step reads it TWICE
      // compress (pointer jumping): l(v) := l(l(v)). Every label is
      // itself a vertex id (labels start at v and only ever move to
      // another existing label), so the inner self-join is total. This
      // doubles the distance a label travels per round — O(log n)
      // rounds instead of O(component diameter), so a deep boilerplate
      // CHAIN (diameter ~n at corpus scale) converges instead of
      // crawling one hop per round.
      val ptr = stepped.select(col("v").as("pv"), col("l").as("pl"))
      labels = stepped.join(ptr, stepped("l") === ptr("pv"))
        .select(stepped("v").as("v"), col("pl").as("l"))
        .localCheckpoint()
      val curSum = labelSum(labels)
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      iter += 1
    }
    // un-converged labels are SILENTLY wrong (they desync from the
    // transitive-closure oracle with no signal) — fail loudly instead
    // of returning partial components. With pointer jumping the cap
    // bounds components of size ~2^64: reaching it means a bug, not a
    // big corpus.
    if (!converged) throw new IllegalStateException(
      s"dupClustersFromPairs: min-label propagation not at fixpoint after $maxIters " +
        "iterations; refusing to return partial cluster labels")
    labels.select(col("v").as("doc_id"), col("l").as("cluster_id"))
    }
  }

  /** Driver fast-path guard: ~1M verified pairs (the union-find map is
    * boxed, so this stays comfortably inside a default driver heap).
    */
  val defaultDriverMaxEdges: Long = 1L << 20

  def dupClustersOracle(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (
       |  ${nearDupPairsOracle(threshold).replace("\n", "\n       |  ")}
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs
       |), reach(v, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.v
       |)
       |SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v""".stripMargin

  /** Near-dup SURVIVOR accounting — the end product of the dedup
    * pipeline: within each duplicate cluster exactly one doc (the
    * cluster's min doc_id, which is its label) survives; docs in no
    * cluster survive trivially. Output: per-source kept/dropped counts.
    *
    * Scale shape: the cluster-label frame is pair-graph-sized (only
    * docs that appeared in a verified near-dup pair carry a label — a
    * vanishing fraction of the corpus), so the left join back to the
    * corpus is a standard equi-join the planner can broadcast when the
    * graph is small and shuffle when it isn't; the corpus side is one
    * narrow projection (doc_id, source). No new corpus-sized shuffle
    * beyond the join itself.
    */
  def clusterSurvivors(docs: DataFrame, pairSet: DataFrame): DataFrame =
    clusterSurvivorsFromClusters(docs, dupClustersFromPairs(pairSet))

  /** Survivor accounting over an already-materialized cluster frame
    * (the production shape — clustering runs once, both the report and
    * the survivor selection read it).
    */
  def clusterSurvivorsFromClusters(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(clusters, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("cluster_id")).as("n_clustered"),
        sum(when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"), 1L)
          .otherwise(0L)).cast("bigint").as("n_dropped"))
      .withColumn("n_kept", col("n_docs") - col("n_dropped"))

  def clusterSurvivorsOracle(threshold: Double = 0.5): String =
    s"""WITH clusters AS (
       |  ${dupClustersOracle(threshold).replace("\n", "\n       |  ")}
       |)
       |SELECT source, n_docs, n_clustered, n_dropped, n_docs - n_dropped AS n_kept
       |FROM (
       |  SELECT source, count(*) AS n_docs,
       |         count(cluster_id) AS n_clustered,
       |         CAST(sum(CASE WHEN cluster_id IS NOT NULL AND cluster_id != doc_id
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |  FROM documents LEFT JOIN clusters USING (doc_id)
       |  GROUP BY 1
       |)""".stripMargin

  // -------------------------------------------------------------- simhash

  val simhashBits = 64

  /** SimHash: 64-bit signature — bit b of the signature is the majority
    * vote of bit b of each distinct token's 64-bit hash (the first 16
    * hex chars of its md5).
    *
    * Shuffle-free AND codegen'd: the whole per-doc computation (one md5
    * per distinct token, 64 majority counters, signature assembly) runs
    * inside the native `graft_simhash64` expression
    * (graft.functions.SimHash64) — a single tight JVM loop per row in
    * the scan task. The previous formulation computed each signature
    * bit as a separate interpreted `aggregate(...)` fold over a hash
    * array (one lambda dispatch per element PER BIT) and was the
    * round-2 bench regression; 64 bits would have made it 4× worse.
    */
  def simhashSignature(docs: DataFrame): DataFrame =
    Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
      graft.functions.SimHashOps.simhash64(
        docs.sparkSession, array_distinct(toks(col("text")))).as("simhash"))

  def simhash(docs: DataFrame): DataFrame =
    simhashSignature(docs)
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"))

  /** SimHash near-dup pairs: hamming distance of the 64-bit signatures
    * ≤ maxDist, via codegen'd `bit_count(xor)`.
    *
    * Banded, not N²/2: the signature is split into maxDist+1 bit pieces
    * and candidates are generated by an EQUALITY join on (piece index,
    * piece value) — pigeonhole guarantees any pair within maxDist agrees
    * on at least one whole piece, so recall is exact. The hamming filter
    * then verifies candidates, and the (doc_a, doc_b) distinct collapses
    * pairs that matched on several pieces. At 100 TB this is the
    * difference between a shuffled equi-join (linear in corpus +
    * candidates) and an unshardable quadratic cross join — and with
    * 64-bit signatures each ~21-bit piece has ≥ 2²¹ possible values, so
    * piece buckets stay selective at 10⁹ docs (the 16-bit version
    * collapsed into ≤ 2⁶ buckets per piece).
    */
  def simhashNearDup(docs: DataFrame, maxDist: Int = 2): DataFrame = {
    val nPieces = maxDist + 1                 // 3 pieces over 64 bits: 22|21|21
    val base = simhashBits / nPieces
    val extra = simhashBits % nPieces         // first `extra` pieces get +1 bit
    val offsets = (0 until nPieces).scanLeft(0)((o, j) => o + base + (if (j < extra) 1 else 0))
    val pieces = (0 until nPieces).map { j =>
      val width = base + (if (j < extra) 1 else 0)
      // arithmetic shift + mask: the mask keeps exactly bits
      // [offset, offset+width), so sign-extension of the top piece is
      // harmless (same arithmetic the DuckDB oracle would use).
      struct(lit(j).as("pc"),
        shiftright(col("simhash"), offsets(j)).bitwiseAND(lit((1L << width) - 1)).as("pv"))
    }
    val sig = simhashSignature(docs)
    // the self-join would otherwise evaluate the signature expression
    // over the corpus twice (once per side); the banded signature table
    // is (doc_id, long, piece) — bytes per doc, the materialized
    // "signature index" a production pipeline stores anyway
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array(pieces: _*)).as("p"))
      .select(col("doc_id"), col("simhash"), col("p.pc").as("pc"), col("p.pv").as("pv"))
      .cache()
    val b = banded.select(col("pc"), col("pv"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    banded.join(b, Seq("pc", "pv"))
      .filter(col("doc_id") < col("doc_b"))
      .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_id").as("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** Shared SQL for the per-doc 64-bit simhash signature (doc_id,
    * simhash). Token hash: h1 = md5 hex chars 1–8 as uint32, h2 = hex
    * chars 9–16; bit b of the token is bit b of h2 for b < 32, bit
    * b−32 of h1 above. Signature bit 63 lands on the BIGINT sign bit —
    * emitted as the literal −2⁶³ (written as −(2⁶³−1)−1 so the parser
    * never sees an out-of-range positive literal).
    */
  private def simhashSigSql: String = {
    val bitSums = (0 until simhashBits).map { b =>
      val bit = if (b < 32) s"((h2 >> $b) & 1)" else s"((h1 >> ${b - 32}) & 1)"
      s"sum(CASE WHEN $bit = 1 THEN 1 ELSE -1 END) AS s_$b"
    }.mkString(",\n       |         ")
    val sig = (0 until simhashBits).map { b =>
      val w = if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
      s"CASE WHEN s_$b > 0 THEN $w ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, $sig AS simhash
       |  FROM (
       |    SELECT doc_id,
       |         $bitSums
       |    FROM (
       |      SELECT doc_id,
       |             ('0x' || substr(md5(t), 1, 8))::BIGINT AS h1,
       |             ('0x' || substr(md5(t), 9, 8))::BIGINT AS h2
       |      FROM (SELECT doc_id, unnest(list_distinct($toksSql)) AS t FROM documents)
       |    )
       |    GROUP BY doc_id
       |  )""".stripMargin
  }

  /** Oracle = the N²/2 hamming join over the same signatures (truth the
    * banded candidate join must reproduce exactly).
    */
  def simhashNearDupOracle(maxDist: Int = 2): String =
    s"""WITH sig AS (${simhashSigSql.replace("\n", "\n       |")})
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist""".stripMargin

  val simhashOracle: String =
    s"""SELECT simhash, count(*) AS n_docs
       |FROM (${simhashSigSql.replace("\n", "\n       |")})
       |GROUP BY 1""".stripMargin

  /** Per-corpus memo of the verified pair set (cached: candidate-pair
    * sized, read by both the pairs query and cluster formation — at
    * 100 TB this is the pairs table written to storage once).
    */
  private val pairsCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def cachedPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.getOrElseUpdate(d, nearDupPairs(Tables.documents(s, d)).cache())

  /** Per-corpus memo of the cluster labels — the production reuse:
    * clustering runs once and both the cluster report and the survivor
    * selection read the materialized labels (the propagation loop
    * already materializes them via localCheckpoint, so the memo holds
    * an RDD-backed frame, not a plan to re-run).
    */
  private val clustersCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def cachedClusters(s: SparkSession, d: String): DataFrame =
    clustersCache.getOrElseUpdate(d, dupClustersFromPairs(cachedPairs(s, d)))

  /** Evict the per-corpus pair/cluster memos (see [[graft.Caches]]). */
  private[graft] def clearCaches(): Unit = {
    pairsCache.values.foreach(_.unpersist(blocking = false))
    pairsCache.clear()
    clustersCache.clear()
  }

  /** Public handle on the per-corpus cluster memo — the admission
    * ledger (Curation) reads the same labels the dedup queries built.
    */
  def clustersFor(s: SparkSession, d: String): DataFrame = cachedClusters(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) => exactDedup(Tables.documents(s, d))),
    "q_dedup_survivors" -> ((s, d) => exactSurvivors(Tables.documents(s, d))),
    "q_dedup_minhash_sig" -> ((s, d) => minhashSignatures(Tables.documents(s, d))),
    "q_dedup_lsh_stats" -> ((s, d) => lshBucketStats(Tables.documents(s, d))),
    "q_dedup_near_pairs" -> ((s, d) => cachedPairs(s, d)),
    "q_dedup_clusters" -> ((s, d) => cachedClusters(s, d)),
    "q_cluster_survivors" -> ((s, d) =>
      clusterSurvivorsFromClusters(Tables.documents(s, d), cachedClusters(s, d))),
    "q_dedup_simhash" -> ((s, d) => simhash(Tables.documents(s, d))),
    "q_simhash_neardup" -> ((s, d) => simhashNearDup(Tables.documents(s, d))),
    "q_substring_dedup" -> ((s, d) => repeatedKgrams(Tables.documents(s, d))),
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      incrementalDedup(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 4),
        docs.filter(pmod(col("doc_id"), lit(5)) === 4))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dedup_exact" -> exactDedupOracle,
    "q_dedup_survivors" -> exactSurvivorsOracle,
    "q_dedup_minhash_sig" -> minhashSignaturesOracle,
    "q_dedup_lsh_stats" -> lshBucketStatsOracle,
    "q_dedup_near_pairs" -> nearDupPairsOracle(),
    "q_dedup_clusters" -> dupClustersOracle(),
    "q_cluster_survivors" -> clusterSurvivorsOracle(),
    "q_dedup_simhash" -> simhashOracle,
    "q_simhash_neardup" -> simhashNearDupOracle(),
    "q_substring_dedup" -> repeatedKgramsOracle(),
    "q_dedup_incremental" -> incrementalDedupOracle()
  )
}
