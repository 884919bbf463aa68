package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and tokenization: benchmark decontamination (n-gram overlap
  * against an eval set), within-document repetition filtering (the
  * Gopher rule family), and deterministic stratified sampling (data
  * mixing weights). Not in the reference (its only text op is JSON
  * parse) — north-star extension surface like TextOps/Dedup.
  *
  * All determinism comes from md5 arithmetic shared with the DuckDB
  * oracles; every rate is rounded 6dp on both engines.
  */
object Curation {

  /** Normalized word tokens (same normalization as Dedup — one source
    * of truth, see TextNorm).
    */
  private def toks(c: Column): Column = TextNorm.toks(c)

  private val toksSql = TextNorm.toksSql

  /** Word n-grams as one packed array per doc. Tokenize + gram-build
    * run in the native `graft_ngrams` expression — one JVM pass per
    * document instead of an interpreted lambda dispatch (plus a fresh
    * concat) per gram (the same HOF→native move as `graft_simhash64`).
    */
  private def gramArrays(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    Tables.fanOut(docs.select(col("doc_id"), col("source"), col("text")), "doc_id")
      .select(col("doc_id"), col("source"),
      array_distinct(graft.functions.NGramsOps.ngrams(spark, toks(col("text")), n)).as("grams"))
  }

  private def gramsSql(n: Int): String =
    s"""list_distinct(list_transform(range(1, greatest(len($toksSql) - ${n - 1}, 1) + 1),
       |                  i -> array_to_string(($toksSql)[i:i+${n - 1}], ' ')))""".stripMargin

  // ------------------------------------------------------ decontamination

  /** Modulus electing the stand-in "benchmark/eval" docs (doc_id % 53
    * == 0, ~2% of the corpus — eval sets are tiny next to training
    * corpora, which is what makes the broadcast side small).
    */
  val benchmarkMod = 53

  /** Train/test decontamination: flag training docs sharing any word
    * n-gram with the benchmark set (the standard 8-to-13-gram collision
    * rule; n=5 here so the small test docs actually collide). Output:
    * per-source counts + contamination rate.
    *
    * Scale shape: the benchmark side is eval-set-sized → its distinct
    * grams BROADCAST; the corpus side is one Generate pass over packed
    * gram arrays + a broadcast semi-join — no corpus shuffle at all
    * until the final per-source count agg.
    */
  /** Training docs sharing any word n-gram with the benchmark set —
    * THE contamination rule, in one place: `decontaminate` reports its
    * rates, the admission ledger consumes the hit list. One Generate
    * pass over packed gram arrays; the eval side's distinct grams
    * BROADCAST (eval sets are tiny), so no corpus shuffle.
    */
  private def contaminatedDocIds(docs: DataFrame, n: Int): DataFrame = {
    val grams = gramArrays(docs, n)
    val bench = grams.filter(pmod(col("doc_id"), lit(benchmarkMod)) === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    grams.filter(pmod(col("doc_id"), lit(benchmarkMod)) =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(bench), "gram")
      .select(col("doc_id")).distinct()
  }

  /** Oracle twin of `contaminatedDocIds` as reusable CTEs: brings
    * `g(doc_id, source, grams)` and `contam(doc_id)` into scope.
    */
  private def contamCteSql(n: Int): String =
    s"""g AS (
       |  SELECT doc_id, source, ${gramsSql(n).replace("\n", "\n       |")} AS grams
       |  FROM documents
       |), bench AS (
       |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $benchmarkMod = 0
       |), contam AS (
       |  SELECT DISTINCT t.doc_id
       |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g
       |        WHERE doc_id % $benchmarkMod != 0) t
       |  JOIN bench USING (gram)
       |)""".stripMargin

  def decontaminate(docs: DataFrame, n: Int = 5): DataFrame = {
    docs.filter(pmod(col("doc_id"), lit(benchmarkMod)) =!= 0)
      .select(col("doc_id"), col("source"))
      .join(contaminatedDocIds(docs, n).withColumn("hit", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_contaminated"))
      .withColumn("contamination_rate",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6))
  }

  def decontaminateOracle(n: Int = 5): String =
    s"""WITH ${contamCteSql(n).replace("\n", "\n       |")}
       |SELECT source, count(*) AS n_docs,
       |       CAST(count(contam.doc_id) AS BIGINT) AS n_contaminated,
       |       round(count(contam.doc_id)::DOUBLE / count(*), 6) AS contamination_rate
       |FROM g LEFT JOIN contam USING (doc_id)
       |WHERE g.doc_id % $benchmarkMod != 0
       |GROUP BY 1""".stripMargin

  /** Cross-source overlap matrix: distinct shared word n-grams and the
    * gram-set Jaccard for every source pair — the "which corpus leaks
    * into which" diagnostic read before choosing mixing weights
    * (near-identical sources double-count their mass).
    *
    * Scale shape: ONE corpus-scale pass, all-primitive — each gram's
    * source SET is a fixed-width ARRAY of 64-bit mask words
    * (`bit_or(1L << (idx % 64))` into word `idx ÷ 64`; codegen'd
    * primitive hash aggregates with map-side combine — a collect_set
    * formulation would carry object agg buffers through the exchange
    * and grow with source count), then a mask HISTOGRAM (≤ observed
    * source combos), and the pair expansion runs over that
    * config-scale histogram via broadcast bit-test joins — a gram
    * shared by millions of docs is one histogram row, so there is no
    * hot-gram self-join to blow up (the oracle keeps the N² self-join
    * SQL as truth). The source dictionary is config-scale (one row
    * per corpus source — a few KB even at hundreds of sources, with
    * NO cap: the word array widens as ceil(nSources/64)); it is
    * collected once so the mask width is known while building the
    * plan, and source→idx is then a literal-map projection instead of
    * a broadcast join against the corpus pass. The histogram
    * localCheckpoints for its two consumers (pairs + per-source
    * totals). At sf0.1 the cost is fixed small-query scheduling plus
    * the Generate-heavy gram pass — the corpus term is that single
    * pass.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sources = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val nWords = math.max(1, (sources.length + 63) / 64)
    val idxMap = typedLit(sources.zipWithIndex.toMap)
    val wordCols = (0 until nWords).map(w => expr(
      s"bit_or(IF(idx DIV 64 = $w, shiftleft(CAST(1 AS BIGINT), idx % 64), CAST(0 AS BIGINT)))")
      .as(s"m$w"))
    val maskHist = gramArrays(docs, n)
      .select(element_at(idxMap, col("source")).as("idx"),
        explode(col("grams")).as("gram"))
      .groupBy(col("gram"))
      .agg(wordCols.head, wordCols.tail: _*)
      .select(array((0 until nWords).map(w => col(s"m$w")): _*).as("masks"))
      .groupBy(col("masks")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    def bitSet(masks: Column, idx: Column): Column =
      element_at(masks, floor(idx / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), idx % 64)) =!= 0
    val dict = sources.zipWithIndex.toSeq.toDF("source", "idx")
    val da = dict.select(col("source").as("source_a"), col("idx"))
    val db = dict.select(col("source").as("source_b"), col("idx").as("idx_b"))
    val pairs = maskHist
      .join(broadcast(da), bitSet(col("masks"), col("idx")))
      .join(broadcast(db),
        bitSet(col("masks"), col("idx_b")) && col("idx") < col("idx_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("c")).cast("bigint").as("shared_grams"))
    val totals = maskHist
      .join(broadcast(da), bitSet(col("masks"), col("idx")))
      .groupBy(col("source_a")).agg(sum(col("c")).cast("bigint").as("n_a"))
    pairs
      .join(broadcast(totals), "source_a")
      .join(broadcast(totals.select(col("source_a").as("source_b"), col("n_a").as("n_b"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("shared_grams"),
        col("n_a"), col("n_b"),
        round(col("shared_grams").cast("double") /
          (col("n_a") + col("n_b") - col("shared_grams")), 6).as("jaccard"))
  }

  def sourceOverlapOracle(n: Int = 5): String =
    s"""WITH sg AS (
       |  SELECT DISTINCT source, gram FROM (
       |    SELECT source, unnest(${gramsSql(n).replace("\n", "\n       |")}) AS gram
       |    FROM documents)
       |), per AS (
       |  SELECT source, count(*) AS n FROM sg GROUP BY 1
       |), pr AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_grams
       |  FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT source_a, source_b, shared_grams, pa.n AS n_a, pb.n AS n_b,
       |       round(shared_grams::DOUBLE / (pa.n + pb.n - shared_grams), 6) AS jaccard
       |FROM pr JOIN per pa ON pa.source = pr.source_a
       |        JOIN per pb ON pb.source = pr.source_b""".stripMargin

  // ---------------------------------------------------------- repetition

  /** Within-document repetition (Gopher-style): the fraction of
    * duplicate word 2-grams. Heavily templated/looping text scores
    * high and is dropped before training. Map-only, no shuffle; the
    * grams come from the native `graft_ngrams` pass, materialized once
    * behind a Generate barrier (both `size(grams)` and
    * `size(array_distinct(grams))` consume it — without the barrier
    * CollapseProject would run the tokenizer + gram build twice).
    */
  def repetition(docs: DataFrame, maxDupRatio: Double = 0.2): DataFrame = {
    val spark = docs.sparkSession
    Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"),
      explode(array(graft.functions.NGramsOps.ngrams(spark, toks(col("text")), 2))).as("grams"))
      .select(
        col("doc_id"),
        size(col("grams")).as("n_grams"),
        size(array_distinct(col("grams"))).as("n_distinct"))
      .withColumn("dup_ratio",
        round((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"), 6))
      .withColumn("keep", col("dup_ratio") <= maxDupRatio)
  }

  def repetitionOracle(maxDupRatio: Double = 0.2): String =
    s"""SELECT doc_id, n_grams, n_distinct,
       |       round((n_grams - n_distinct)::DOUBLE / n_grams, 6) AS dup_ratio,
       |       round((n_grams - n_distinct)::DOUBLE / n_grams, 6) <= $maxDupRatio AS keep
       |FROM (
       |  SELECT doc_id, len(grams) AS n_grams, len(list_distinct(grams)) AS n_distinct
       |  FROM (
       |    SELECT doc_id,
       |           list_transform(range(1, greatest(len($toksSql) - 1, 1) + 1),
       |                          i -> array_to_string(($toksSql)[i:i+1], ' ')) AS grams
       |    FROM documents
       |  )
       |)""".stripMargin

  // ------------------------------------------------------------ sampling

  /** Deterministic stratified sampling — the "data mixing" step that
    * up/down-weights sources. Each source gets a target keep-rate
    * derived from md5(source) (10–89%); a doc is kept iff
    * md5(doc_id) mod 100 < rate. Hash-gated sampling is reproducible
    * across runs/engines and cluster-order-independent — `rand()` is
    * neither. Map-only + one small agg.
    */
  def sampleMix(docs: DataFrame): DataFrame = {
    val rate = (pmod(conv(substring(md5(col("source")), 1, 4), 16, 10).cast("long"), lit(80L)) + 10).as("target_rate")
    val kept = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long"), lit(100L)) < col("target_rate")
    docs.select(col("doc_id"), col("source"))
      .withColumn("target_rate", rate)
      .withColumn("kept", kept)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("bigint").as("n_kept"),
        first(col("target_rate")).as("target_rate"))
      .withColumn("actual_rate",
        round(col("n_kept").cast("double") / col("n_docs"), 6))
  }

  val sampleMixOracle: String =
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(first(target_rate) AS BIGINT) AS target_rate,
      |       round(sum(CASE WHEN kept THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS actual_rate
      |FROM (
      |  SELECT source,
      |         (('0x' || substr(md5(source), 1, 4))::BIGINT % 80) + 10 AS target_rate,
      |         (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100)
      |           < (('0x' || substr(md5(source), 1, 4))::BIGINT % 80) + 10 AS kept
      |  FROM documents
      |)
      |GROUP BY 1""".stripMargin

  /** Temperature-scaled mixing weights — the sampling-rate rule
    * (T5/multilingual style) that up-weights small sources: weight_s ∝
    * tokens_s^τ, normalized over sources; effective epochs = how many
    * times a source repeats when the mixture draws `total` tokens. The
    * report a mixing config is generated from.
    *
    * Scale shape: one map-only token-count scan + a sources-sized
    * aggregate; the normalization denominator joins back as a
    * broadcast one-row frame. pow/ratio round once at 6dp (the
    * round-once policy absorbs libm last-ulp drift between engines).
    */
  def mixWeights(docs: DataFrame, tau: Double = 0.7): DataFrame = {
    val perSource = docs
      .select(col("source"), TextNorm.rawCount(col("text")).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).cast("bigint").as("n_tokens"))
      .withColumn("w_raw", pow(col("n_tokens").cast("double"), lit(tau)))
      // sources-sized; checkpointed so its two consumers (totals + the
      // final report) don't each replay the corpus scan
      .localCheckpoint()
    val totals = perSource.agg(
      sum(col("w_raw")).as("w_sum"), sum(col("n_tokens")).cast("double").as("tok_sum"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w_raw") / col("w_sum"), 6).as("weight"),
        round(col("w_raw") / col("w_sum") * col("tok_sum") / col("n_tokens"), 6)
          .as("eff_epochs"))
  }

  def mixWeightsOracle(tau: Double = 0.7): String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(${TextNorm.rawCountSql}) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1
       |), t AS (
       |  SELECT sum(pow(n_tokens::DOUBLE, $tau)) AS w_sum,
       |         CAST(sum(n_tokens) AS DOUBLE) AS tok_sum
       |  FROM per
       |)
       |SELECT source, n_docs, n_tokens,
       |       round(pow(n_tokens::DOUBLE, $tau) / w_sum, 6) AS weight,
       |       round(pow(n_tokens::DOUBLE, $tau) / w_sum * tok_sum / n_tokens, 6) AS eff_epochs
       |FROM per, t""".stripMargin

  // ------------------------------------------------------------- packing

  /** Sequence packing: assign docs to fixed-budget context windows
    * ("packs") by running prefix sums of token counts WITHIN each
    * source shard (contiguous greedy packing — what large-scale
    * tokenizer pipelines actually do). The window partitions by source,
    * so packing parallelizes per shard instead of forcing a global
    * single-partition sort; pack ids are globally unique as
    * (source, pack_no).
    */
  def sequencePack(docs: DataFrame, budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
      TextNorm.rawCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_no", floor((col("cum_tokens") - 1) / budget).cast("bigint"))
      .groupBy(col("source"), col("pack_no"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  def sequencePackOracle(budget: Int = 512): String =
    s"""SELECT source, pack_no, count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                     ROWS UNBOUNDED PRECEDING) - 1) / $budget) AS BIGINT) AS pack_no
       |  FROM (SELECT doc_id, source,
       |               ${TextNorm.rawCountSql} AS n_tokens
       |        FROM documents)
       |)
       |GROUP BY 1, 2""".stripMargin

  /** Pack segment table — the dataloader-facing artifact of sequence
    * packing: for every packed context window, the ordered (segment,
    * doc, token-span) rows a trainer reads for document-boundary
    * attention masks and per-doc loss masking. Pack assignment is the
    * same per-source prefix sum as `sequencePack`; the within-pack
    * offsets are a second window over (source, pack_no) — a
    * SUBSET-keyed window (hash partitioning on `source` already
    * co-locates every pack), so the second stage plans a sort, never
    * another exchange.
    */
  def packSegments(docs: DataFrame, budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeg = Window.partitionBy(col("source"), col("pack_no")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        TextNorm.rawCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
      .withColumn("pack_no", floor((col("cum_tokens") - 1) / budget).cast("bigint"))
      .withColumn("seg_no", row_number().over(wSeg))
      .withColumn("end_tok", sum(col("n_tokens")).over(
        wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("source"), col("pack_no"), col("seg_no"), col("doc_id"),
        col("n_tokens"),
        (col("end_tok") - col("n_tokens")).as("start_tok"), col("end_tok"))
  }

  def packSegmentsOracle(budget: Int = 512): String =
    s"""WITH a AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                     ROWS UNBOUNDED PRECEDING) - 1) / $budget) AS BIGINT) AS pack_no
       |  FROM (SELECT doc_id, source,
       |               ${TextNorm.rawCountSql} AS n_tokens
       |        FROM documents)
       |)
       |SELECT source, pack_no,
       |       row_number() OVER (PARTITION BY source, pack_no ORDER BY doc_id) AS seg_no,
       |       doc_id, n_tokens,
       |       CAST(sum(n_tokens) OVER (PARTITION BY source, pack_no ORDER BY doc_id
       |            ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok,
       |       CAST(sum(n_tokens) OVER (PARTITION BY source, pack_no ORDER BY doc_id
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_tok
       |FROM a""".stripMargin

  // ------------------------------------------------------------ scrubbing

  /** PII-pattern scrub: redact email-shaped and long-digit-run tokens,
    * report per-source hit counts and size deltas — the audit a
    * compliance pass emits. Map-only; both regexes stay in the
    * RE2-compatible subset so Spark (java.util.regex) and DuckDB (RE2)
    * agree.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val digitsRe = "[0-9]{9,}"

  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("text"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(digitsRe)).as("n_digit_runs"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"), digitsRe, "<NUM>"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_emails")).cast("bigint").as("n_emails"),
        sum(col("n_digit_runs")).cast("bigint").as("n_digit_runs"),
        sum(when(col("n_emails") + col("n_digit_runs") > 0, 1).otherwise(0))
          .cast("bigint").as("n_docs_hit"),
        sum(length(col("text")) - length(col("scrubbed"))).cast("bigint").as("chars_removed"))

  val piiScrubOracle: String =
    s"""SELECT source, count(*) AS n_docs,
       |       CAST(sum(n_emails) AS BIGINT) AS n_emails,
       |       CAST(sum(n_digit_runs) AS BIGINT) AS n_digit_runs,
       |       CAST(sum(CASE WHEN n_emails + n_digit_runs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
       |       CAST(sum(length(text) - length(scrubbed)) AS BIGINT) AS chars_removed
       |FROM (
       |  SELECT source, text,
       |         len(regexp_extract_all(text, '$emailRe')) AS n_emails,
       |         len(regexp_extract_all(text, '$digitsRe')) AS n_digit_runs,
       |         regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'), '$digitsRe', '<NUM>', 'g') AS scrubbed
       |  FROM documents
       |)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------ splitting

  /** Deterministic train/val/test split assignment: md5(doc_id) mod 100
    * gates each doc into train (<90) / val (<95) / test (else). The
    * hash gate — not `rand()`, not row position — makes the split
    * reproducible across runs, engines, and cluster orders, and a doc
    * NEVER migrates between splits when the corpus grows (the property
    * that keeps eval sets uncontaminated across dataset versions).
    * Map-only + one small agg; per-source token budgets fall out for
    * free.
    */
  /** The per-doc split gate itself — exposed so tests pin the PRODUCTION
    * assignment (stability under corpus growth), not a reimplementation.
    */
  def splitLabel: Column = {
    val h = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long"), lit(100L))
    when(h < 90, "train").when(h < 95, "val").otherwise("test")
  }

  def splitAssign(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      TextNorm.rawCount(col("text")).as("n_tokens"))
      .withColumn("split", splitLabel)
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"))

  val splitAssignOracle: String =
    s"""SELECT source, split, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT source,
      |         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < 90 THEN 'train'
      |              WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < 95 THEN 'val'
      |              ELSE 'test' END AS split,
      |         ${TextNorm.rawCountSql} AS n_tokens
      |  FROM documents
      |)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- sharding

  /** Global-shuffle shard manifest: every training run shuffles the
    * corpus and cuts it into loader shards. Shard = md5 of the doc id
    * (decorrelates source/ingest order), position = rank of the hash
    * WITHIN the shard — so the "global shuffle" is N independent
    * per-shard sorts that parallelize across the cluster; nothing ever
    * needs a single-partition global orderBy. The output is the
    * per-shard manifest summary with an ORDER-sensitive checksum
    * (sum of pos·doc_id), so the oracle verifies the exact shuffle
    * order, not just membership.
    */
  val numShards = 8

  def shardManifest(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))
    docs.select(col("doc_id"))
      .withColumn("hkey", md5(concat(col("doc_id").cast("string"), lit(":shuffle"))))
      .withColumn("shard", pmod(conv(substring(col("hkey"), 1, 4), 16, 10).cast("long"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        min_by(col("doc_id"), col("hkey")).as("first_doc"),
        max_by(col("doc_id"), col("hkey")).as("last_doc"),
        sum(col("pos") * col("doc_id")).cast("bigint").as("order_checksum"))
  }

  val shardManifestOracle: String =
    s"""SELECT shard, count(*) AS n_docs,
       |       arg_min(doc_id, hkey) AS first_doc,
       |       arg_max(doc_id, hkey) AS last_doc,
       |       CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
       |FROM (
       |  SELECT doc_id, hkey,
       |         ('0x' || substr(hkey, 1, 4))::BIGINT % $numShards AS shard,
       |         row_number() OVER (
       |           PARTITION BY ('0x' || substr(hkey, 1, 4))::BIGINT % $numShards
       |           ORDER BY hkey, doc_id) AS pos
       |  FROM (SELECT doc_id, md5(doc_id::VARCHAR || ':shuffle') AS hkey FROM documents)
       |)
       |GROUP BY 1""".stripMargin

  // -------------------------------------------------- context chunking

  /** Context-window chunk geometry: fixed-size character windows every
    * `chunkStride` chars (50-char overlap keeps sentences that straddle
    * a boundary intact in at least one chunk — the standard RAG/
    * pretraining chunking shape).
    */
  val chunkSize = 200
  val chunkStride = 150

  /** Split every document into overlapping fixed-size chunks with
    * explicit offsets. Output: one row per chunk with its 1-based start,
    * actual length, and content digest (the digest stands in for the
    * chunk text so the result stays scalar-hashable and small).
    *
    * Scale shape: map-only — one `explode(sequence(...))` per doc (a
    * Generate, no exchange anywhere), chunk count bounded by the doc's
    * own length. At 100 TB this parallelizes per input split with zero
    * shuffle; downstream tokenization reads (doc_id, chunk_ix) already
    * co-partitioned with the scan.
    */
  /** Shared chunking core: one (doc_id[, carry…], chunk_ix,
    * chunk_start, chunk) row per window — `chunkDocs` digests it,
    * `chunkPipeline` packs it.
    */
  private def chunkRows(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs.select((col("doc_id") +: carry.map(col)) :+ col("text") :+
        explode(sequence(lit(0L),
          floor((greatest(length(col("text")), lit(1)) - 1) / chunkStride).cast("long")))
          .as("chunk_ix"): _*)
      .withColumn("chunk_start", lit(1L) + col("chunk_ix") * chunkStride)
      .withColumn("chunk", expr(s"substring(text, int(chunk_start), $chunkSize)"))

  def chunkDocs(docs: DataFrame): DataFrame =
    chunkRows(docs)
      .select(col("doc_id"), col("chunk_ix"), col("chunk_start"),
        length(col("chunk")).cast("bigint").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))

  val chunkDocsOracle: String =
    s"""SELECT doc_id, i AS chunk_ix, 1 + i * $chunkStride AS chunk_start,
       |       CAST(length(substr(text, CAST(1 + i * $chunkStride AS INT), $chunkSize)) AS BIGINT) AS chunk_len,
       |       md5(substr(text, CAST(1 + i * $chunkStride AS INT), $chunkSize)) AS chunk_md5
       |FROM documents,
       |     UNNEST(range(0, CAST(floor((greatest(length(text), 1) - 1) / $chunkStride) AS BIGINT) + 1)) AS t(i)""".stripMargin

  /** The tokenization-facing end of the pipeline at CHUNK granularity:
    * quality filter → exact-dedup survivors → context-window chunking →
    * chunk-level sequence packing, composed as ONE Catalyst plan (the
    * doc-granularity twin is `curationPipeline`). Output: per-source
    * chunk/pack/token accounting.
    *
    * Scale shape: everything up to packing is map-only over the kept
    * docs (the chunk Generate adds no exchange); packing reuses the
    * per-source prefix-sum window `sequencePack` documents — shard-
    * parallel, no global sort. The chunk budget (128) is smaller than
    * the doc budget because chunks are the unit a tokenizer actually
    * consumes.
    */
  def chunkPipeline(docs: DataFrame, budget: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // quality's keep flag is ROW-LOCAL, so the standalone operator's
    // `join(quality(docs).filter(keep))` self-join on the corpus key is
    // row-identical to filtering inline — one corpus scan instead of
    // two plus a broadcast join (TextOps.keepExpr pins the equivalence)
    val kept = Tables.fanOut(docs, "doc_id").filter(TextOps.keepExpr)
    val surv = kept.withColumn("key", md5(concat_ws(" ", toks(col("text")))))
      .groupBy(col("key")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"), col("chunk_ix"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkRows(kept.join(surv, "doc_id"), Seq("source"))
      .select(col("doc_id"), col("source"), col("chunk_ix"),
        size(split(trim(col("chunk")), " +")).as("n_tokens"))
      .withColumn("pack_no", floor((sum(col("n_tokens")).over(w) - 1) / budget).cast("bigint"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("pack_no")).as("n_packs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"))
  }

  def chunkPipelineOracle(budget: Int = 128): String =
    s"""WITH quality AS (
       |  ${TextOps.qualityOracle.replace("\n", "\n       |  ")}
       |), kept AS (
       |  SELECT d.* FROM documents d
       |  JOIN (SELECT doc_id FROM quality WHERE keep) q USING (doc_id)
       |), surv AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS key FROM kept)
       |  GROUP BY key
       |), chunks AS (
       |  SELECT doc_id, source, i AS chunk_ix,
       |         len(regexp_split_to_array(trim(
       |           substr(text, CAST(1 + i * $chunkStride AS INT), $chunkSize)), ' +')) AS n_tokens
       |  FROM (SELECT k.* FROM kept k JOIN surv USING (doc_id)),
       |       UNNEST(range(0, CAST(floor((greatest(length(text), 1) - 1) / $chunkStride) AS BIGINT) + 1)) AS t(i)
       |), packed AS (
       |  SELECT source, n_tokens,
       |         CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id, chunk_ix
       |                     ROWS UNBOUNDED PRECEDING) - 1) / $budget) AS BIGINT) AS pack_no
       |  FROM chunks
       |)
       |SELECT source, count(*) AS n_chunks,
       |       count(DISTINCT pack_no) AS n_packs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM packed GROUP BY 1""".stripMargin

  // --------------------------------------------------- per-domain cap

  /** Max docs kept per source domain. Web-corpus curation caps
    * per-domain document counts so mega-domains can't dominate the
    * training mix.
    */
  val domainCapN = 64

  /** Per-domain cap: keep the `domainCapN` lowest doc_ids of each
    * source. Output: the kept rows with their in-domain rank.
    *
    * Scale shape — a rank window with a `rn <= N` filter is the one
    * hot-key window Spark makes skew-safe BY ITSELF: the
    * WindowGroupLimit rule pushes a per-partition top-N below the
    * exchange (plan-verified: `WindowGroupLimit → Exchange →
    * WindowGroupLimit → Window`), so each map task forwards at most N
    * rows per source and a mega-domain's reduce task sees ≤ N·maps
    * rows, never the domain itself. A manual two-phase salted cap was
    * measured redundant against this (same bound, one extra shuffle).
    */
  def domainCap(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val global = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(global).cast("bigint"))
      .filter(col("rn") <= domainCapN)
      .select(col("doc_id"), col("source"), col("rn"))
  }

  val domainCapOracle: String =
    s"""SELECT doc_id, source, rn FROM (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $domainCapN""".stripMargin

  // ------------------------------------------------- end-to-end pipeline

  /** The whole curation flow as ONE declarative plan — quality filter →
    * exact-dedup survivors → hash-gated sampling → sequence packing →
    * per-source report. Each stage is the same operator the standalone
    * queries use; composing them keeps everything inside Catalyst, so
    * filters still push to the scan and the only shuffles are the dedup
    * key agg and the per-source pack window. This is the "a user could
    * run their entire pre-tokenization pipeline on this engine" query.
    */
  def curationPipeline(docs: DataFrame, budget: Int = 512): DataFrame = {
    // same inline row-local quality filter as chunkPipeline: one corpus
    // scan, no self-join
    val kept = Tables.fanOut(docs, "doc_id").filter(TextOps.keepExpr)
    val surv = kept.withColumn("key", md5(concat_ws(" ", toks(col("text")))))
      .groupBy(col("key")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = kept.join(surv, "doc_id")
    val sampled = deduped.filter(
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long"), lit(100L))
        < pmod(conv(substring(md5(col("source")), 1, 4), 16, 10).cast("long"), lit(80L)) + 10)
    sequencePack(sampled, budget)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_packs"),
        sum(col("n_docs")).cast("bigint").as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"))
  }

  def curationPipelineOracle(budget: Int = 512): String =
    s"""WITH quality AS (
       |  ${TextOps.qualityOracle.replace("\n", "\n       |  ")}
       |), kept AS (
       |  SELECT d.* FROM documents d
       |  JOIN (SELECT doc_id FROM quality WHERE keep) q USING (doc_id)
       |), surv AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS key FROM kept)
       |  GROUP BY key
       |), sampled AS (
       |  SELECT k.* FROM kept k JOIN surv USING (doc_id)
       |  WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100)
       |      < (('0x' || substr(md5(source), 1, 4))::BIGINT % 80) + 10
       |), packed AS (
       |  SELECT source, pack_no, count(*) AS n_docs, sum(n_tokens) AS n_tokens
       |  FROM (
       |    SELECT doc_id, source, n_tokens,
       |           CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                       ROWS UNBOUNDED PRECEDING) - 1) / $budget) AS BIGINT) AS pack_no
       |    FROM (SELECT doc_id, source,
       |                 ${TextNorm.rawCountSql} AS n_tokens
       |          FROM sampled)
       |  )
       |  GROUP BY 1, 2
       |)
       |SELECT source, count(*) AS n_packs,
       |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM packed GROUP BY 1""".stripMargin

  // ------------------------------------------------------ admission ledger

  /** The curation CAPSTONE: a per-document admission ledger — every
    * training-candidate doc (benchmark docs excluded) with the single
    * reason it was dropped, or 'kept'. Precedence mirrors a production
    * pipeline's filter order, and — critically — survivor election is
    * SEQUENTIAL, exactly as if each stage only saw the previous
    * stage's survivors: the exact-dup survivor is the smallest doc of
    * its key group that passed quality + decontamination, and the
    * near-dup survivor is the smallest CLUSTER member still alive
    * after the exact stage. A cluster whose minimum doc was
    * quality-rejected therefore still keeps its best surviving member
    * (independent per-signal flags would silently drop the whole
    * cluster — the under-admission bug class this ordering exists to
    * prevent):
    *   quality > contaminated > exact_dup > near_dup > kept.
    *
    * This is the artifact a dataset release ships ("why is doc X not
    * in the training set?") and the input to per-source loss
    * accounting. Shapes: quality is one scan; contamination broadcasts
    * the eval-set grams (shared `contaminatedDocIds` rule); the
    * exact-dup survivor is a min-over-key window (one key shuffle);
    * near-dup survivors come from a groupBy over the MEMOIZED cluster
    * labels (pair-graph-sized — never a window over the unclustered
    * majority, which would funnel the whole corpus into one
    * partition). Nothing here re-runs the LSH pipeline.
    */
  def admissionLedger(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val n = 5
    // the ledger needs the keep FLAG per row (its "quality" reason) —
    // quality's flag is row-local, so compute it in the same projection
    // as the dedup key instead of re-scanning the corpus and re-attaching
    // it through a self-join on doc_id (TextOps.keepExpr pins the
    // equivalence)
    val base = Tables.fanOut(
        docs.filter(pmod(col("doc_id"), lit(benchmarkMod)) =!= 0)
          .select(col("doc_id"), col("source"), col("text")), "doc_id")
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", toks(col("text")))).as("key"),
        TextOps.keepExpr.as("keep"))
      .join(contaminatedDocIds(docs, n).withColumn("contam_hit", lit(1)),
        Seq("doc_id"), "left")
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("contam", col("contam_hit").isNotNull)
      .withColumn("early_drop", !col("keep") || col("contam"))
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val mid = base
      .withColumn("key_surv",
        min(when(!col("early_drop"), col("doc_id"))).over(wKey))
      .withColumn("exact_drop",
        !col("early_drop") && col("doc_id") =!= col("key_surv"))
    val clSurv = mid
      .filter(col("cluster_id").isNotNull && !col("early_drop") && !col("exact_drop"))
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("cl_surv"))
    mid.join(clSurv, Seq("cluster_id"), "left")
      .select(col("doc_id"), col("source"),
        when(!col("keep"), "quality")
          .when(col("contam"), "contaminated")
          .when(col("exact_drop"), "exact_dup")
          .when(col("cluster_id").isNotNull && col("doc_id") =!= col("cl_surv"), "near_dup")
          .otherwise("kept").as("reason"))
  }

  def admissionLedgerOracle(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (
       |  ${Dedup.nearDupPairsOracle(threshold).replace("\n", "\n       |  ")}
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs
       |), reach(v, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.v
       |), clusters AS (
       |  SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
       |), q AS (
       |  ${TextOps.qualityOracle.replace("\n", "\n       |  ")}
       |), ${contamCteSql(5).replace("\n", "\n       |")},
       |base AS (
       |  SELECT d.doc_id, d.source,
       |         md5(array_to_string($toksSql, ' ')) AS key,
       |         q.keep,
       |         (c2.doc_id IS NOT NULL) AS contam,
       |         (NOT q.keep OR c2.doc_id IS NOT NULL) AS early_drop,
       |         cl.cluster_id
       |  FROM documents d JOIN q USING (doc_id)
       |  LEFT JOIN clusters cl ON d.doc_id = cl.doc_id
       |  LEFT JOIN contam c2 ON d.doc_id = c2.doc_id
       |  WHERE d.doc_id % $benchmarkMod != 0
       |), mid AS (
       |  SELECT *,
       |         (NOT early_drop AND doc_id != min(CASE WHEN NOT early_drop THEN doc_id END)
       |            OVER (PARTITION BY key)) AS exact_drop
       |  FROM base
       |), cl_surv AS (
       |  SELECT cluster_id, min(doc_id) AS cl_surv FROM mid
       |  WHERE cluster_id IS NOT NULL AND NOT early_drop AND NOT exact_drop
       |  GROUP BY 1
       |)
       |SELECT m.doc_id, m.source,
       |       CASE WHEN NOT m.keep THEN 'quality'
       |            WHEN m.contam THEN 'contaminated'
       |            WHEN m.exact_drop THEN 'exact_dup'
       |            WHEN m.cluster_id IS NOT NULL AND m.doc_id != s.cl_surv THEN 'near_dup'
       |            ELSE 'kept' END AS reason
       |FROM mid m LEFT JOIN cl_surv s USING (cluster_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_admission_ledger" -> ((s, d) =>
      admissionLedger(Tables.documents(s, d), Dedup.clustersFor(s, d))),
    "q_curation_pipeline" -> ((s, d) => curationPipeline(Tables.documents(s, d))),
    "q_decontaminate" -> ((s, d) => decontaminate(Tables.documents(s, d))),
    "q_repetition" -> ((s, d) => repetition(Tables.documents(s, d))),
    "q_sample_mix" -> ((s, d) => sampleMix(Tables.documents(s, d))),
    "q_seq_pack" -> ((s, d) => sequencePack(Tables.documents(s, d))),
    "q_pack_segments" -> ((s, d) => packSegments(Tables.documents(s, d))),
    "q_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d))),
    "q_mix_weights" -> ((s, d) => mixWeights(Tables.documents(s, d))),
    "q_pii_scrub" -> ((s, d) => piiScrub(Tables.documents(s, d))),
    "q_split_assign" -> ((s, d) => splitAssign(Tables.documents(s, d))),
    "q_shard_manifest" -> ((s, d) => shardManifest(Tables.documents(s, d))),
    "q_chunk_docs" -> ((s, d) => chunkDocs(Tables.documents(s, d))),
    "q_chunk_pipeline" -> ((s, d) => chunkPipeline(Tables.documents(s, d))),
    "q_domain_cap" -> ((s, d) => domainCap(Tables.documents(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_admission_ledger" -> admissionLedgerOracle(),
    "q_curation_pipeline" -> curationPipelineOracle(),
    "q_decontaminate" -> decontaminateOracle(),
    "q_repetition" -> repetitionOracle(),
    "q_sample_mix" -> sampleMixOracle,
    "q_seq_pack" -> sequencePackOracle(),
    "q_pack_segments" -> packSegmentsOracle(),
    "q_source_overlap" -> sourceOverlapOracle(),
    "q_mix_weights" -> mixWeightsOracle(),
    "q_pii_scrub" -> piiScrubOracle,
    "q_split_assign" -> splitAssignOracle,
    "q_shard_manifest" -> shardManifestOracle,
    "q_chunk_docs" -> chunkDocsOracle,
    "q_chunk_pipeline" -> chunkPipelineOracle(),
    "q_domain_cap" -> domainCapOracle
  )
}
