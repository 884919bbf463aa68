package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis for a large-scale training-data pipeline: token
  * counting, quality scoring, language ID, document fingerprinting.
  * All pure column expressions (whole-stage codegen, no UDFs, no
  * shuffle except the final aggregates) — at 100 TB these run as a
  * map-only pass over the corpus with filters pushed to the scan.
  *
  * Frame contract: every operator takes the documents frame and
  * requires its `doc_id` column even where the computation itself only
  * reads text — `doc_id` is the corpus's unique key and the fan-out
  * key ([[graft.Tables.fanOut]] needs a high-cardinality key).
  *
  * Not present in the reference (its only text op is JSON parse,
  * SURVEY §2.7) — this is north-star extension surface (SURVEY §7.2 M6).
  */
object TextOps {

  /** Whitespace tokens of `text`, empties dropped. */
  def tokens(c: Column): Column = split(trim(c), " +")

  /** BPE-ish lexer: letter runs, digit runs, single punctuation marks —
    * the shape of a byte-pair pre-tokenizer's word-split regex.
    */
  val bpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9 ]"

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Token / char counting (whitespace + BPE-ish regex). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(tokens(col("text"))).as("n_tokens"),
      regexp_count(col("text"), lit(bpePattern)).as("n_bpe_tokens"))

  val tokenCountsOracle: String =
    s"""SELECT doc_id,
       |       length(text) AS n_chars,
       |       len(regexp_split_to_array(trim(text), ' +')) AS n_tokens,
       |       len(regexp_extract_all(text, '$bpePattern')) AS n_bpe_tokens
       |FROM documents""".stripMargin

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length → a keep/discard flag (C4/Gopher-style rule filter).
    */
  def quality(docs: DataFrame): DataFrame =
    qualityScores(graft.Tables.fanOut(
      docs.select(col("doc_id"), col("text")), "doc_id"))

  /** The keep/discard rule of [[quality]] as a ROW-LOCAL predicate (the
    * exact same expressions, rounding included). quality's flag depends
    * only on the row's own text, so `docs JOIN quality(docs).filter(keep)
    * ON doc_id` — doc_id being the corpus key — is row-identical to
    * `docs.filter(keepExpr)`: the pipelines use this to keep ONE corpus
    * scan instead of a second scan plus a self-join to re-attach a flag
    * each row could compute locally. */
  private[graft] def keepExpr: Column = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nPunct = regexp_count(col("text"), lit("[^A-Za-z0-9 ]"))
    val punct = round(nPunct.cast("double") / length(col("text")), 6)
    val meanTok = round((length(col("text")) - nTok + 1).cast("double") / nTok, 6)
    (nTok >= 10) && (punct < 0.2) && (meanTok >= 2) && (meanTok <= 12)
  }

  /** [[quality]] minus its own fan-out, for callers that already hold a
    * fanned frame of the corpus. */
  private[graft] def qualityScores(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val nPunct = regexp_count(col("text"), lit("[^A-Za-z0-9 ]"))
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      round(nPunct.cast("double") / length(col("text")), 6).as("punct_ratio"),
      round(nStop.cast("double") / nTok, 6).as("stop_ratio"),
      round((length(col("text")) - nTok + 1).cast("double") / nTok, 6).as("mean_tok_len"))
      .withColumn("keep",
        (col("n_tokens") >= 10) && (col("punct_ratio") < 0.2) &&
          (col("mean_tok_len") >= 2) && (col("mean_tok_len") <= 12))
  }

  val qualityOracle: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT doc_id, n_tokens, punct_ratio, stop_ratio, mean_tok_len,
       |       (n_tokens >= 10 AND punct_ratio < 0.2
       |        AND mean_tok_len >= 2 AND mean_tok_len <= 12) AS keep
       |FROM (
       |  SELECT doc_id,
       |         len(toks) AS n_tokens,
       |         round(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::DOUBLE / length(text), 6) AS punct_ratio,
       |         round(len(list_filter(toks, t -> list_contains($stopList, t)))::DOUBLE / len(toks), 6) AS stop_ratio,
       |         round((length(text) - len(toks) + 1)::DOUBLE / len(toks), 6) AS mean_tok_len
       |  FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), ' +') AS toks FROM documents)
       |)""".stripMargin
  }

  /** Language ID: marker-token overlap per language + CJK detection,
    * argmax with a fixed tie-break order (en > de > fr > es > zh >
    * unknown). A real n-gram model is a learned table; this keeps the
    * same plan shape (map-only scoring + argmax) with hand markers.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "una"))

  def langId(docs: DataFrame): DataFrame = {
    // Token array materialized ONCE behind a Generate barrier (the
    // fingerprint idiom): each per-language score references the `toks`
    // attribute, so CollapseProject can't inline the regex split into
    // every score column (which would run the tokenizer once per
    // language — measured 2× the whole query's cost).
    val scored0 = graft.Tables.fanOut(
        docs.select(col("doc_id"), col("lang"), col("text")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"),
        explode(array(tokens(col("text")))).as("toks"))
    val scored = markers.foldLeft(scored0) {
      case (df, (l, ws)) =>
        val arr = array(ws.map(lit): _*)
        df.withColumn(s"score_$l", size(filter(col("toks"), t => array_contains(arr, t))))
    }.withColumn("score_zh", regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")))
    val best = markers.map(_._1) :+ "zh"
    val top = greatest(best.map(l => col(s"score_$l")): _*)
    scored.withColumn("pred_lang",
      when(top === 0, lit("unknown"))
        .otherwise(best.foldRight(lit("unknown"): Column) { (l, els) =>
          when(col(s"score_$l") === top, lit(l)).otherwise(els)
        }))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  val langIdOracle: String = {
    val scoreExprs = markers.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(regexp_split_to_array(trim(text), ' +'), t -> list_contains($arr, t))) AS score_$l"
    }.mkString(",\n       |         ")
    val langs = markers.map(_._1) :+ "zh"
    val top = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val pick = langs.reverse.foldLeft("'unknown'") { (els, l) =>
      s"CASE WHEN score_$l = top THEN '$l' ELSE $els END"
    }
    s"""SELECT lang, pred_lang, count(*) AS n
       |FROM (
       |  SELECT lang, CASE WHEN top = 0 THEN 'unknown' ELSE $pick END AS pred_lang
       |  FROM (
       |    SELECT lang, $top AS top, *
       |    FROM (
       |      SELECT doc_id, lang,
       |         $scoreExprs,
       |         len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS score_zh
       |      FROM documents
       |    )
       |  )
       |)
       |GROUP BY 1, 2""".stripMargin
  }

  /** Document fingerprinting: md5 of the normalized text (exact-dup key)
    * plus a winnowing-style content fingerprint — the minimum hash over
    * the document's word 5-gram shingles (rolling-hash min-sketch; md5
    * is the portable stand-in for the rolling hash so Spark and DuckDB
    * agree byte-for-byte).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val toks = tokens(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "))
    // Shuffle-free: token array materialized once per doc behind a
    // Generate barrier (both fingerprints consume it), then the 5-gram
    // build + min-md5 winnow run in native expressions — one JVM pass
    // per document instead of an interpreted md5 lambda per shingle.
    graft.Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), explode(array(toks)).as("arr"))
      .select(
        col("doc_id"),
        md5(concat_ws(" ", col("arr"))).as("exact_fp"),
        graft.functions.MinMd5Ops.minMd5(spark,
          graft.functions.NGramsOps.ngrams(spark, col("arr"), 5)).as("content_fp"))
  }

  val fingerprintOracle: String =
    """SELECT doc_id,
      |       md5(array_to_string(toks, ' ')) AS exact_fp,
      |       list_min(list_transform(
      |         list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
      |                        i -> array_to_string(toks[i:i+4], ' ')),
      |         s -> md5(s))) AS content_fp
      |FROM (
      |  SELECT doc_id,
      |         regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +') AS toks
      |  FROM documents
      |)""".stripMargin

  /** TF-IDF top terms per source: explode tokens → per-(source, term)
    * tf → per-term document frequency → tf·idf ranking, top-3 per
    * source. One explode + two shuffles (term agg, source topk) — the
    * canonical "characteristic vocabulary" pipeline, linear in corpus
    * size. Scores rounded 6dp on RAW ratios; rank on rounded score
    * with a term tie-break for cross-engine determinism.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // One pass over the exploded corpus: per-(source, term) tf AND
    // per-source distinct-doc counts in a single aggregation; df(term)
    // = Σ over sources (docs belong to exactly one source) as a window
    // sum — no second corpus scan, no term self-join. n_docs is a
    // metadata-only count(*) (doc_id unique per row).
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    // fan the tokenizer input out to the session's parallelism when the
    // scan under-splits (guide §2: one small parquet file = one task);
    // the n_docs branch stays a metadata-scale scan
    val tok = graft.Tables.fanOut(
        docs.select(col("doc_id"), col("source"), col("text")), "doc_id")
      .select(col("doc_id"), col("source"),
        explode(tokens(lower(col("text")))).as("term"))
    // two-level agg instead of count+countDistinct in one: a mixed
    // distinct aggregate plans an Expand that doubles the exploded
    // token stream before the exchange; aggregating per (source, term,
    // doc_id) first lets partial aggregation collapse the stream
    // map-side, and the second agg is over near-distinct triples
    val perDoc = tok.groupBy(col("source"), col("term"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val tf = perDoc.groupBy(col("source"), col("term"))
      .agg(sum(col("c")).cast("bigint").as("tf"), count(lit(1)).as("dc"))
      .withColumn("doc_freq", sum(col("dc")).over(Window.partitionBy(col("term"))))
      .drop("dc")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("term"))
    tf.crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("doc_freq") + 1)), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("term"), col("tf"), col("doc_freq"), col("score"), col("rank"))
  }

  def tfidfTopTermsOracle(k: Int = 3): String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |         unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS term
       |  FROM documents
       |), n AS (SELECT count(*) AS n_docs FROM documents),
       |tf AS (
       |  SELECT source, term, tf, CAST(sum(dc) OVER (PARTITION BY term) AS BIGINT) AS doc_freq
       |  FROM (SELECT source, term, count(*) AS tf,
       |               count(DISTINCT doc_id) AS dc
       |        FROM tok GROUP BY 1, 2)
       |)
       |SELECT source, term, tf, doc_freq, score, rank
       |FROM (
       |  SELECT tf.source, tf.term, tf.tf, tf.doc_freq,
       |         round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (tf.doc_freq + 1)), 6) AS score,
       |         row_number() OVER (PARTITION BY tf.source
       |                            ORDER BY round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (tf.doc_freq + 1)), 6) DESC,
       |                                     tf.term) AS rank
       |  FROM tf CROSS JOIN n
       |)
       |WHERE rank <= $k""".stripMargin

  /** Corpus vocabulary report — the Zipf-shape numbers a tokenizer
    * training run reads first: vocabulary size, token mass, hapax
    * fraction (1-count terms ≈ noise/typo share), and how much of the
    * corpus the top-N terms cover. One explode + one term-keyed
    * aggregation; the top-N mass uses orderBy+limit (distributed
    * TakeOrdered over per-partition heaps), NOT a global rank window —
    * a 10⁸-term vocabulary never lands in one partition.
    */
  def vocabReport(docs: DataFrame, topN: Int = 100): DataFrame = {
    val freqs = graft.Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(explode(TextNorm.toks(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
    val top = freqs.orderBy(col("f").desc, col("term")).limit(topN)
      .agg(sum(col("f")).as("top_f"))
    freqs
      .agg(count(lit(1)).as("n_terms"), sum(col("f")).as("n_tokens"),
        count(when(col("f") === 1, 1)).as("n_hapax"))
      .crossJoin(top)
      .select(col("n_terms"), col("n_tokens"), col("n_hapax"),
        round(col("n_hapax").cast("double") / col("n_terms"), 6).as("hapax_frac"),
        round(col("top_f").cast("double") / col("n_tokens"), 6).as(s"top${topN}_cover"))
  }

  def vocabReportOracle(topN: Int = 100): String =
    s"""WITH f AS (
       |  SELECT term, count(*) AS f
       |  FROM (SELECT unnest(${TextNorm.toksSql}) AS term FROM documents)
       |  WHERE term != '' GROUP BY 1
       |), top AS (
       |  SELECT CAST(sum(f) AS BIGINT) AS top_f
       |  FROM (SELECT f FROM f ORDER BY f DESC, term LIMIT $topN)
       |), t AS (
       |  SELECT count(*) AS n_terms, CAST(sum(f) AS BIGINT) AS n_tokens,
       |         count(*) FILTER (f = 1) AS n_hapax
       |  FROM f
       |)
       |SELECT n_terms, n_tokens, n_hapax,
       |       round(CAST(n_hapax AS DOUBLE) / n_terms, 6) AS hapax_frac,
       |       round(CAST(top_f AS DOUBLE) / n_tokens, 6) AS top${topN}_cover
       |FROM t, top""".stripMargin

  /** BPE merge-pair frequencies — the inner statistic of byte-pair
    * tokenizer training: corpus-wide counts of adjacent normalized-token
    * pairs, top-K merge candidates ranked (count desc, pair asc). The
    * token array materializes once behind a Generate barrier, the native
    * bigram expression (`graft_ngrams`, n=2) emits the len−1 pairs per
    * document in one JVM pass, and the only shuffle is the pair-keyed
    * count (map-side combinable). Top-K runs as TakeOrdered over
    * per-partition heaps — a 10⁸-pair vocabulary never lands in one
    * partition; the rank window runs over the K survivors only. Docs
    * with fewer than two tokens contribute no pairs (filtered
    * identically on both engines, so no clamped pseudo-pairs).
    */
  def bpePairs(docs: DataFrame, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val arrd = graft.Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(explode(array(TextNorm.toks(col("text")))).as("arr"))
      .filter(size(col("arr")) >= 2)
    val freqs = arrd
      .select(explode(graft.functions.NGramsOps.ngrams(spark, col("arr"), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("f"))
    freqs.orderBy(col("f").desc, col("pair")).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("f").desc, col("pair"))))
  }

  def bpePairsOracle(k: Int = 50): String =
    s"""WITH toks AS (
       |  SELECT ${TextNorm.toksSql} AS arr FROM documents
       |), pairs AS (
       |  SELECT unnest(list_transform(range(1, len(arr)),
       |                i -> array_to_string(arr[i:i+1], ' '))) AS pair
       |  FROM toks WHERE len(arr) >= 2
       |), f AS (
       |  SELECT pair, count(*) AS f FROM pairs GROUP BY 1
       |)
       |SELECT pair, f, rank FROM (
       |  SELECT pair, f, row_number() OVER (ORDER BY f DESC, pair) AS rank FROM f
       |) WHERE rank <= $k""".stripMargin

  /** Token-length histogram in power-of-two buckets, per source — the
    * length-distribution profile a packing/curriculum stage reads before
    * choosing sequence budgets. Counts RAW whitespace tokens
    * (`TextNorm.rawCount`) — the same currency `sequencePack` /
    * `packSegments` / `mixWeights` budget in, so a budget chosen from
    * this histogram sizes those packs exactly. The bucket index is the
    * integer bit-length of the token count (base-2 digits minus one) —
    * exact integer arithmetic on both engines, immune to the
    * floor(log2) FP edge at exact powers of two. Map-only corpus scan +
    * one tiny (source, bucket) aggregate; the per-source share windows
    * over the aggregated histogram, never the corpus.
    */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = TextNorm.rawCount(col("text"))
    docs
      .select(col("source"),
        (length(conv(n.cast("string"), 10, 2)) - 1).as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("lo_tokens", pow(lit(2.0), col("bucket")).cast("bigint"))
      .withColumn("hi_tokens", pow(lit(2.0), col("bucket") + 1).cast("bigint") - 1)
      .withColumn("share", round(col("n_docs").cast("double") /
        sum(col("n_docs")).over(Window.partitionBy(col("source"))), 6))
      .select(col("source"), col("bucket"), col("lo_tokens"), col("hi_tokens"),
        col("n_docs"), col("share"))
  }

  val lengthHistogramOracle: String =
    s"""WITH n AS (
       |  SELECT source, ${TextNorm.rawCountSql} AS n_tokens FROM documents
       |), h AS (
       |  SELECT source, length(bin(n_tokens)) - 1 AS bucket, count(*) AS n_docs
       |  FROM n GROUP BY 1, 2
       |)
       |SELECT source, bucket,
       |       CAST(power(2, bucket) AS BIGINT) AS lo_tokens,
       |       CAST(power(2, bucket + 1) AS BIGINT) - 1 AS hi_tokens,
       |       n_docs,
       |       round(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY source), 6) AS share
       |FROM h""".stripMargin

  /** Bigram language-model quality score — the CCNet/KenLM-style
    * perplexity proxy every pretraining pipeline runs to rank documents
    * by fluency before mixing: train an add-1-smoothed bigram model on
    * the corpus itself, then score each document by its mean bigram log
    * probability (higher = more typical text; templated or shuffled-word
    * junk scores low).
    *
    * Scale shape: bigram generation is MAP-ONLY (array transform over
    * the token array — no window, no per-doc shuffle); the model is two
    * hash aggregates (bigram counts, then head counts derived from them
    * — one pass over the corpus each); scoring is an equi-join of the
    * corpus bigram stream against the model (shuffle join on the bigram
    * key — the model may itself be corpus-scale, so it is NOT collected
    * or broadcast) plus one broadcast scalar (vocabulary size). All
    * probability inputs stay exact integers until the single ln()
    * division; the per-doc mean is rounded 6dp on both engines.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"), TextNorm.toks(col("text")).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(arr)-2), i -> struct(arr[i] AS a, arr[i+1] AS b))")).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    // model-scale frame consumed TWICE (scoring join + head-count
    // derivation) — checkpoint so the corpus-scale gram pass runs once,
    // not once per consumer (same pattern as sourceOverlap's histogram)
    val biCounts = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .localCheckpoint()
    val headCounts = biCounts.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    // smoothing vocabulary = the MODEL's vocabulary (distinct bigram
    // heads ∪ tails), derived from the checkpointed model frame — a
    // corpus-wide distinct-token count would cost a third full pass for
    // the same principled denominator
    val vocab = biCounts.select(col("a").as("w"))
      .union(biCounts.select(col("b").as("w")))
      .agg(countDistinct(col("w")).as("v"))
    bi.join(biCounts, Seq("a", "b"))
      .join(headCounts, Seq("a"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("bigint").as("n_bigrams"),
        round(avg(log((col("c_ab") + 1).cast("double") / (col("c_a") + col("v")))), 6)
          .as("lm_score"))
  }

  val lmScoreOracle: String = {
    val arr = TextNorm.toksSql
    s"""WITH bi AS (
       |  SELECT doc_id, bg['a'] AS a, bg['b'] AS b FROM (
       |    SELECT doc_id,
       |           unnest(list_transform(range(1, len(arr)),
       |             i -> struct_pack(a := arr[i], b := arr[i+1]))) AS bg
       |    FROM (SELECT doc_id, $arr AS arr FROM documents)
       |    WHERE len(arr) >= 2)
       |), bc AS (
       |  SELECT a, b, count(*) AS c_ab FROM bi GROUP BY 1, 2
       |), hc AS (
       |  SELECT a, sum(c_ab) AS c_a FROM bc GROUP BY 1
       |), v AS (
       |  SELECT count(DISTINCT w) AS v
       |  FROM (SELECT a AS w FROM bc UNION ALL SELECT b AS w FROM bc)
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       round(avg(ln((c_ab + 1)::DOUBLE / (c_a + v))), 6) AS lm_score
       |FROM bi JOIN bc USING (a, b) JOIN hc USING (a) CROSS JOIN v
       |GROUP BY doc_id""".stripMargin
  }

  /** Full BPE merge-training loop (the iterative heart of byte-pair
    * tokenizer training, beyond `bpePairs`' single pair count): `merges`
    * rounds of [count adjacent pairs corpus-wide → select the most
    * frequent (deterministic count-desc, then lexicographic, tie-break)
    * → merge every non-overlapping occurrence greedily left-to-right].
    * Returns the merge table (rank, selected pair, its pre-merge count)
    * — the artifact a tokenizer ships.
    *
    * Representation: each document rides as a `;tok;`-wrapped string
    * (tokens never contain ';'), so the greedy merge IS a literal
    * `replace(s, ';a;;b;', ';a b;')` — both engines' `replace` scans
    * left-to-right, never re-matching inside a replacement, which is
    * exactly BPE's non-overlapping greedy semantics, byte-identical
    * across Spark and DuckDB. (A fold-based formulation was rejected:
    * DuckDB 1.0.0 segfaults on corpus-scale `list_reduce`.)
    *
    * Scale shape: each round is one corpus-wide pair aggregate (hash
    * agg with map-side combine) + a 1-row collect of the winning pair
    * (a scalar, like the OLS coefficients) + a map-only `replace` pass,
    * localCheckpointed so round r+1 scans the merged corpus once
    * instead of replaying r replace chains. O(merges) passes over the
    * corpus is the canonical distributed BPE cost; real trainers batch
    * multiple disjoint merges per pass to trade rounds for conflicts.
    */
  /** The `;tok;`-wrapped corpus representation both trainers merge in. */
  private def wrappedCorpus(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit(";"), array_join(TextNorm.toks(col("text")), ";;"), lit(";")).as("s"))

  /** One corpus-wide adjacent-pair count (hash agg, map-side combine). */
  private def pairCountsOf(cur: DataFrame): DataFrame =
    cur.select(split(expr("trim(BOTH ';' FROM s)"), ";;").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk)-2), i -> struct(tk[i] AS a, tk[i+1] AS b))")).as("bg"))
      .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
      .agg(count(lit(1)).as("c"))

  def bpeTrain(docs: DataFrame, merges: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = wrappedCorpus(docs).localCheckpoint()
    val out = scala.collection.mutable.Buffer.empty[(Int, String, Long)]
    for (r <- 1 to merges) {
      val top = pairCountsOf(cur)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()(0)
      val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
      out += ((r, s"$a $b", c))
      // tokens are [a-z0-9 ]+ — safe to inline as SQL string literals.
      // The FINAL round's merged corpus is never read again (the merge
      // table is the output) — skip its replace + checkpoint pass, one
      // of merges+1 full-corpus materializations
      if (r < merges)
        cur = cur.withColumn("s", expr(s"replace(s, ';$a;;$b;', ';$a $b;')"))
          .localCheckpoint()
    }
    out.toSeq.toDF("merge_rank", "pair", "n")
      .select(col("merge_rank").cast("int").as("merge_rank"), col("pair"), col("n"))
  }

  /** Batched BPE training: per round, ONE pair count selects up to
    * `batchK` TOKEN-DISJOINT merges (greedy in count-desc / lexicographic
    * rank order, skipping any pair sharing a token with an
    * already-picked one), all applied in a single map-only replace pass.
    * Token-disjoint replaces commute — merging (a,b) can neither create
    * nor destroy an occurrence of (c,d) when {a,b} ∩ {c,d} = ∅ — so the
    * batch is well-defined; this is the trade real trainers make
    * (O(merges/batchK) corpus passes instead of O(merges), at the cost
    * of ranking later batch members on pre-batch counts — see
    * TextOpsSpec for a corpus where that ordering visibly diverges from
    * the sequential trainer, and one where it provably cannot).
    *
    * Selection scans a top-`candidateWindow` slice of the ranked pair
    * table (collecting the full table would be the driver-side
    * anti-pattern); a round that cannot seat its full batch — window
    * exhausted OR the corpus genuinely out of disjoint pairs — fails
    * loudly rather than silently diverging from the oracle, which
    * models exactly `batchK` selections per round. Unreachable for
    * natural corpora.
    */
  def bpeTrainBatched(docs: DataFrame, merges: Int = 4, batchK: Int = 2,
      candidateWindow: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainBatchedPairs(docs, merges, batchK, candidateWindow)
      .map { case (r, a, b, c) => (r, s"$a $b", c) }
      .toDF("merge_rank", "pair", "n")
      .select(col("merge_rank").cast("int").as("merge_rank"), col("pair"), col("n"))
  }

  /** The batched trainer's merge table with the (a, b) components kept
    * STRUCTURED — `pair` strings are ambiguous to re-split once merged
    * tokens themselves contain spaces, and [[bpeEncode]] needs the exact
    * components to rebuild the replace chain.
    */
  private[graft] def bpeTrainBatchedPairs(docs: DataFrame, merges: Int,
      batchK: Int, candidateWindow: Int = 1000): Seq[(Int, String, String, Long)] = {
    var cur = wrappedCorpus(docs).localCheckpoint()
    val out = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var rank = 0
    while (rank < merges) {
      val want = math.min(batchK, merges - rank)
      val window = pairCountsOf(cur)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(candidateWindow).collect()
      val used = scala.collection.mutable.Set.empty[String]
      val picked = scala.collection.mutable.Buffer.empty[(String, String, Long)]
      val it = window.iterator
      while (picked.size < want && it.hasNext) {
        val r = it.next()
        val (a, b) = (r.getString(0), r.getString(1))
        if (!used(a) && !used(b)) {
          picked += ((a, b, r.getLong(2))); used += a; used += b
        }
      }
      // A round that cannot seat its FULL batch fails loudly, whether the
      // window was exhausted or the corpus genuinely lacks disjoint pairs:
      // the unrolled oracle models exactly `want` selections per round (an
      // empty m_j CTE would collapse its CROSS JOIN chain to zero rows), so
      // proceeding with a partial batch would silently diverge from it.
      // Unreachable for natural corpora — it needs every remaining pair to
      // share a token with the round's earlier picks.
      if (picked.size < want)
        sys.error(s"bpeTrainBatched: only ${picked.size} of $want disjoint " +
          s"pairs available this round (window=${window.length}) — corpus " +
          "cannot seat the batch; lower batchK or merges")
      picked.foreach { case (a, b, c) => rank += 1; out += ((rank, a, b, c)) }
      // the final batch's merged corpus is never read again (the merge
      // table is the output) — skip its replace + checkpoint pass: at
      // the default merges=4/batchK=2 that is one of only TWO
      // full-corpus materialization passes
      if (rank < merges) {
        val merged = picked.foldLeft("s") { case (e, (a, b, _)) =>
          s"replace($e, ';$a;;$b;', ';$a $b;')"
        }
        cur = cur.withColumn("s", expr(merged)).localCheckpoint()
      }
    }
    out.toSeq
  }

  def bpeTrainOracle(merges: Int = 3): String = {
    val arr = TextNorm.toksSql
    def pairCte(t: String) =
      s"""SELECT bg['a'] AS a, bg['b'] AS b, count(*) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> struct_pack(a := tk[i], b := tk[i+1]))) AS bg
         |    FROM (SELECT string_split(trim(s, ';'), ';;') AS tk FROM $t)
         |  ) GROUP BY 1, 2""".stripMargin
    def mergeExpr(m: String) =
      s"replace(s, ';' || $m.a || ';;' || $m.b || ';', ';' || $m.a || ' ' || $m.b || ';')"
    val rounds = (1 to merges).map { r =>
      val prev = if (r == 1) "t0" else s"t${r - 1}"
      s"""p$r AS (${pairCte(prev)}),
         |m$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |t$r AS (SELECT ${mergeExpr(s"m$r")} AS s FROM $prev CROSS JOIN m$r)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to merges).map(r =>
      s"SELECT $r AS merge_rank, a || ' ' || b AS pair, CAST(c AS BIGINT) AS n FROM m$r")
      .mkString("\nUNION ALL ")
    s"""WITH t0 AS (
       |  SELECT ';' || array_to_string($arr, ';;') || ';' AS s FROM documents
       |),
       |$rounds
       |$unions""".stripMargin
  }

  /** Trained merge tables memoized per (corpus dir, merges, batchK) —
    * the merge table IS the artifact a tokenizer ships; training it once
    * per corpus and reusing it across encode invocations is exactly the
    * production split (train offline, apply everywhere). Driver-heap
    * strings only; evicted by [[clearCaches]].
    */
  private val mergeMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), Seq[(Int, String, String, Long)]]

  private[graft] def clearCaches(): Unit = mergeMemo.clear()

  /** Tokenizer APPLICATION — the other half of BPE training: encode
    * every document with a trained merge table (replace chain in rank
    * order; sequential application equals the training-time batch
    * application because batch members are token-disjoint) and report
    * its encoded token count next to the base tokenization count. This
    * is the real "tokens per document under tokenizer X" statistic a
    * data pipeline bills by — the regex `tokenCounts` is the cheap
    * proxy. Map-only over the corpus: the merge table is a handful of
    * driver strings baked into the projection (what a broadcast merge
    * table compiles to at this size); empty docs count 0.
    */
  def bpeEncode(docs: DataFrame, merges: Int = 4, batchK: Int = 2,
      memoKey: Option[String] = None): DataFrame = {
    val learned = memoKey match {
      case Some(d) => mergeMemo.getOrElseUpdate((d, merges, batchK),
        bpeTrainBatchedPairs(docs, merges, batchK))
      case None => bpeTrainBatchedPairs(docs, merges, batchK)
    }
    val chain = learned.sortBy(_._1).foldLeft("s") { case (e, (_, a, b, _)) =>
      s"replace($e, ';$a;;$b;', ';$a $b;')"
    }
    // punctuation-only docs normalize to ONE empty token under the shared
    // tokenizer (TextNorm.toks convention) — n_tokens_bpe = n_tokens_base
    // = 1 for them on both engines, no special case needed
    docs.select(col("doc_id"), TextNorm.toks(col("text")).as("tk"))
      .withColumn("s", concat(lit(";"), array_join(col("tk"), ";;"), lit(";")))
      .select(
        col("doc_id"),
        size(split(expr(s"trim(BOTH ';' FROM ${chain})"), ";;")).cast("bigint")
          .as("n_tokens_bpe"),
        size(col("tk")).cast("bigint").as("n_tokens_base"))
  }

  def bpeEncodeOracle(merges: Int = 4, batchK: Int = 2): String = {
    val arr = TextNorm.toksSql
    // merge selection: the SAME unrolled CTE chain as the batched-train
    // oracle; the encode chain then re-applies m1..mN to a doc-id-keyed
    // copy of the corpus, round by round
    val (trainCtes, roundSels) = bpeBatchedTrainCtes(merges, batchK)
    val encodeCtes = roundSels.zipWithIndex.map { case (sel, i) =>
      val merged = sel.foldLeft("s") { (e, j) =>
        s"replace($e, ';' || m$j.a || ';;' || m$j.b || ';', ';' || m$j.a || ' ' || m$j.b || ';')"
      }
      val joins = sel.map(j => s"CROSS JOIN m$j").mkString(" ")
      s"e${i + 1} AS (SELECT doc_id, $merged AS s FROM e$i $joins)"
    }.mkString(",\n")
    val last = s"e${roundSels.size}"
    s"""WITH ${trainCtes.mkString(",\n")},
       |e0 AS (
       |  SELECT doc_id, $arr AS tk,
       |         ';' || array_to_string($arr, ';;') || ';' AS s FROM documents
       |),
       |$encodeCtes
       |SELECT e.doc_id,
       |       len(string_split(trim(e.s, ';'), ';;'))::BIGINT AS n_tokens_bpe,
       |       len(e0.tk)::BIGINT AS n_tokens_base
       |FROM $last e JOIN e0 USING (doc_id)""".stripMargin
  }

  /** The batched-trainer CTE prelude shared by the train and encode
    * oracles: `t0` (wrapped corpus) through `t{R}` plus per-selection
    * `m{j}` CTEs. Returns (CTE list incl. the leading t0, per-round
    * global selection ids).
    */
  private def bpeBatchedTrainCtes(merges: Int, batchK: Int): (Seq[String], Seq[Seq[Int]]) = {
    val arr = TextNorm.toksSql
    def pairCte(t: String) =
      s"""SELECT bg['a'] AS a, bg['b'] AS b, count(*) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> struct_pack(a := tk[i], b := tk[i+1]))) AS bg
         |    FROM (SELECT string_split(trim(s, ';'), ';;') AS tk FROM $t)
         |  ) GROUP BY 1, 2""".stripMargin
    val ctes = scala.collection.mutable.Buffer(
      s"""t0 AS (
         |  SELECT ';' || array_to_string($arr, ';;') || ';' AS s FROM documents
         |)""".stripMargin)
    val roundSels = scala.collection.mutable.Buffer.empty[Seq[Int]]
    var done = 0
    var r = 0
    while (done < merges) {
      r += 1
      val k = math.min(batchK, merges - done)
      val prev = s"t${r - 1}"
      ctes += s"p$r AS (${pairCte(prev)})"
      val roundSel = (1 to k).map(_ + done)
      roundSel.zipWithIndex.foreach { case (j, i) =>
        val earlier = roundSel.take(i)
        val filter =
          if (earlier.isEmpty) ""
          else {
            val toks = earlier.map(e => s"SELECT a AS t FROM m$e UNION ALL SELECT b AS t FROM m$e")
              .mkString(" UNION ALL ")
            s"WHERE a NOT IN ($toks) AND b NOT IN ($toks) "
          }
        ctes += s"m$j AS (SELECT a, b, c FROM p$r ${filter}ORDER BY c DESC, a, b LIMIT 1)"
      }
      val mergedS = roundSel.foldLeft("s") { (e, j) =>
        s"replace($e, ';' || m$j.a || ';;' || m$j.b || ';', ';' || m$j.a || ' ' || m$j.b || ';')"
      }
      val joins = roundSel.map(j => s"CROSS JOIN m$j").mkString(" ")
      ctes += s"t$r AS (SELECT $mergedS AS s FROM $prev $joins)"
      roundSels += roundSel
      done += k
    }
    (ctes.toSeq, roundSels.toSeq)
  }

  /** Unrolled oracle for the batched trainer: per round, one pair-count
    * CTE; selection j of the round is the ranked top-1 over that SAME
    * count restricted to pairs token-disjoint from the round's earlier
    * selections (exactly the greedy), and the round's replaces chain
    * inside one projection. The oracle models exactly `batchK`
    * selections per round — the Spark side errors loudly on any round
    * that cannot seat its full batch, so the two can never silently
    * diverge.
    */
  def bpeTrainBatchedOracle(merges: Int = 4, batchK: Int = 2): String = {
    val (ctes, roundSels) = bpeBatchedTrainCtes(merges, batchK)
    val unions = roundSels.flatten.map(j =>
      s"SELECT $j AS merge_rank, a || ' ' || b AS pair, CAST(c AS BIGINT) AS n FROM m$j")
      .mkString("\nUNION ALL ")
    s"""WITH ${ctes.mkString(",\n")}
       |$unions""".stripMargin
  }

  /** The fixed retrieval benchmark queries (query_id → terms) — small,
    * config-scale, broadcast by construction. */
  val bm25Queries: Seq[(String, Seq[String])] = Seq(
    "q1" -> Seq("spark", "join"),
    "q2" -> Seq("window", "stream"),
    "q3" -> Seq("hash", "merge", "sort"))

  /** BM25 ranked retrieval (Lucene-flavored idf): top-k documents per
    * query over the corpus — the sparse half of hybrid retrieval, next
    * to the dense ANN operators in Similarity. Distributed shape: one
    * tokenize pass builds the (doc, term, tf) posting frame and doc
    * lengths; the query-term table is BROADCAST and equi-joined into
    * the postings, so only documents containing a query term ever flow
    * (never a corpus × queries cross product); document frequencies
    * aggregate over the same pruned postings; corpus stats (N, avgdl)
    * are one broadcast scalar row. Per-(query, doc) contributions sum
    * in a partial-aggregating groupBy; ranks come from a per-query
    * window over the rounded score with a doc_id tie-break
    * (cross-engine determinism). At 100 TB the posting build is the
    * linear corpus pass, everything after is O(matching postings).
    *
    * score(q,d) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) ·
    *              tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(String, Seq[String])] = bm25Queries,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bm25Rank(docs,
      queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term"),
      k, k1, b)
  }

  /** BM25 core over an arbitrary `(query_id, term)` frame — query_id of
    * any type (string benchmark ids, or doc ids for more-like-this /
    * hybrid retrieval). `excludeSelf` drops the query document itself
    * before ranking (query_id and doc_id must then be comparable).
    */
  def bm25Rank(docs: DataFrame, qterms0: DataFrame,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // TWO corpus scans total, by construction (DataFrame branches don't
    // share work, so every derived frame must hang off ONE posting
    // branch): (1) a light stats scan — n_docs and total tokens, no
    // explode, since avgdl ≡ total_tokens / n_docs; (2) the posting
    // build — explode → (doc, term, tf), with dl as a doc-partitioned
    // window ON THE SAME BRANCH, then the broadcast query-term prune,
    // then df as a term-partitioned window over the PRUNED postings
    // (all postings of a query term survive the prune, so the count is
    // the true document frequency).
    // both tokenizing branches read the same fanned-out projection, so
    // the parallelism-floor exchange plans once and ReuseExchange shares it
    val fdocs = graft.Tables.fanOut(docs.select(col("doc_id"), col("text")), "doc_id")
    val stats = fdocs.select(count(lit(1)).as("n_docs"),
      sum(size(tokens(lower(col("text"))))).as("total_tokens"))
    val tf = fdocs.select(col("doc_id"),
        explode(tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    val pruned = tf.join(broadcast(qterms0.select("term").distinct()), Seq("term"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val contrib = pruned
      .join(broadcast(qterms0), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs"))
      .withColumn("c",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c")), 6).as("score"))
    (if (excludeSelf) scored.filter(col("doc_id") =!= col("query_id")) else scored)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  def bm25TopKOracle(queries: Seq[(String, Seq[String])] = bm25Queries,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): String = {
    val qvals = queries.flatMap { case (q, ts) =>
      ts.map(t => s"('$q','$t')") }.mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
       |), q(query_id, term) AS (VALUES $qvals),
       |dfq AS (
       |  SELECT term, count(*) AS df FROM tf
       |  WHERE term IN (SELECT term FROM q) GROUP BY 1
       |), contrib AS (
       |  SELECT q.query_id, tf.doc_id,
       |         ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |         tf.tf * ${k1 + 1.0} /
       |         (tf.tf + $k1 * (${1.0 - b} + $b * dl.dl / s.avgdl)) AS c
       |  FROM tf
       |  JOIN q ON tf.term = q.term
       |  JOIN dfq ON tf.term = dfq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats s
       |)
       |SELECT query_id, doc_id, score, rank FROM (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS rank
       |  FROM (SELECT query_id, doc_id, round(sum(c), 6) AS score
       |        FROM contrib GROUP BY 1, 2)
       |)
       |WHERE rank <= $k""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_vocab" -> ((s, d) => vocabReport(Tables.documents(s, d))),
    "q_text_tfidf" -> ((s, d) => tfidfTopTerms(Tables.documents(s, d))),
    "q_text_tokens" -> ((s, d) => tokenCounts(Tables.documents(s, d))),
    "q_text_quality" -> ((s, d) => quality(Tables.documents(s, d))),
    "q_text_langid" -> ((s, d) => langId(Tables.documents(s, d))),
    "q_text_fingerprint" -> ((s, d) => fingerprint(Tables.documents(s, d))),
    "q_bpe_pairs" -> ((s, d) => bpePairs(Tables.documents(s, d))),
    "q_length_hist" -> ((s, d) => lengthHistogram(Tables.documents(s, d))),
    "q_text_lmscore" -> ((s, d) => lmScore(Tables.documents(s, d))),
    "q_bpe_train" -> ((s, d) => bpeTrain(Tables.documents(s, d))),
    "q_bpe_train_batched" -> ((s, d) => bpeTrainBatched(Tables.documents(s, d))),
    "q_bpe_encode" -> ((s, d) => bpeEncode(Tables.documents(s, d), memoKey = Some(d))),
    "q_bm25_topk" -> ((s, d) => bm25TopK(Tables.documents(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_text_vocab" -> vocabReportOracle(),
    "q_text_tfidf" -> tfidfTopTermsOracle(),
    "q_text_tokens" -> tokenCountsOracle,
    "q_text_quality" -> qualityOracle,
    "q_text_langid" -> langIdOracle,
    "q_text_fingerprint" -> fingerprintOracle,
    "q_bpe_pairs" -> bpePairsOracle(),
    "q_length_hist" -> lengthHistogramOracle,
    "q_text_lmscore" -> lmScoreOracle,
    "q_bpe_train" -> bpeTrainOracle(),
    "q_bpe_train_batched" -> bpeTrainBatchedOracle(),
    "q_bpe_encode" -> bpeEncodeOracle(),
    "q_bm25_topk" -> bm25TopKOracle()
  )
}
