package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps

/** Similarity search over an embedding column (`Array[Float]`): exact
  * brute-force cosine top-k as the baseline, a sign-bit (random
  * hyperplane LSH / IVF-style) bucketed variant as the scale path, and
  * a cosine near-dup pair join.
  *
  * The inner loop is graft's native codegen dot-product expression
  * (`graft.functions.DotProduct`); each side's L2 norm is materialized
  * ONCE per row, so a candidate pair costs exactly one dot product.
  * Ranking is on the ROUNDED cosine (6dp) with a vec_id tie-break so
  * Spark and the DuckDB oracle order identically despite last-ulp
  * float drift.
  *
  * Scale notes (100 TB): brute force is O(Q·N) — fine for a broadcast
  * query set (Q small): a map-only pass over the corpus, top-k per
  * partition, merge. The bucketed variant cuts the scanned fraction to
  * ~1/2^bits at the cost of recall, the classic IVF/LSH trade. The
  * bucket assignment is a deterministic projection, so the corpus can
  * be WRITTEN partitioned by bucket — then bucket search is partition
  * pruning, not a filter.
  */
object Similarity {

  /** (vec_id, e, nrm[, bucket]) — double-cast embedding with its norm
    * materialized as a column (two-step projection: the norm is an
    * attribute, not an inlined subtree, so it is computed once).
    */
  private def emb(df: DataFrame, withBucket: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(spark, col("e")))
    if (withBucket) base.withColumn("bucket",
      when(element_at(col("e"), 1) > 0, 4).otherwise(0) +
        when(element_at(col("e"), 2) > 0, 2).otherwise(0) +
        when(element_at(col("e"), 3) > 0, 1).otherwise(0))
    else base
  }

  private def cosRaw(spark: SparkSession): Column =
    VectorOps.dot(spark, col("qe"), col("e")) / (col("qnrm") * col("nrm"))

  private def cosPair(spark: SparkSession): Column = round(cosRaw(spark), 6)

  private val bucketSql =
    """(CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END +
      | CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END +
      | CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END)""".stripMargin.replace("\n", "")

  private val cosSql =
    "round(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6)"

  /** Exact brute-force cosine top-k for a query set (vec_id < nQueries). */
  def bruteForceTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val spark = vectors.sparkSession
    val v = emb(vectors)
    val q = v.select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"))
      .filter(col("query_id") < nQueries)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosPair(spark))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  def bruteForceTopKOracle(nQueries: Int = 5, k: Int = 10): String =
    s"""SELECT query_id, vec_id, cos, rank
       |FROM (
       |  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
       |         $cosSql AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY $cosSql DESC, v.vec_id) AS rank
       |  FROM embeddings v
       |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < $nQueries) q
       |  WHERE v.vec_id != q.vec_id
       |)
       |WHERE rank <= $k""".stripMargin

  /** Bucketed (IVF/LSH) top-k: search only the query's own bucket. */
  def bucketedTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val spark = vectors.sparkSession
    val v = emb(vectors, withBucket = true)
    val q = v.select(col("vec_id").as("query_id"), col("e").as("qe"),
      col("nrm").as("qnrm"), col("bucket").as("qbucket"))
      .filter(col("query_id") < nQueries)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    v.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosPair(spark))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Multi-probe sign-bit LSH top-k: 8 hyperplane sign bits (256
    * buckets — the cardinality a real corpus needs) with the classic
    * multi-probe recall fix: each query searches its own bucket PLUS
    * the 8 buckets at hamming distance 1 (one sign flipped), i.e. the
    * buckets a borderline vector most likely fell into. Probing is an
    * explode of 9 derived bucket keys → an equality join — at scale,
    * with the corpus WRITTEN partitioned by bucket, that is 9 partition
    * prunes instead of a scan. Candidate pool ≈ 9/256 of the corpus vs
    * the single-probe variant's 1/8 with 8× fewer buckets.
    */
  def multiProbeTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val spark = vectors.sparkSession
    val bits = 8
    def bucketOf(e: Column): Column =
      (1 to bits).map(i => when(try_element_at(e, lit(i)) > 0, 1 << (bits - i)).otherwise(0))
        .reduce(_ + _)
    val v = emb(vectors).withColumn("bucket", bucketOf(col("e")))
    val probes = array(lit(0) +: (0 until bits).map(b => lit(1 << b)): _*)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    v.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosPair(spark))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Oracle: hamming(bucket_v, bucket_q) ≤ 1 is exactly the 9-probe set. */
  def multiProbeTopKOracle(nQueries: Int = 5, k: Int = 10): String = {
    val bits = 8
    val bucket8 = (1 to bits).map(i =>
      s"CASE WHEN embedding[$i] > 0 THEN ${1 << (bits - i)} ELSE 0 END").mkString(" + ")
    s"""SELECT query_id, vec_id, cos, rank
       |FROM (
       |  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
       |         $cosSql AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY $cosSql DESC, v.vec_id) AS rank
       |  FROM (SELECT *, $bucket8 AS bucket FROM embeddings) v
       |  JOIN (SELECT *, $bucket8 AS bucket FROM embeddings WHERE vec_id < $nQueries) q
       |    ON bit_count(xor(v.bucket::BIGINT, q.bucket::BIGINT)) <= 1
       |   AND v.vec_id != q.vec_id
       |)
       |WHERE rank <= $k""".stripMargin
  }

  def bucketedTopKOracle(nQueries: Int = 5, k: Int = 10): String =
    s"""SELECT query_id, vec_id, cos, rank
       |FROM (
       |  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
       |         $cosSql AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY $cosSql DESC, v.vec_id) AS rank
       |  FROM (SELECT *, $bucketSql AS bucket FROM embeddings) v
       |  JOIN (SELECT *, $bucketSql AS bucket FROM embeddings WHERE vec_id < $nQueries) q
       |    ON v.bucket = q.bucket AND v.vec_id != q.vec_id
       |)
       |WHERE rank <= $k""".stripMargin

  /** IVF top-k: the full inverted-file ANN shape — build a coarse
    * codebook, assign every vector to its nearest centroid cell
    * (inverted lists), route each query to its `nprobe` nearest cells,
    * exact-rerank only inside probed cells.
    *
    * The codebook here is the per-label mean vector — deterministic (no
    * k-means iteration randomness), so the DuckDB oracle reproduces the
    * exact cells and the hash-compare stays byte-exact; swapping in
    * k-means centroids changes only the codebook derivation, not the
    * search plan. Cell assignment ranks the ROUNDED cosine (6dp) with a
    * label tie-break — same cross-engine determinism rule as the top-k
    * ranks.
    *
    * Scale shape: centroids are O(cells) and broadcast everywhere;
    * assignment is one map-only pass over the corpus (write the corpus
    * PARTITIONED by cell and probing becomes partition pruning); the
    * probe join touches nprobe/cells of the data — the recall/cost dial
    * IVF exists for.
    */
  private val dim = 64

  /** (vec_id, label, e, nrm) projection shared by the IVF variants. */
  private def vecFrame(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    vectors.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(spark, col("e")))
  }

  /** Per-label mean centroids (cell, ce, cnrm) — the deterministic
    * codebook seed.
    */
  /** EXACT (order-insensitive) per-dimension mean: each element is
    * quantized to a 12dp LONG (`round(v*1e12)` — identical IEEE
    * multiply + half-away-from-zero round in both engines), the longs
    * are integer-summed (order-insensitive by definition), then ONE
    * double division — run-to-run and cross-engine deterministic,
    * unlike a double `avg` whose partial-sum order drifts with
    * parallelism. The drift matters EXACTLY where a rounded-cosine
    * RANK breaks ties: `q_ivf_append`'s fixture sat on such a boundary
    * and flipped a cell assignment between oracle runs (~50% selfcheck
    * flake). An earlier fix summed `decimal(27,12)` per element, which
    * costs a BigDecimal conversion + decimal add per row and made the
    * IVF family 2-3x slower; integer sums stay inside whole-stage
    * codegen as primitive long adds. Overflow envelope: |v| <= 1 (unit
    * embeddings) quantizes to <= 1e12 per row, so a long sum is exact
    * to ~9e6 rows per group — far above any training sample here; past
    * that, drop to 9dp (1e10 rows) — Spark runs ANSI mode, so an
    * overflow fails loudly rather than wrapping. Oracles mirror this as
    * `CAST(sum(CAST(round(v * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 /
    * count(v)` (DuckDB's BIGINT sum is a HUGEINT — exact).
    *
    * The quantization itself runs ONCE per row over the whole vector in
    * the native `graft_qvec` kernel (Spark's own `round(double)` routes
    * through BigDecimal per value — 64 allocations per row here; see
    * the rounding-equivalence argument in `QuantizeVec`'s doc for why
    * kernel, Spark `round`, and DuckDB `round` agree everywhere), so
    * the aggregate side is pure primitive long sums inside whole-stage
    * codegen. */
  private def withQv(df: DataFrame): DataFrame =
    df.withColumn("_qv",
      graft.functions.QuantizeVec.quantVec(df.sparkSession,
        // the shared count(*) denominator below is only
        // result-equivalent to the oracle's count(v) when every row is
        // non-null and full-width — ENFORCE that in-plan instead of
        // assuming it: a null or short embedding raises instead of
        // silently shifting the centroid mean
        when(col("e").isNotNull && size(col("e")) === lit(dim), col("e"))
          .otherwise(raise_error(concat(
            lit(s"centroid derivation requires non-null $dim-wide " +
              "embeddings; got size="),
            coalesce(size(col("e")).cast("string"), lit("null")))))))

  /** Quantized-long SUM of dimension `i` over a frame that passed
    * through [[withQv]] — combined with ONE shared `count(*)` per
    * group instead of a per-dimension `count(element_at(e, i))`:
    * embeddings are fixed-width and element-null-free, so the per-dim
    * counts were 64 identical aggregates doubling the aggregation
    * buffer width for nothing (the oracle's `/ count(v)` equals
    * `/ count(*)` on the same data — values identical, hash identical).
    */
  private def qsum(i: Int) = sum(element_at(col("_qv"), i))
  private def qsumAt(i: Int) = qsum(i).as(s"s_$i")

  private def meanCols(n: Column): Column =
    array((1 to dim).map(i =>
      col(s"s_$i").cast("double") / lit(1.0e12) / n): _*)

  private def labelCentroids(v: DataFrame): DataFrame = {
    val spark = v.sparkSession
    val sums = (1 to dim).map(qsumAt)
    withQv(v).groupBy(col("label"))
      .agg(count(lit(1)).as("_n"), sums: _*)
      .select(col("label").as("cell"), meanCols(col("_n")).as("ce"))
      .withColumn("cnrm", VectorOps.norm(spark, col("ce")))
  }

  /** Adds a ranked `cells` array (cell ids, best first) to every vector
    * row: the codebook is packed into ONE broadcast row, so cell
    * routing is a narrow per-row reduction — the corpus is NEVER
    * shuffled for assignment (a row_number window over vec_id would
    * shuffle 100 TB to make a per-row decision). Scoring + ranking run
    * in the native `graft_rankcells` expression (rounded-cosine desc,
    * cell-asc tie-break — identical to the oracle's ORDER BY); the
    * previous `sort_array(transform(...))` formulation paid an
    * interpreted lambda dispatch per codebook entry per row.
    */
  private def withRankedCells(v: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = v.sparkSession
    val agg = centroids
      .agg(collect_list(struct(col("cell").cast("bigint").as("cell"),
        col("ce"), col("cnrm"))).as("cb"))
    // materialize the O(cells) codebook ONCE (a config-scale collect —
    // hundreds of entries, each a 64-double centroid): the probe plans
    // consume `withRankedCells` output through MULTIPLE branches
    // (inverted lists + query probe lists), and a lazily-embedded agg
    // would re-run the whole centroid aggregation per branch. A
    // literal one-row frame makes every branch share the same values —
    // the "persisted codebook artifact" shape a production IVF index
    // has anyway.
    val rows = java.util.Arrays.asList(agg.collect(): _*)
    v.crossJoin(broadcast(spark.createDataFrame(rows, agg.schema)))
      .withColumn("cells", graft.functions.RankCellsOps.rankCells(spark, col("e"), col("cb")))
      .drop("cb")
  }

  /** Deterministic hash-gated training sample (same md5 arithmetic as
    * `Curation.sampleMix`, so DuckDB reproduces the exact member set):
    * md5(vec_id) mod 100 < pct. At 100 TB the codebook build must not
    * cost O(iters × corpus) — real IVF trainers (FAISS et al.) learn
    * centroids on a few-percent sample and run the FULL corpus only
    * through the final one-pass assignment; this is that split
    * (reference analog: `train_model.py:28-46`'s batch-train /
    * stream-infer separation). pct=100 short-circuits to the identity
    * so full-corpus training stays available.
    */
  private[graft] def trainSample(v: DataFrame, pct: Int): DataFrame =
    if (pct >= 100) v
    else v.filter(pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10)
      .cast("long"), lit(100L)) < pct)

  /** Lloyd-iterated codebook: seed with label means, then `iters`
    * rounds of (assign to nearest centroid → recompute cell means).
    * Deterministic end to end (no random init, rounded-cosine ranking
    * with a cell tie-break, hash-gated sampling), so the DuckDB oracle
    * reproduces the exact codebook by unrolling the same iterations over
    * the same sample. Each round is one map-only assignment pass + one
    * O(cells) aggregation over the TRAINING SAMPLE only — the standard
    * distributed k-means shape, with iteration cost decoupled from
    * corpus size; cells that lose all members drop out of the codebook
    * on both engines identically.
    */
  private def kmeansCentroids(v: DataFrame, iters: Int,
      samplePct: Int = 100): DataFrame = {
    val spark = v.sparkSession
    val t = trainSample(v, samplePct)
    var cent = labelCentroids(t)
    val sums = (1 to dim).map(qsumAt)
    for (_ <- 0 until iters) {
      val assigned = withRankedCells(t, cent)
        .withColumn("cell", col("cells").getItem(0))
        .select(col("cell"), col("e"))
      cent = withQv(assigned).groupBy(col("cell"))
        .agg(count(lit(1)).as("_n"), sums: _*)
        .select(col("cell"), meanCols(col("_n")).as("ce"))
        .withColumn("cnrm", VectorOps.norm(spark, col("ce")))
    }
    cent
  }

  /** Inverted-file probe + exact rerank given a codebook. */
  private def probeTopK(v: DataFrame, centroids: DataFrame,
      nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val spark = v.sparkSession
    val withCells = withRankedCells(v, centroids)
    // inverted lists: nearest cell per vector
    val assigned = withCells
      .withColumn("cell", col("cells").getItem(0))
      .select(col("vec_id"), col("e"), col("nrm"), col("cell"))
    // probe lists: nprobe nearest cells per query (queries are a pruned
    // scan — the vec_id predicate pushes to parquet)
    val q = withCells.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"),
        explode(slice(col("cells"), 1, nprobe)).as("cell"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosPair(spark))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  def ivfTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10, nprobe: Int = 2): DataFrame = {
    // (vec_id, e, nrm) feeds the codebook agg AND the probe join — cache
    // it so the parquet scan + norm derivation run once, not per consumer
    val v = vecFrame(vectors).cache()
    probeTopK(v, labelCentroids(v), nQueries, k, nprobe)
  }

  /** Corpus (vec_id, e, nrm) frame cached ONCE per corpus dir and shared
    * by every IVF-family query in the session — repeated invocations
    * reuse one cached block set instead of stacking a fresh cache per
    * call (the production "persist the vector table" shape).
    */
  private val vecMemo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** PQ codebooks memoized per (corpus dir, m) — see `ivfPqFromFrame`. */
  private val pqCbMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Int), DataFrame]

  /** Trained k-means codebooks memoized per (corpus dir, iters, pct) —
    * a trained codebook is a PERSISTED artifact in production (FAISS
    * index training), so repeated queries reuse one cached O(cells)
    * frame instead of re-running Lloyd rounds and stacking a fresh
    * cache entry per invocation (the same treatment [[pqCbMemo]] gives
    * the PQ codebooks).
    */
  private val kmCbMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), DataFrame]

  private[graft] def sharedVecFrame(s: SparkSession, d: String): DataFrame =
    vecMemo.getOrElseUpdate(d, vecFrame(Tables.embeddings(s, d)).cache())

  /** Evict every per-corpus memo (see [[graft.Caches]]): unpersist the
    * cache()-backed frames, drop all references so localCheckpoint
    * blocks are ContextCleaner-collectable. Memos rebuild on next touch.
    */
  private[graft] def clearCaches(): Unit = {
    vecMemo.values.foreach(_.unpersist(blocking = false))
    pqCbMemo.values.foreach(_.unpersist(blocking = false))
    kmCbMemo.values.foreach(_.unpersist(blocking = false))
    vecMemo.clear(); pqCbMemo.clear(); kmCbMemo.clear()
    embedPairMemo.clear(); embedClusterMemo.clear()
  }

  /** IVF with a genuinely LEARNED codebook: Lloyd-iterated k-means
    * centroids instead of the label means — proving the codebook swap
    * changes only the derivation, not the search plan.
    */
  def kmeansTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10,
      nprobe: Int = 2, iters: Int = 2, samplePct: Int = 100): DataFrame = {
    // every Lloyd iteration re-reads the training frame: cache the corpus
    // once (O(N·dim) doubles — the same thing a production k-means persists)
    val v = vecFrame(vectors).cache()
    probeTopK(v, kmeansCentroids(v, iters, samplePct).cache(), nQueries, k, nprobe)
  }

  /** Spec hook: train the codebook on an explicit `train` frame (no
    * sampling) while probing `corpus` — lets tests prove that hash-gated
    * sampled training is EQUIVALENT to training on the pre-filtered
    * frame, i.e. the training scan reads only the sample.
    */
  private[graft] def probeTopKForSpec(corpus: DataFrame, train: DataFrame,
      iters: Int, nQueries: Int, k: Int, nprobe: Int): DataFrame =
    probeTopK(vecFrame(corpus), kmeansCentroids(vecFrame(train), iters),
      nQueries, k, nprobe)

  def ivfTopKOracle(nQueries: Int = 5, k: Int = 10, nprobe: Int = 2): String =
    s"""WITH c AS (
       |  SELECT label AS cell, list(m ORDER BY i) AS ce
       |  FROM (
       |    SELECT label, i, CAST(sum(CAST(round(v * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / count(v) AS m
       |    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
       |                 unnest(range(1, 1 + len(embedding))) AS i
       |          FROM embeddings)
       |    GROUP BY 1, 2
       |  ) GROUP BY label
       |), ranked AS (
       |  SELECT e.vec_id, e.embedding, c.cell,
       |         row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
       |                    c.cell) AS crank
       |  FROM embeddings e CROSS JOIN c
       |), assigned AS (
       |  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, embedding AS qemb, cell
       |  FROM ranked WHERE vec_id < $nQueries AND crank <= $nprobe
       |)
       |SELECT query_id, vec_id, cos, rank
       |FROM (
       |  SELECT p.query_id, v.vec_id,
       |         round(list_cosine_similarity(p.qemb::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cos,
       |         row_number() OVER (
       |           PARTITION BY p.query_id
       |           ORDER BY round(list_cosine_similarity(p.qemb::DOUBLE[], v.embedding::DOUBLE[]), 6) DESC,
       |                    v.vec_id) AS rank
       |  FROM assigned v JOIN probes p ON v.cell = p.cell
       |  WHERE v.vec_id != p.query_id
       |)
       |WHERE rank <= $k""".stripMargin

  /** Oracle for the k-means IVF: the Lloyd iterations are UNROLLED as
    * chained CTEs (assign → recompute means) over the SAME md5-gated
    * training sample as the Spark side, so DuckDB derives the
    * byte-identical codebook before the same probe/rerank as the plain
    * IVF oracle — the final assignment/probe CTEs read the full corpus,
    * mirroring the sample-train / full-assign split.
    */
  def kmeansTopKOracle(nQueries: Int = 5, k: Int = 10, nprobe: Int = 2,
      iters: Int = 2, samplePct: Int = 100): String = {
    def means(name: String, src: String, keyCol: String) =
      s"""$name AS (
         |  SELECT $keyCol AS cell, list(m ORDER BY i) AS ce
         |  FROM (
         |    SELECT $keyCol, i, CAST(sum(CAST(round(v * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / count(v) AS m
         |    FROM (SELECT $keyCol, unnest(embedding::DOUBLE[]) AS v,
         |                 unnest(range(1, 1 + len(embedding))) AS i
         |          FROM $src)
         |    GROUP BY 1, 2
         |  ) GROUP BY 1
         |)"""
    def assign(name: String, cent: String) =
      s"""$name AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
         |                      c.cell) AS rk
         |    FROM train e CROSS JOIN $cent c
         |  ) WHERE rk = 1
         |)"""
    val trainCte =
      s"""train AS (
         |  SELECT * FROM embeddings
         |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 4))::BIGINT % 100 < $samplePct
         |)"""
    val iterCtes = (1 to iters).flatMap { n =>
      Seq(assign(s"a$n", s"c${n - 1}"), means(s"c$n", s"a$n", "cell"))
    }
    val ctes = (Seq(trainCte, means("c0", "train", "label")) ++ iterCtes).mkString(",\n")
    s"""WITH $ctes,
       |ranked AS (
       |  SELECT e.vec_id, e.embedding, c.cell,
       |         row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
       |                    c.cell) AS crank
       |  FROM embeddings e CROSS JOIN c$iters c
       |), assigned AS (
       |  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, embedding AS qemb, cell
       |  FROM ranked WHERE vec_id < $nQueries AND crank <= $nprobe
       |)
       |SELECT query_id, vec_id, cos, rank
       |FROM (
       |  SELECT p.query_id, v.vec_id,
       |         round(list_cosine_similarity(p.qemb::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cos,
       |         row_number() OVER (
       |           PARTITION BY p.query_id
       |           ORDER BY round(list_cosine_similarity(p.qemb::DOUBLE[], v.embedding::DOUBLE[]), 6) DESC,
       |                    v.vec_id) AS rank
       |  FROM assigned v JOIN probes p ON v.cell = p.cell
       |  WHERE v.vec_id != p.query_id
       |)
       |WHERE rank <= $k""".stripMargin
  }

  /** Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold) with
    * EXACT results and no quadratic join: metric blocking (ball-cover
    * pruning) on the angular distance.
    *
    * Every vector belongs to a cell (here: its label; at larger scale a
    * k-means cell id — same plan). For each cell we keep its mean
    * vector and angular radius r = max arccos(cos(member, centroid)).
    * The spherical triangle inequality gives, for a pair (a, b) in
    * cells (i, j): θ(a,b) ≥ θ(cᵢ,cⱼ) − rᵢ − rⱼ, so any true pair with
    * θ(a,b) ≤ arccos(threshold) lives in a cell pair with
    * θ(cᵢ,cⱼ) ≤ arccos(threshold) + rᵢ + rⱼ. Candidates are generated
    * ONLY for those admissible cell pairs (a float-slack ε keeps the
    * bound safe), then verified with the exact rounded cosine — so the
    * result equals the N²/2 truth (the DuckDB oracle) by construction.
    *
    * Plan shape: centroid/radius derivation is one groupBy over the
    * corpus; the admissibility table is a tiny broadcast equi-join (on
    * a constant key — a BroadcastHashJoin, not a nested loop); the
    * candidate join is corpus ⋈ admissible ⋈ corpus, all equi-joins.
    * No CartesianProduct, no BroadcastNestedLoopJoin anywhere — at
    * 100× the corpus this shuffles by cell instead of exploding N²/2
    * pairs, and pruning tightens as cells get finer.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double = 0.4): DataFrame = {
    val spark = vectors.sparkSession
    val v = vectors.select(col("vec_id"), col("label").as("cell"),
      col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(spark, col("e")))
    // dim-agnostic: positions past a vector's length average to null →
    // coalesced to 0.0, which is inert in every norm/dot downstream
    // (the dot truncates to the shorter operand anyway)
    val dim = 64
    val sums = (1 to dim).map(i => coalesce(avg(try_element_at(col("e"), lit(i))), lit(0.0)).as(s"c_$i"))
    val centroids = v.groupBy(col("cell")).agg(sums.head, sums.tail: _*)
      .select(col("cell"), array((1 to dim).map(i => col(s"c_$i")): _*).as("ce"))
      .withColumn("cnrm", VectorOps.norm(spark, col("ce")))
    // clamp before arccos: float drift can push |cos| a hair past 1
    def ang(cos: Column): Column = acos(greatest(lit(-1.0), least(lit(1.0), cos)))
    // one pass: the radius agg carries the (constant-per-cell) centroid
    // columns through with first(), so no join-back is needed. O(cells)
    // rows by construction — cached so the two corpus aggregation
    // passes behind it run once, not once per consumer (aSide, bSide).
    val cellGeo = v.join(broadcast(centroids), "cell")
      .groupBy(col("cell"))
      .agg(
        max(ang(VectorOps.dot(spark, col("e"), col("ce")) / (col("nrm") * col("cnrm")))).as("r"),
        first(col("ce")).as("ce"), first(col("cnrm")).as("cnrm"))
      .cache()
    // the all-pairs key is constant at runtime but DERIVED FROM DATA
    // (pmod(cell, 1) = 0): a literal key would constant-fold to `true`
    // and the planner would fall back to a nested-loop join — this way
    // the O(cells²) pairing stays a BroadcastHashJoin on a tiny side
    val aSide = cellGeo.select(col("cell").as("cell_a"), col("ce").as("ce_a"),
      col("cnrm").as("na"), col("r").as("ra"), pmod(col("cell"), lit(1)).as("k"))
    val bSide = cellGeo.select(col("cell").as("cell_b"), col("ce").as("ce_b"),
      col("cnrm").as("nb"), col("r").as("rb"), pmod(col("cell"), lit(1)).as("k"))
    val thetaMax = math.acos(threshold)
    val admissible = aSide.join(bSide, "k")
      .filter(ang(VectorOps.dot(spark, col("ce_a"), col("ce_b")) / (col("na") * col("nb")))
        <= lit(thetaMax) + col("ra") + col("rb") + lit(1e-6))
      .select(col("cell_a"), col("cell_b"))
    val a = v.select(col("vec_id"), col("e"), col("nrm"), col("cell").as("cell_a"))
    val b = v.select(col("vec_id").as("vec_b"), col("e").as("qe"),
      col("nrm").as("qnrm"), col("cell").as("cell_b"))
    // the pair evaluation is the hot loop: spread the stream side over
    // the cluster first — with an EXPLICIT partition count, because an
    // AQE-coalescible repartition sees only the tiny pre-join row count
    // and collapses to one partition, pinning every candidate dot
    // product on a single core
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    a.join(broadcast(admissible), "cell_a")
      .repartition(parts, col("vec_id"))
      .join(b, "cell_b")
      .filter(col("vec_id") < col("vec_b"))
      .withColumn("cos", cosPair(spark))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("vec_a"), col("vec_b"), col("cos"))
  }

  def nearDupPairsOracle(threshold: Double = 0.4): String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= $threshold""".stripMargin

  /** Near-dup THRESHOLD SWEEP — the knob-tuning report run before
    * fixing the dedup cutoff: per 0.05-cosine bin, the verified pair
    * count and the cumulative pairs at-or-above the bin (= exactly how
    * many pairs each candidate threshold would merge). Operates on the
    * already-verified pair frame (the memoized/persisted artifact the
    * cluster and survivor queries read), so the sweep costs one tiny
    * aggregation — no corpus pass, no re-verification per candidate
    * threshold. Binning divides the 6dp-rounded cosine by the literal
    * step in IEEE doubles, so both engines land boundary values in the
    * same bin by construction; the window runs over ~a dozen bin rows.
    */
  def nearDupThresholdSweep(pairs: DataFrame, step: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairs
      .withColumn("bin", floor(col("cos") / step).cast("bigint"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("bin_lo", round(col("bin") * step, 2))
      .withColumn("cum_pairs", sum(col("n_pairs")).over(w).cast("bigint"))
      .select(col("bin_lo"), col("n_pairs"), col("cum_pairs"))
  }

  def nearDupThresholdSweepOracle(threshold: Double = 0.4, step: Double = 0.05): String =
    s"""WITH p AS (
       |  ${nearDupPairsOracle(threshold).replace("\n", "\n       |  ")}
       |), b AS (
       |  SELECT CAST(floor(cos / $step) AS BIGINT) AS bin, count(*) AS n_pairs
       |  FROM p GROUP BY 1
       |)
       |SELECT round(bin * $step, 2) AS bin_lo, n_pairs,
       |       CAST(sum(n_pairs) OVER (ORDER BY bin DESC
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pairs
       |FROM b""".stripMargin

  /** Per-label centroid similarity: groupwise mean vector, then cosine
    * of each vector to its label centroid (avg pooling — the reduction
    * a training pipeline uses for cluster quality).
    */
  def centroidSimilarity(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    // label selected in the same projection as the cast — no join-back
    // (which would scan the corpus a second time)
    val v = vectors.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(spark, col("e")))
    val sums = (1 to dim).map(qsumAt)
    val centroids = withQv(v).groupBy(col("label"))
      .agg(count(lit(1)).as("_n"), sums: _*)
      .select(col("label"), meanCols(col("_n")).as("qe"))
      .withColumn("qnrm", VectorOps.norm(spark, col("qe")))
    // round-once rule: avg over the RAW cosine (avg-of-rounded sits on
    // half-boundaries where engine ulp drift flips digits); min over the
    // rounded value is exact (order-insensitive).
    v.join(broadcast(centroids), "label")
      .withColumn("cos_raw", cosRaw(spark))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("cos_raw")), 4).as("avg_cos"),
        round(min(round(col("cos_raw"), 4)), 4).as("min_cos"))
  }

  val centroidSimilarityOracle: String =
    """WITH c AS (
      |  SELECT label, list(m ORDER BY i) AS centroid
      |  FROM (
      |    SELECT label, i, CAST(sum(CAST(round(v * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / count(v) AS m
      |    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
      |                 unnest(range(1, 1 + len(embedding))) AS i
      |          FROM embeddings)
      |    GROUP BY 1, 2
      |  ) GROUP BY label
      |)
      |SELECT e.label, count(*) AS n,
      |       round(avg(cos_raw), 4) AS avg_cos,
      |       round(min(round(cos_raw, 4)), 4) AS min_cos
      |FROM (
      |  SELECT e.label,
      |         list_cosine_similarity(e.embedding::DOUBLE[], c.centroid::DOUBLE[]) AS cos_raw
      |  FROM embeddings e JOIN c ON e.label = c.label
      |) e
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------- recall report

  /** Recall@k accounting for the approximate indexes against the exact
    * brute-force truth — the acceptance metric any ANN deployment
    * tracks before switching the approximate path on. One row per
    * (method, query): how many of the true top-k the index returned.
    *
    * Scale shape: the truth and approximate result sets are
    * (nQueries·k)-sized — vanishing next to the corpus — so the joins
    * here are trivially broadcastable; the real cost is the underlying
    * searches themselves, which keep their own documented shapes. The
    * tie-break (cos DESC, vec_id) makes both sides deterministic, so
    * recall is exact and engine-independent.
    */
  def annRecall(vectors: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    // cached: both union arms read the truth set — without the cache the
    // exact brute-force search (the expensive side) would run twice
    val truth = bruteForceTopK(vectors, nQueries, k).select(col("query_id"), col("vec_id")).cache()
    def recallOf(name: String, approx: DataFrame): DataFrame =
      truth.join(approx.select(col("query_id"), col("vec_id")).withColumn("hit", lit(1)),
          Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_hit"))
        .select(lit(name).as("method"), col("query_id"), col("n_true"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_true"), 6).as("recall"))
    recallOf("bucketed", bucketedTopK(vectors, nQueries, k))
      .unionAll(recallOf("multiprobe", multiProbeTopK(vectors, nQueries, k)))
      // the compressed ADC path: the acceptance gate a user reads before
      // trusting the PQ index — ranked by approximate distance, measured
      // here against exact-cosine truth
      .unionAll(recallOf("ivfpq", ivfPqTopK(vectors, nQueries, k)))
  }

  def annRecallOracle(nQueries: Int = 5, k: Int = 10): String = {
    def arm(name: String, cte: String) =
      s"""SELECT '$name' AS method, t.query_id,
         |       CAST(count(*) AS BIGINT) AS n_true,
         |       CAST(count($cte.vec_id) AS BIGINT) AS n_hit,
         |       round(count($cte.vec_id)::DOUBLE / count(*), 6) AS recall
         |FROM truth t LEFT JOIN $cte USING (query_id, vec_id)
         |GROUP BY 2""".stripMargin
    s"""WITH truth AS (
       |  ${bruteForceTopKOracle(nQueries, k).replace("\n", "\n       |  ")}
       |), b AS (
       |  ${bucketedTopKOracle(nQueries, k).replace("\n", "\n       |  ")}
       |), m AS (
       |  ${multiProbeTopKOracle(nQueries, k).replace("\n", "\n       |  ")}
       |), pq AS (
       |  ${ivfPqTopKOracle(nQueries, k).replace("\n", "\n       |  ")}
       |)
       |${arm("bucketed", "b")}
       |UNION ALL
       |${arm("multiprobe", "m")}
       |UNION ALL
       |${arm("ivfpq", "pq")}""".stripMargin
  }

  // --------------------------------------------------- int8 quantization

  /** Symmetric int8 quantization of the embedding column — the storage/
    * bandwidth path of an ANN index at scale (4× smaller vectors, SIMD
    * int8 dot products downstream). Per vector: scale = max|x|/127, code
    * q_i = round(x_i/scale) ∈ [-127, 127]. Output per vector: the scale
    * and the reconstruction error NORMALIZED by scale² (`nmse`, ≈1/12
    * for uniform rounding error — unit-free, so coarse rounding absorbs
    * float summation-order drift between engines without erasing the
    * signal; raw MSE at ~1e-6 would round to nothing).
    *
    * Scale shape: map-only, no exchange anywhere, and the per-vector
    * max/error folds run in the native codegen'd `graft_quantstats`
    * expression — one JVM pass per row instead of two interpreted
    * higher-order lambdas. The 1e-12 guard keeps a zero vector from
    * dividing by zero (its codes are all zero).
    */
  def quantize(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    vectors.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("qs", graft.functions.QuantStats.quantStats(spark, col("e")))
      .select(col("vec_id"),
        round(element_at(col("qs"), 1), 8).as("qscale"),
        round(element_at(col("qs"), 2), 4).as("nmse"))
  }

  val quantizeOracle: String =
    """SELECT vec_id, round(mx / 127, 8) AS qscale,
      |       round(list_sum(list_transform(e, x ->
      |                pow(x - round(x / (mx / 127)) * (mx / 127), 2)))
      |             / (len(e) * pow(mx / 127, 2)), 4) AS nmse
      |FROM (SELECT vec_id, embedding::DOUBLE[] AS e,
      |             greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 1e-12) AS mx
      |      FROM embeddings)""".stripMargin

  // --------------------------------------------------- incremental index

  /** INCREMENTAL IVF index maintenance — the serving-index freshness
    * loop: a new vector batch is appended to an existing index by
    * assigning each new vector to its nearest EXISTING centroid (the
    * codebook is NOT rebuilt — production rebuilds are rare, expensive,
    * offline events; appends happen continuously). The report is the
    * signal an index operator watches per cell: list growth (n_index →
    * n_index + n_new) and assignment quality (mean cosine of the new
    * vectors to their centroid vs the index's own mean) — a cell whose
    * new_mean_cos sags below idx_mean_cos is drifting away from its
    * centroid, the trigger for the next offline rebuild.
    *
    * Scale: the codebook is one broadcast row (same as every IVF
    * operator here); BOTH assignment passes are map-only (native
    * `graft_rankcells`, no corpus shuffle), and the only exchange is
    * the O(cells)-sized final aggregate. Cost scales with index+batch
    * scan, state with cells.
    */
  def ivfAppend(index: DataFrame, batch: DataFrame): DataFrame = {
    val spark = index.sparkSession
    val cent = labelCentroids(vecFrame(index))
    val tagged = vecFrame(index).withColumn("side", lit("idx"))
      .union(vecFrame(batch).withColumn("side", lit("new")))
    withRankedCells(tagged, cent)
      .withColumn("cell", col("cells").getItem(0))
      .select(col("side"), col("cell"), col("e"), col("nrm"))
      .join(broadcast(cent.select(col("cell").cast("bigint").as("cell"),
        col("ce").as("qe"), col("cnrm").as("qnrm"))), "cell")
      .withColumn("cos", cosPair(spark))
      .groupBy(col("cell"))
      .agg(
        sum(when(col("side") === "idx", 1L).otherwise(0L)).as("n_index"),
        sum(when(col("side") === "new", 1L).otherwise(0L)).as("n_new"),
        // EXACT decimal-summed means: the per-cell mean of (6dp-rounded)
        // cosines can land exactly on a 6dp half-boundary, where a
        // double avg's partial-sum order flips the rounded digit
        // between runs — measured: selfcheck flaked ~30% on exactly one
        // cell of this fixture. Decimal sums are order-insensitive.
        round(coalesce(
          sum(when(col("side") === "idx", col("cos")).cast("decimal(18,12)"))
            .cast("double") / count(when(col("side") === "idx", col("cos"))),
          lit(0.0)), 6).as("idx_mean_cos"),
        round(coalesce(
          sum(when(col("side") === "new", col("cos")).cast("decimal(18,12)"))
            .cast("double") / count(when(col("side") === "new", col("cos"))),
          lit(0.0)), 6).as("new_mean_cos"))
  }

  /** Oracle twin: index = vec_id % 5 != 4, batch = the remaining 20%. */
  def ivfAppendOracle: String =
    s"""WITH idx AS (SELECT * FROM embeddings WHERE vec_id % 5 != 4),
       |c AS (
       |  SELECT label AS cell, list(m ORDER BY i) AS ce
       |  FROM (
       |    SELECT label, i, CAST(sum(CAST(round(v * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / count(v) AS m
       |    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
       |                 unnest(range(1, 1 + len(embedding))) AS i
       |          FROM idx)
       |    GROUP BY 1, 2
       |  ) GROUP BY label
       |), ranked AS (
       |  SELECT e.vec_id, e.vec_id % 5 = 4 AS is_new, c.cell,
       |         round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) AS cos,
       |         row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
       |                    c.cell) AS crank
       |  FROM embeddings e CROSS JOIN c
       |)
       |SELECT CAST(cell AS BIGINT) AS cell,
       |       CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
       |       CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |       round(coalesce(CAST(sum(CAST(CASE WHEN NOT is_new THEN cos END AS DECIMAL(18,12))) AS DOUBLE)
       |                        / count(CASE WHEN NOT is_new THEN cos END), 0.0), 6) AS idx_mean_cos,
       |       round(coalesce(CAST(sum(CAST(CASE WHEN is_new THEN cos END AS DECIMAL(18,12))) AS DOUBLE)
       |                        / count(CASE WHEN is_new THEN cos END), 0.0), 6) AS new_mean_cos
       |FROM ranked WHERE crank = 1
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------- semantic dedup

  /** SEMANTIC dedup clusters: connected components over the verified
    * embedding near-dup pair graph — `Dedup.dupClustersFromPairs`
    * (min-label propagation + pointer jumping, O(log n) rounds)
    * applied unchanged to `nearDupPairs`' output. The text and
    * embedding dedup stacks share one clustering engine; only the
    * pair-generation front end differs (shingle LSH vs metric-blocked
    * cosine).
    */
  def embedClusters(vectors: DataFrame, threshold: Double = 0.4): DataFrame =
    clustersFromVecPairs(nearDupPairs(vectors, threshold))

  /** The single pairs→clusters adapter (column renames + the shared
    * clustering engine) — used by both the public operator and the
    * memoized query path.
    */
  private def clustersFromVecPairs(pairs: DataFrame): DataFrame =
    graft.ext.Dedup.dupClustersFromPairs(
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))

  def embedClustersOracle(threshold: Double = 0.4): String =
    s"""WITH RECURSIVE pairs AS (
       |  ${nearDupPairsOracle(threshold).replace("\n", "\n       |  ")}
       |), edges AS (
       |  SELECT vec_a AS s, vec_b AS d FROM pairs
       |  UNION
       |  SELECT vec_b, vec_a FROM pairs
       |), reach(v, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.v
       |)
       |SELECT v AS vec_id, min(r) AS cluster_id FROM reach GROUP BY v""".stripMargin

  /** Semantic-dedup survivor accounting per label: one vector (the
    * cluster-min) survives each cluster. Same shape as the text
    * `clusterSurvivors` — the label frame is pair-graph-sized, so the
    * corpus join broadcasts when small and shuffles when not.
    */
  def embedSurvivors(vectors: DataFrame, clusters: DataFrame): DataFrame =
    vectors.select(col("vec_id"), col("label"))
      .join(clusters, Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        count(col("cluster_id")).as("n_clustered"),
        sum(when(col("cluster_id").isNotNull && col("cluster_id") =!= col("vec_id"), 1L)
          .otherwise(0L)).cast("bigint").as("n_dropped"))
      .withColumn("n_kept", col("n_vecs") - col("n_dropped"))

  def embedSurvivorsOracle(threshold: Double = 0.4): String =
    s"""WITH clusters AS (
       |  ${embedClustersOracle(threshold).replace("\n", "\n       |  ")}
       |)
       |SELECT label, count(*) AS n_vecs,
       |       count(cluster_id) AS n_clustered,
       |       CAST(sum(CASE WHEN cluster_id IS NOT NULL AND cluster_id != vec_id
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       count(*) - CAST(sum(CASE WHEN cluster_id IS NOT NULL AND cluster_id != vec_id
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM embeddings LEFT JOIN clusters USING (vec_id)
       |GROUP BY 1""".stripMargin

  /** Pair set and clusters memoized per corpus dir — the production
    * shape (pairs computed once, written, read by the near-dup report,
    * the clustering, and the survivor accounting); the single-node
    * analog is one localCheckpoint'd frame shared by all three
    * queries, with first-touch bench attribution like the text-side
    * near-dup memo.
    */
  private val embedPairMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def embedPairsFor(s: SparkSession, d: String): DataFrame =
    embedPairMemo.getOrElseUpdate(d,
      nearDupPairs(Tables.embeddings(s, d)).localCheckpoint())

  private val embedClusterMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def embedClustersFor(s: SparkSession, d: String): DataFrame =
    embedClusterMemo.getOrElseUpdate(d, clustersFromVecPairs(embedPairsFor(s, d)))

  // ------------------------------------------------ product quantization

  /** Product quantization — the index-compression workhorse of
    * billion-vector ANN (FAISS-style IVF-PQ): split each vector into
    * `m` subvectors, learn a small per-subspace codebook, store each
    * vector as `m` small codes. Codebooks here are the per-label
    * subvector means — the same deterministic-seed trick the IVF
    * codebook uses, so the DuckDB oracle rebuilds them exactly; code
    * selection ranks the ROUNDED (6dp) squared L2 distance with a
    * code-id tie-break (the cross-engine determinism rule used by
    * every ranking in this file).
    *
    * Output per vector: the packed code string (`m` codes — with
    * K=10 codes/subspace and m=8 that is 64 doubles → 8 digits) and
    * the total quantization error.
    *
    * Scale shape: one O(K·dim) aggregation builds the codebooks
    * (K·m·sub cells), packed into ONE broadcast row; assignment is a
    * map-only pass — the corpus is never shuffled, exactly like
    * `withRankedCells`. The per-row cost is m·K·sub multiply-adds in
    * ONE native `graft_pqassign` call (the `graft_rankcells`
    * HOF→native upgrade path, exercised: the composed transform-argmin
    * form paid an interpreted lambda dispatch per codebook entry and a
    * planning/codegen cost proportional to the unrolled tree).
    */
  /** One-row PQ codebook frame: for each subspace `s`, `cb_s` is the
    * code-ORDERED array of (code, sub-centroid) structs — positional
    * lookup by code works because codes are the 0-based contiguous
    * labels. All m codebooks build in ONE aggregation pass.
    */
  private def pqCodebookFrame(v: DataFrame, m: Int): DataFrame = {
    val sub = dim / m
    val sums = for { s <- 0 until m; i <- 1 to sub }
      yield qsum(s * sub + i).as(s"s_${s}_$i")
    val cents = withQv(v).groupBy(col("label"))
      .agg(count(lit(1)).as("_n"), sums: _*)
    def mean(s: Int, i: Int): Column =
      col(s"s_${s}_$i").cast("double") / lit(1.0e12) / col("_n")
    val cbCols = (0 until m).map { s =>
      sort_array(collect_list(struct(col("label").cast("int").as("code"),
        array((1 to sub).map(i => mean(s, i)): _*).as("c")))).as(s"cb_$s")
    }
    cents.agg(cbCols.head, cbCols.tail: _*)
  }

  /** The m subspace codebook columns packed as ONE array argument for
    * the native kernels (`graft_pqassign` / `graft_pqadc`).
    */
  private def pqCbsArr(m: Int): Column =
    array((0 until m).map(s => col(s"cb_$s")): _*)

  def pqQuantize(vectors: DataFrame, m: Int = 8): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val spark = vectors.sparkSession
    val v = vectors.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("e"))
    val codebook = pqCodebookFrame(v, m)
    // assignment = one native call per row (argmin over every subspace
    // codebook in a single JVM pass — graft_pqassign replaces the m
    // interpreted transform-HOF argmins); the codes and err consumers
    // share the call through whole-stage codegen's subexpression
    // elimination, so no Generate barrier is needed
    val pa = graft.functions.PqOps.pqAssign(spark, col("e"), pqCbsArr(m))
    v.crossJoin(broadcast(codebook))
      .select(col("vec_id"),
        concat_ws(",", pa.getField("codes").cast("array<string>")).as("codes"),
        pa.getField("err").as("recon_err"))
  }

  def pqQuantizeOracle(m: Int = 8): String = {
    val sub = dim / m
    def centsSql = (for { s <- 0 until m; i <- 1 to sub }
      yield s"avg(e[${s * sub + i}]) AS c_${s}_$i").mkString(",\n|         ")
    def pickSql(s: Int) = {
      val d = (1 to sub)
        .map(i => s"(v.e[${s * sub + i}] - c.c_${s}_$i) * (v.e[${s * sub + i}] - c.c_${s}_$i)")
        .mkString(" + ")
      s"""p$s AS (
         |  SELECT vec_id, c.label AS code, round($d, 6) AS d
         |  FROM v CROSS JOIN cents c
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |                             ORDER BY round($d, 6), c.label) = 1
         |)"""
    }
    val joins = (1 until m).map(s => s"JOIN p$s USING (vec_id)").mkString(" ")
    val codes = (0 until m).map(s => s"CAST(p$s.code AS VARCHAR)").mkString(" || ',' || ")
    val errs = (0 until m).map(s => s"p$s.d").mkString(" + ")
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (
       |  SELECT label,
       |         $centsSql
       |  FROM v GROUP BY label
       |),
       |${(0 until m).map(pickSql).mkString(",\n|")}
       |SELECT vec_id, $codes AS codes, round($errs, 6) AS recon_err
       |FROM p0 $joins""".stripMargin
  }

  /** IVF-PQ — the composed billion-vector search pipeline (FAISS's
    * workhorse index): the IVF coarse codebook routes queries to
    * `nprobe` cells and prunes the corpus to inverted lists, and
    * within probed cells candidates are scored by ASYMMETRIC DISTANCE
    * (ADC): the query's exact subvectors against each candidate's PQ
    * sub-centroids — so candidate vectors are never touched, only
    * their m-byte codes. Ranking uses the rounded ADC with a vec_id
    * tie-break (the standard determinism rule here).
    *
    * Scale shape: both codebooks are tiny broadcast rows; corpus
    * passes are map-only (cell routing + code assignment); the probe
    * join touches nprobe/cells of the CODES — 8 ints per candidate
    * instead of 64 doubles, the 32× read reduction that is PQ's whole
    * point. The full-precision corpus is needed only to BUILD the
    * index, never to serve a query.
    */
  def ivfPqTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10,
      nprobe: Int = 2, m: Int = 8): DataFrame =
    ivfPqFromFrame(vecFrame(vectors), nQueries, k, nprobe, m, memoKey = None)

  private def ivfPqFromFrame(v: DataFrame, nQueries: Int, k: Int,
      nprobe: Int, m: Int, memoKey: Option[String]): DataFrame = {
    val spark = v.sparkSession
    val withCells = withRankedCells(v, labelCentroids(v))
    // One row, consumed by two plan branches. The memo is keyed by the
    // STABLE corpus identifier (the table dir) — never by DataFrame
    // object identity, which a fresh public-API vecFrame would always
    // miss, stacking an un-unpersisted cache entry per call. On the
    // non-memoized path the codebook is localCheckpoint'd instead:
    // materialized once for both consumers, and its blocks are released
    // by the ContextCleaner when the frame goes out of scope (a
    // CacheManager entry would live until an explicit unpersist).
    val pqCb = memoKey match {
      case Some(d) => pqCbMemo.getOrElseUpdate((d, m), pqCodebookFrame(v, m).cache())
      case None    => pqCodebookFrame(v, m).localCheckpoint()
    }
    // inverted lists carry only (vec_id, cell, codes): the PQ-compressed
    // index — one map-only pass over the corpus, one native argmin call
    // per row (graft_pqassign)
    val cand = withCells
      .withColumn("cell", col("cells").getItem(0))
      .crossJoin(broadcast(pqCb))
      .select(col("vec_id"), col("cell"),
        graft.functions.PqOps.pqAssign(spark, col("e"), pqCbsArr(m))
          .getField("codes").as("codes"))
    val q = withCells.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        explode(slice(col("cells"), 1, nprobe)).as("cell"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc"), col("vec_id"))
    // graft_pqadc looks sub-centroids up BY CODE VALUE (map semantics,
    // null on a miss), not array position — a label with no vectors
    // would shift every later position and silently score against the
    // wrong centroid (the oracle joins by value, so only the Spark side
    // would be wrong)
    cand.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .crossJoin(broadcast(pqCb))
      .withColumn("adc", round(
        graft.functions.PqOps.pqAdc(spark, col("qe"), col("codes"), pqCbsArr(m)), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("adc"), col("rank"))
  }

  def ivfPqTopKOracle(nQueries: Int = 5, k: Int = 10,
      nprobe: Int = 2, m: Int = 8): String = {
    val sub = dim / m
    val centsSql = (for { s <- 0 until m; i <- 1 to sub }
      yield s"avg(e[${s * sub + i}]) AS c_${s}_$i").mkString(",\n|         ")
    def pickSql(s: Int) = {
      val d = (1 to sub)
        .map(i => s"(v.e[${s * sub + i}] - c.c_${s}_$i) * (v.e[${s * sub + i}] - c.c_${s}_$i)")
        .mkString(" + ")
      s"""p$s AS (
         |  SELECT vec_id, c.label AS code FROM v CROSS JOIN cents c
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |                             ORDER BY round($d, 6), c.label) = 1
         |)"""
    }
    val codeJoins = (0 until m)
      .map(s => s"JOIN p$s ON p$s.vec_id = a.vec_id").mkString(" ")
    val centJoins = (0 until m)
      .map(s => s"JOIN cents x$s ON x$s.label = p$s.code").mkString(" ")
    val adc = (for { s <- 0 until m; i <- 1 to sub } yield
      s"(q.e[${s * sub + i}] - x$s.c_${s}_$i) * (q.e[${s * sub + i}] - x$s.c_${s}_$i)")
      .mkString(" + ")
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
       |c AS (
       |  SELECT label AS cell, list(m ORDER BY i) AS ce
       |  FROM (
       |    SELECT label, i, avg(x) AS m
       |    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
       |                 unnest(range(1, 1 + len(embedding))) AS i
       |          FROM embeddings)
       |    GROUP BY 1, 2
       |  ) GROUP BY label
       |), ranked AS (
       |  SELECT e.vec_id, c.cell,
       |         row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
       |                    c.cell) AS crank
       |  FROM embeddings e CROSS JOIN c
       |), assigned AS (
       |  SELECT vec_id, cell FROM ranked WHERE crank = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, cell
       |  FROM ranked WHERE vec_id < $nQueries AND crank <= $nprobe
       |), cents AS (
       |  SELECT label,
       |         $centsSql
       |  FROM v GROUP BY label
       |),
       |${(0 until m).map(pickSql).mkString(",\n|")}
       |SELECT query_id, vec_id, adc, rank
       |FROM (
       |  SELECT p.query_id, a.vec_id, round($adc, 6) AS adc,
       |         row_number() OVER (PARTITION BY p.query_id
       |                            ORDER BY round($adc, 6), a.vec_id) AS rank
       |  FROM assigned a
       |  JOIN probes p ON a.cell = p.cell AND a.vec_id != p.query_id
       |  JOIN v q ON q.vec_id = p.query_id
       |  $codeJoins
       |  $centJoins
       |)
       |WHERE rank <= $k""".stripMargin
  }

  /** Hybrid retrieval with reciprocal-rank fusion (RRF): for each query
    * DOCUMENT (doc_id < nQueries; the embeddings table shares its id
    * space), fuse the dense cosine top-kEach ([[bruteForceTopK]]) with
    * the sparse BM25 top-kEach whose query terms are the query doc's
    * distinct tokens (more-like-this), via score = Σ_lists
    * 1/(rrfK + rank) — the standard fusion for lists with incomparable
    * scores. Each ranker keeps its own scale shape (broadcast query
    * rows / broadcast query terms; nothing widens); the fusion itself
    * is a union + one groupBy over ≤ 2·kEach·nQueries rows. At 100 TB
    * the dense half would swap in the IVF/PQ searcher — the fusion is
    * ranker-agnostic by construction (it reads only (query, doc, rank)).
    */
  def hybridRrf(docs: DataFrame, vectors: DataFrame, nQueries: Int = 3,
      kEach: Int = 20, k: Int = 10, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qterms = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(TextOps.tokens(lower(col("text"))))).as("term"))
    val sparse = TextOps.bm25Rank(docs, qterms, k = kEach, excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = bruteForceTopK(vectors, nQueries, kEach)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    sparse.unionByName(dense)
      .withColumn("c", lit(1.0) / (lit(rrfK) + col("rank")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c")), 6).as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf"), col("rank"))
  }

  def hybridRrfOracle(nQueries: Int = 3, kEach: Int = 20, k: Int = 10,
      rrfK: Int = 60, k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
       |), qt AS (
       |  SELECT DISTINCT doc_id AS query_id, term FROM tok WHERE doc_id < $nQueries
       |), dfq AS (
       |  SELECT term, count(*) AS df FROM tf
       |  WHERE term IN (SELECT term FROM qt) GROUP BY 1
       |), contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |         tf.tf * ${k1 + 1.0} /
       |         (tf.tf + $k1 * (${1.0 - b} + $b * dl.dl / s.avgdl)) AS c
       |  FROM tf
       |  JOIN qt ON tf.term = qt.term
       |  JOIN dfq ON tf.term = dfq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats s
       |), sparse AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT query_id, doc_id,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY score DESC, doc_id) AS rank
       |    FROM (SELECT query_id, doc_id, round(sum(c), 6) AS score
       |          FROM contrib WHERE doc_id != query_id GROUP BY 1, 2))
       |  WHERE rank <= $kEach
       |), dense AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT q.vec_id AS query_id, v.vec_id AS doc_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY $cosSql DESC, v.vec_id) AS rank
       |    FROM embeddings v
       |    CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < $nQueries) q
       |    WHERE v.vec_id != q.vec_id)
       |  WHERE rank <= $kEach
       |)
       |SELECT query_id, doc_id, rrf, rank FROM (
       |  SELECT query_id, doc_id, rrf,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY rrf DESC, doc_id) AS rank
       |  FROM (SELECT query_id, doc_id,
       |               round(sum(CAST(1.0 AS DOUBLE) / ($rrfK + rank)), 6) AS rrf
       |        FROM (SELECT * FROM sparse UNION ALL SELECT * FROM dense)
       |        GROUP BY 1, 2))
       |WHERE rank <= $k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rrf" -> ((s, d) =>
      hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))),
    "q_pq_quantize" -> ((s, d) => pqQuantize(Tables.embeddings(s, d))),
    "q_knn_ivfpq" -> ((s, d) =>
      ivfPqFromFrame(sharedVecFrame(s, d), nQueries = 5, k = 10, nprobe = 2, m = 8,
        memoKey = Some(d))),
    "q_knn_brute" -> ((s, d) => bruteForceTopK(Tables.embeddings(s, d))),
    "q_knn_bucketed" -> ((s, d) => bucketedTopK(Tables.embeddings(s, d))),
    "q_knn_multiprobe" -> ((s, d) => multiProbeTopK(Tables.embeddings(s, d))),
    "q_knn_ivf" -> ((s, d) => {
      val v = sharedVecFrame(s, d)
      probeTopK(v, labelCentroids(v), nQueries = 5, k = 10, nprobe = 2)
    }),
    "q_knn_kmeans" -> ((s, d) => {
      val v = sharedVecFrame(s, d)
      // codebook trained on the 60% md5 sample; full corpus only for the
      // final one-pass assignment inside probeTopK
      val cb = kmCbMemo.getOrElseUpdate((d, 2, 60),
        kmeansCentroids(v, iters = 2, samplePct = 60).cache())
      probeTopK(v, cb, nQueries = 5, k = 10, nprobe = 2)
    }),
    "q_ivf_append" -> ((s, d) => {
      val v = Tables.embeddings(s, d)
      ivfAppend(
        v.filter(pmod(col("vec_id"), lit(5)) =!= 4),
        v.filter(pmod(col("vec_id"), lit(5)) === 4))
    }),
    "q_embed_neardup" -> embedPairsFor _,
    "q_neardup_thresholds" -> ((s, d) => nearDupThresholdSweep(embedPairsFor(s, d))),
    "q_embed_clusters" -> embedClustersFor _,
    "q_embed_survivors" -> ((s, d) =>
      embedSurvivors(Tables.embeddings(s, d), embedClustersFor(s, d))),
    "q_embed_centroid" -> ((s, d) => centroidSimilarity(Tables.embeddings(s, d))),
    "q_embed_quantize" -> ((s, d) => quantize(Tables.embeddings(s, d))),
    "q_ann_recall" -> ((s, d) => annRecall(Tables.embeddings(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_hybrid_rrf" -> hybridRrfOracle(),
    "q_pq_quantize" -> pqQuantizeOracle(),
    "q_knn_ivfpq" -> ivfPqTopKOracle(),
    "q_knn_brute" -> bruteForceTopKOracle(),
    "q_knn_bucketed" -> bucketedTopKOracle(),
    "q_knn_multiprobe" -> multiProbeTopKOracle(),
    "q_knn_ivf" -> ivfTopKOracle(),
    "q_knn_kmeans" -> kmeansTopKOracle(samplePct = 60),
    "q_ivf_append" -> ivfAppendOracle,
    "q_embed_neardup" -> nearDupPairsOracle(),
    "q_neardup_thresholds" -> nearDupThresholdSweepOracle(),
    "q_embed_clusters" -> embedClustersOracle(),
    "q_embed_survivors" -> embedSurvivorsOracle(),
    "q_embed_centroid" -> centroidSimilarityOracle,
    "q_embed_quantize" -> quantizeOracle,
    "q_ann_recall" -> annRecallOracle()
  )
}
