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
  def ivfTopK(vectors: DataFrame, nQueries: Int = 5, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    val v = vectors.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(spark, col("e")))
    val dim = 64
    val sums = (1 to dim).map(i => avg(element_at(col("e"), i)).as(s"c_$i"))
    val centroids = v.groupBy(col("label")).agg(sums.head, sums.tail: _*)
      .select(col("label").as("cell"), array((1 to dim).map(i => col(s"c_$i")): _*).as("ce"))
      .withColumn("cnrm", VectorOps.norm(spark, col("ce")))
    // Pack the whole codebook into ONE broadcast row. Cell routing is
    // then a narrow per-row reduction over the packed array — the
    // corpus is NEVER shuffled for assignment (a row_number window over
    // vec_id would shuffle 100 TB to make a per-row decision). Ranking
    // sorts struct(-ccos, cell) ascending = cosine desc, cell asc —
    // identical tie-break to the oracle's ORDER BY.
    val codebook = centroids
      .agg(collect_list(struct(col("cell"), col("ce"), col("cnrm"))).as("cb"))
    val ranked = sort_array(transform(col("cb"), c =>
      struct(
        (round(VectorOps.dot(spark, col("e"), c.getField("ce")) /
          (col("nrm") * c.getField("cnrm")), 6) * -1).as("neg_ccos"),
        c.getField("cell").as("cell"))))
    val withCells = v.crossJoin(broadcast(codebook))
      .withColumn("cells", ranked)
    // inverted lists: nearest cell per vector
    val assigned = withCells
      .withColumn("cell", col("cells").getItem(0).getField("cell"))
      .select(col("vec_id"), col("e"), col("nrm"), col("cell"))
    // probe lists: nprobe nearest cells per query (queries are a pruned
    // scan — the vec_id predicate pushes to parquet)
    val q = withCells.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"),
        explode(transform(slice(col("cells"), 1, nprobe), c => c.getField("cell"))).as("cell"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosPair(spark))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  def ivfTopKOracle(nQueries: Int = 5, k: Int = 10, nprobe: Int = 2): String =
    s"""WITH c AS (
       |  SELECT label AS cell, list(m ORDER BY i) AS ce
       |  FROM (
       |    SELECT label, i, avg(v) AS m
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

  /** Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold).
    * Brute-force N²/2 candidate join at one dot per pair; the bucketed
    * LSH variant of the same predicate is `bucketedTopK`'s join shape.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double = 0.4): DataFrame = {
    val spark = vectors.sparkSession
    val v = emb(vectors)
    val b = v.select(col("vec_id").as("vec_b"), col("e").as("qe"), col("nrm").as("qnrm"))
    v.crossJoin(b)
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
    val dim = 64
    val sums = (1 to dim).map(i => avg(element_at(col("e"), i)).as(s"c_$i"))
    val centroids = v.groupBy(col("label")).agg(sums.head, sums.tail: _*)
      .select(col("label"), array((1 to dim).map(i => col(s"c_$i")): _*).as("qe"))
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
      |    SELECT label, i, avg(v) AS m
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> ((s, d) => bruteForceTopK(Tables.embeddings(s, d))),
    "q_knn_bucketed" -> ((s, d) => bucketedTopK(Tables.embeddings(s, d))),
    "q_knn_ivf" -> ((s, d) => ivfTopK(Tables.embeddings(s, d))),
    "q_embed_neardup" -> ((s, d) => nearDupPairs(Tables.embeddings(s, d))),
    "q_embed_centroid" -> ((s, d) => centroidSimilarity(Tables.embeddings(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "q_knn_brute" -> bruteForceTopKOracle(),
    "q_knn_bucketed" -> bucketedTopKOracle(),
    "q_knn_ivf" -> ivfTopKOracle(),
    "q_embed_neardup" -> nearDupPairsOracle(),
    "q_embed_centroid" -> centroidSimilarityOracle
  )
}
