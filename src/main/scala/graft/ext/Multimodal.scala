package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample are per-partition byte transforms.
  *
  * The real decode step (libjpeg/ffmpeg et al.) is NOT available in
  * this environment — `decodeStub` below is a clearly-marked
  * DETERMINISTIC FAKE that interprets the payload bytes as a row-major
  * 64-px-wide "image". Everything around it — schema, binary column
  * handling, partition-parallel `mapPartitions` shape, batch row
  * geometry — is the real plumbing a production decode would use.
  *
  * Scale notes (100 TB of blobs): payloads never hit the driver; the
  * decode runs inside `mapPartitions` (one iterator pass, no
  * materialization of the whole partition); metadata-only queries
  * project just the struct (column pruning keeps blob IO out of the
  * scan entirely when metadata is a separate column in parquet).
  */
object Multimodal {

  /** Attach the opaque payload + typed metadata. The corpus has no real
    * blobs, so the document text bytes stand in as the payload — the
    * engine-side handling (BinaryType column + metadata struct) is
    * exactly what an image/audio column would use.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        md5(col("text")).as("checksum")).as("meta"))

  /** Metadata-only scan: never touches payload bytes beyond the
    * pre-computed struct (blob IO pruned at the reader).
    */
  def metaQuery(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.checksum").as("checksum"))

  val metaOracle: String =
    """SELECT doc_id,
      |       'application/octet-stream' AS mime,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS checksum
      |FROM documents""".stripMargin

  /** Row type of the decode output (typed seam: the Product encoder
    * keeps the `mapPartitions` INSIDE the Dataset API — Catalyst sees a
    * SerializeFromObject with a known schema instead of an opaque RDD
    * re-assertion, so downstream pruning/pushdown still applies).
    */
  case class Decoded(doc_id: Long, width: Int, height: Int, mean_byte: Double)

  /** DECODE STUB — deterministic fake for the image decoder: treats the
    * payload as a row-major image of width min(64, n) and reports its
    * dimensions + mean pixel. A real build swaps the body for an actual
    * codec; the typed `Dataset.mapPartitions` contract (Iterator →
    * Iterator, one pass, no per-partition materialization) is the
    * production shape.
    */
  def decodeStub(withBlob: DataFrame): DataFrame = {
    val spark = withBlob.sparkSession
    import spark.implicits._
    withBlob.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val w = math.min(64, bytes.length)
          val h = if (w == 0) 0 else (bytes.length + w - 1) / w
          val mean = if (bytes.isEmpty) 0.0
          else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
          Decoded(id, w, h, BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF()
  }

  def decodeQuery(docs: DataFrame): DataFrame = decodeStub(withPayload(docs))

  /** Oracle re-derives the fake decode from the text itself (ASCII ⇒
    * byte == codepoint).
    */
  val decodeOracle: String =
    """SELECT doc_id,
      |       least(64, length(text))::INT AS width,
      |       ((length(text) + least(64, length(text)) - 1)
      |         // least(64, length(text)))::INT AS height,
      |       round(list_aggregate(list_transform(range(1, length(text) + 1),
      |               i -> ord(substr(text, i, 1))), 'avg'), 6) AS mean_byte
      |FROM documents""".stripMargin

  /** Frame sampling: every `stride`-th byte (video keyframe analog).
    * Pure column ops — no UDF: sequence + transform over the payload.
    */
  def frameSample(docs: DataFrame, stride: Int = 16): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      size(sequence(lit(1), col("meta.n_bytes"), lit(stride))).as("n_frames"),
      aggregate(
        transform(sequence(lit(1), col("meta.n_bytes"), lit(stride)),
          i => ascii(substring(col("payload").cast("string"), i, lit(1)))),
        lit(0L), (acc, v) => acc + v).as("frame_sum"))

  def frameSampleOracle(stride: Int = 16): String =
    s"""SELECT doc_id,
       |       len(range(1, length(text) + 1, $stride)) AS n_frames,
       |       CAST(list_aggregate(list_transform(range(1, length(text) + 1, $stride),
       |         i -> ord(substr(text, i, 1))), 'sum') AS BIGINT) AS frame_sum
       |FROM documents""".stripMargin

  /** Row type of the resize output. */
  case class Resized(doc_id: Long, out_bytes: Int, out_checksum: String)

  /** RESIZE STUB — deterministic fake for the thumbnailer: keeps every
    * k-th payload byte (k sized so ~`targetBytes` survive), reporting
    * the resized blob's size + checksum. Same typed `mapPartitions`
    * codec seam as `decodeStub`; a real build swaps the body for an
    * actual scaler.
    */
  def resizeStub(withBlob: DataFrame, targetBytes: Int = 64): DataFrame = {
    val spark = withBlob.sparkSession
    import spark.implicits._
    withBlob.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val k = math.max(1, bytes.length / targetBytes)
          val resized = (0 until bytes.length by k).map(bytes(_)).toArray
          md.reset()
          val hex = md.digest(resized).map("%02x".format(_)).mkString
          Resized(id, resized.length, hex)
        }
      }
      .toDF()
  }

  def resizeQuery(docs: DataFrame): DataFrame = resizeStub(withPayload(docs))

  /** Oracle re-derives the stride sampling from the text (ASCII ⇒
    * byte == codepoint, so the substring concat is the resized bytes).
    */
  def resizeOracle(targetBytes: Int = 64): String =
    s"""SELECT doc_id,
       |       len(range(1, length(text) + 1, greatest(1, length(text) // $targetBytes)))::INT AS out_bytes,
       |       md5(array_to_string(list_transform(
       |         range(1, length(text) + 1, greatest(1, length(text) // $targetBytes)),
       |         i -> substr(text, i, 1)), '')) AS out_checksum
       |FROM documents""".stripMargin

  /** Row type of the feature-extraction output. */
  case class Featured(doc_id: Long, features: Array[Double])

  /** FEATURE-EXTRACT STUB — deterministic fake for the embedding model:
    * an 8-bin byte histogram (fraction of payload bytes per 32-value
    * bin, 6 dp) as the per-blob feature vector. The plumbing — typed
    * mapPartitions batch, fixed-width `array<double>` output column
    * feeding the ANN/centroid operators — is exactly what a real
    * encoder produces.
    */
  def featureStub(withBlob: DataFrame): DataFrame = {
    val spark = withBlob.sparkSession
    import spark.implicits._
    withBlob.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val counts = new Array[Long](8)
          bytes.foreach(b => counts((b & 0xff) >> 5) += 1)
          val n = math.max(bytes.length, 1).toDouble
          Featured(id, counts.map(c => BigDecimal(c / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
      .toDF()
  }

  def featureQuery(docs: DataFrame): DataFrame = featureStub(withPayload(docs))

  /** Gate-facing scalar encoding of the feature vectors: one
    * (doc_id, bin, value) row per histogram bin. The raw
    * `array<double>` column is the right shape for the ANN operators
    * downstream, but an external row-hash comparator can't canonicalize
    * a nested array cell — so the verified surface is the exploded
    * long form (the verification analog of writing features to a
    * feature store as (entity, feature, value) rows).
    */
  def featureBins(docs: DataFrame): DataFrame =
    featureQuery(docs)
      .select(col("doc_id"), posexplode(col("features")))
      .select(col("doc_id"), col("pos").cast("bigint").as("bin"), col("col").as("value"))

  val featureOracle: String = {
    val bins = (0 until 8).map(b =>
      s"round(len(list_filter(codes, c -> c // 32 = $b))::DOUBLE / greatest(len(codes), 1), 6)")
      .mkString(",\n       |         ")
    s"""SELECT doc_id,
       |       [$bins] AS features
       |FROM (
       |  SELECT doc_id,
       |         list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))) AS codes
       |  FROM documents
       |)""".stripMargin
  }

  /** Oracle twin of `featureBins`: index the 8-element list with a
    * lateral 0..7 range (DuckDB lists are 1-indexed).
    */
  val featureBinsOracle: String =
    s"""WITH f AS (
       |  ${featureOracle.replace("\n", "\n       |  ")}
       |)
       |SELECT doc_id, t.bin AS bin, features[t.bin + 1] AS value
       |FROM f CROSS JOIN range(8) AS t(bin)""".stripMargin

  /** Multimodal → ANN composition: the extracted feature vectors feed
    * the SAME brute-force cosine top-k operator the embedding corpus
    * uses — blob → decode seam → feature vector → similarity search as
    * one declarative plan, the retrieval path a multimodal curation
    * pipeline runs (dedup by visual similarity, nearest-neighbor
    * labeling). No operator was modified to accept the derived
    * vectors; that is the composability claim.
    */
  def featureKnn(docs: DataFrame, nQueries: Int = 3, k: Int = 5): DataFrame =
    Similarity.bruteForceTopK(
      featureQuery(docs).select(
        col("doc_id").as("vec_id"), col("features").as("embedding")),
      nQueries, k)

  /** Feature frame cached ONCE per corpus dir: the top-k operator
    * consumes it on BOTH join sides, and a per-invocation cache() of a
    * mapPartitions plan never dedupes in the CacheManager (closures
    * compare by reference) — repeated calls would stack live cache
    * entries. Same memo pattern as Similarity.sharedVecFrame.
    */
  private val featMemo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def sharedFeatureFrame(s: SparkSession, d: String): DataFrame =
    featMemo.getOrElseUpdate(d, featureQuery(Tables.documents(s, d))
      .select(col("doc_id").as("vec_id"), col("features").as("embedding")).cache())

  def featureKnnOracle(nQueries: Int = 3, k: Int = 5): String = {
    val cos = "round(list_cosine_similarity(q.features::DOUBLE[], v.features::DOUBLE[]), 6)"
    s"""WITH f AS (
       |  ${featureOracle.replace("\n", "\n       |  ")}
       |)
       |SELECT query_id, vec_id, cos, rank
       |FROM (
       |  SELECT q.doc_id AS query_id, v.doc_id AS vec_id,
       |         $cos AS cos,
       |         row_number() OVER (PARTITION BY q.doc_id
       |                            ORDER BY $cos DESC, v.doc_id) AS rank
       |  FROM f v
       |  CROSS JOIN (SELECT * FROM f WHERE doc_id < $nQueries) q
       |  WHERE v.doc_id != q.doc_id
       |)
       |WHERE rank <= $k""".stripMargin
  }

  /** The REAL blob-ingestion front door: Spark's `binaryFile` source
    * reads raw files as (path, modificationTime, length, content) rows
    * — how image/audio corpora actually enter a lakehouse before any
    * decode. Files are staged once per corpus from the document text
    * (ETL setup, like the streaming landing dirs); the query reads them
    * back through the format and verifies length + checksum per blob
    * against the source-of-truth table.
    */
  private val blobDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  def binaryFileQuery(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    val staged = blobDirs.getOrElseUpdate(dir, {
      val d = graft.Scratch.dir("graft_blobs")
      Tables.documents(spark, dir).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text")).collect() // staging ETL: 50 tiny files
        .foreach { r =>
          Files.write(d.resolve(s"${r.getLong(0)}.bin"), r.getString(1).getBytes("UTF-8"))
        }
      d.toString
    })
    spark.read.format("binaryFile").load(staged)
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1), "(\\d+)", 1)
          .cast("bigint").as("doc_id"),
        col("length"),
        md5(col("content")).as("checksum"))
  }

  val binaryFileOracle: String =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS length,
      |       md5(text) AS checksum
      |FROM documents WHERE doc_id < 50""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_binaryfile" -> binaryFileQuery _,
    "q_mm_meta" -> ((s, d) => metaQuery(Tables.documents(s, d))),
    "q_mm_decode" -> ((s, d) => decodeQuery(Tables.documents(s, d))),
    "q_mm_frames" -> ((s, d) => frameSample(Tables.documents(s, d))),
    "q_mm_resize" -> ((s, d) => resizeQuery(Tables.documents(s, d))),
    "q_mm_features" -> ((s, d) => featureBins(Tables.documents(s, d))),
    "q_mm_knn" -> ((s, d) => Similarity.bruteForceTopK(sharedFeatureFrame(s, d), 3, 5))
  )

  def oracles: Map[String, String] = Map(
    "q_mm_binaryfile" -> binaryFileOracle,
    "q_mm_meta" -> metaOracle,
    "q_mm_decode" -> decodeOracle,
    "q_mm_frames" -> frameSampleOracle(),
    "q_mm_resize" -> resizeOracle(),
    "q_mm_features" -> featureBinsOracle,
    "q_mm_knn" -> featureKnnOracle()
  )
}
