package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Dedup

/** Dedup semantics on constructed corpora with known duplicates. */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text) => (id, text, "src") }
      .toDF("doc_id", "text", "source")
  }

  test("exact survivors: identical normalized text collapses to min doc_id") {
    val d = docs(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "different text"))
    val out = Dedup.exactSurvivors(d).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L) // 1+2 merged
    assert(out(1).getLong(0) == 3L && out(1).getLong(1) == 1L)
  }

  test("short and empty docs still shingle: no doc dropped, identical shorts match") {
    val d = docs(
      (1L, ""),                 // empty -> one empty shingle
      (2L, "..!!.."),           // punctuation-only -> normalizes to empty
      (3L, "single"),           // 1 token -> 1-token shingle
      (4L, "two words"),        // 2 tokens -> 2-token shingle
      (5L, "two words"))        // duplicate of 4
    val sigs = Dedup.minhashSignatures(d)
    assert(sigs.count() == 5, "every doc must produce a signature row")
    // identical (and identically-normalized) docs share full signatures
    val byDoc = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(byDoc(4L) == byDoc(5L))
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(3L) != byDoc(4L))
  }

  test("minhash signatures of identical docs are identical") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs((1L, text), (2L, text), (3L, "an entirely unrelated document about spark engines"))
    val sig = Dedup.minhashSignatures(d).orderBy("doc_id").collect()
    val s1 = sig(0).toSeq.drop(1)
    val s2 = sig(1).toSeq.drop(1)
    val s3 = sig(2).toSeq.drop(1)
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("nearDupPairs finds heavily-overlapping docs and reports Jaccard 1.0 for identical") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = docs((1L, base), (2L, base), (3L, "totally different words here nothing shared at all with others"))
    val pairs = Dedup.nearDupPairs(d, 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getDouble(2) == 1.0)
  }

  test("nearDupPairs: ~half-overlapping docs score between 0 and 1") {
    val d = docs(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven CHANGED WORDS HERE"))
    val pairs = Dedup.nearDupPairs(d, 0.1).collect()
    assert(pairs.length == 1)
    val j = pairs(0).getDouble(2)
    assert(j > 0.1 && j < 1.0)
  }

  test("dupClusters: transitive chain A~B~C collapses into one component") {
    // A≈B and B≈C share 3-gram shingles but A and C overlap much less —
    // pair detection alone can't group them; the component must.
    val d = docs(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight CHANGED WORDS"),
      (3L, "three four five six seven eight CHANGED WORDS MORE DRIFT"),
      (7L, "totally unrelated text in its own tiny island here"),
      (8L, "totally unrelated text in its own tiny island here"))
    val out = Dedup.dupClusters(d, 0.1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L,
      s"chain must collapse to min doc_id 1, got $out")
    assert(out(7L) == 7L && out(8L) == 7L)
  }

  test("repeatedKgrams: shared 5-gram spans counted, unique docs score 0") {
    val d = docs(
      (1L, "a b c d e f g h"),  // 4 distinct 5-grams, 2 shared with doc 2
      (2L, "x a b c d e f y"),  // 4 distinct 5-grams, the same 2 shared
      (3L, "q r s t u v w z"))  // nothing shared
    val out = Dedup.repeatedKgrams(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(2L) == ((4L, 2L, 0.5)))
    assert(out(3L) == ((4L, 0L, 0.0)))
  }

  test("dupClustersFromPairs: a 70-deep chain converges (pointer jumping, not one hop/round)") {
    // a path graph of diameter 69 — pure min-propagation would need 69
    // rounds and trip the 64-round cap; the pointer-jumping compression
    // must converge it in O(log n) rounds with every label at the min
    val s = spark
    import s.implicits._
    val pairs = (0L until 69L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClustersFromPairs(pairs).collect()
    assert(out.length == 70)
    assert(out.forall(_.getLong(1) == 0L),
      s"every vertex of the chain must label to the component min 0")
  }

  test("simhash groups identical docs under one signature") {
    val t = "spark catalyst tungsten codegen shuffle partition"
    val d = docs((1L, t), (2L, t), (3L, t))
    val out = Dedup.simhash(d).collect()
    assert(out.length == 1 && out(0).getLong(1) == 3L)
  }

  test("native minhash signatures equal the column-formulation signatures") {
    val s = spark
    import org.apache.spark.sql.functions._
    // generated corpus with short/empty/punct/duplicate edge docs
    val texts = Seq("", "one", "two words", "..!!..", "a b c d e f g",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 40).map(i => s"doc $i body ${("w" + i % 7 + " ") * (i % 11)}end")
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val native = Dedup.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    // the pre-round-3 column formulation: k interpreted HOF folds over
    // the packed shingle array — kept here as the semantic reference
    val toksC = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")), " +")
    val ref = d.select(col("doc_id"), explode(array(toksC)).as("arr"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), greatest(size(col("arr")) - 3, lit(0))),
          i => concat_ws(" ", get(col("arr"), i), get(col("arr"), i + 1), get(col("arr"), i + 2))
        )).as("sh"))
      .select(col("doc_id") +: (0 until Dedup.numHashes).map { i =>
        array_min(transform(col("sh"), sh => md5(concat(sh, lit(s"#$i"))))).as(s"sig_$i")
      }: _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(native == ref)
  }

  test("hot-bucket cap bounds pair counts for a boilerplate-heavy bucket") {
    // 20 byte-identical docs land in ONE bucket per band; with cap=8
    // only the 8 lowest doc_ids pair up: C(8,2)=28 pairs, not C(20,2)=190.
    val boiler = "this license text repeats verbatim across every single document here"
    val d = docs((1L to 20L).map(i => i -> boiler): _*)
    val capped = Dedup.nearDupPairs(d, 0.5, cap = 8).collect()
    assert(capped.length == 28, s"expected C(8,2)=28 capped pairs, got ${capped.length}")
    assert(capped.forall(r => r.getLong(0) <= 8L && r.getLong(1) <= 8L),
      "survivors must be the lowest doc_ids (deterministic cap)")
    val uncapped = Dedup.nearDupPairs(d, 0.5).collect()
    assert(uncapped.length == 190, "default cap must be inert on small buckets")
    // the stats report flags the hot bucket relative to the cap in force
    val stats = Dedup.lshBucketStats(d).collect()
    assert(stats.forall(_.getInt(4) == Dedup.hotBucketCap))
    assert(stats.forall(_.getLong(5) == 0L), "no bucket exceeds the default cap here")
  }

  test("lshBucketStats candidate pair accounting is consistent") {
    val t = "a b c d e f g h i j k l m n o p"
    val d = docs((1L, t), (2L, t), (3L, "x y z w v u t s r q p o n m l k"))
    val stats = Dedup.lshBucketStats(d).collect()
    assert(stats.length == Dedup.numHashes / Dedup.bandRows)
    // identical docs 1,2 share every band bucket => every band has >= 1 candidate pair
    assert(stats.forall(_.getLong(3) >= 1L))
  }

  test("clusterSurvivors keeps one doc per cluster and accounts per source") {
    val s = spark
    import s.implicits._
    // web: chain 1-2-3 (one cluster, survivor 1) + singleton 4;
    // books: pair 5-6 (survivor 5)
    val d = Seq((1L, "web"), (2L, "web"), (3L, "web"), (4L, "web"),
      (5L, "books"), (6L, "books")).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterSurvivors(d, pairs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("web") == ((4L, 3L, 2L, 2L)),
      s"web: 4 docs, 3 clustered, 2 dropped (2,3), 2 kept (1,4) — got ${out("web")}")
    assert(out("books") == ((2L, 2L, 1L, 1L)))
  }

  test("incrementalDedup admits novel docs, rejects near-dups of the index only") {
    val boiler = "the quick brown fox jumps over the lazy dog again and again until dawn"
    val idx = docs(
      (1L, boiler),
      (2L, "completely different indexed content about spark aggregation plans"),
      (3L, boiler + " with a small tail"))
    val batch = docs(
      (10L, boiler),                                      // dup of 1 (and 3)
      (11L, "a genuinely novel document about rocksdb state stores"),
      (12L, "completely different indexed content about spark aggregation plans"))
    val out = Dedup.incrementalDedup(idx, batch).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(10L)._1 == 1L && out(10L)._2 == 1.0 && out(10L)._3 == 0L,
      s"10 must match index doc 1 at jaccard 1.0 and be rejected: ${out(10L)}")
    assert(out(11L) == ((-1L, 0.0, 1L)), s"novel doc admitted: ${out(11L)}")
    assert(out(12L)._1 == 2L && out(12L)._3 == 0L)
    // batch-internal dups are NOT this operator's concern: a batch doc
    // never matches another batch doc here
    val batch2 = docs((20L, "x y z unique"), (21L, "x y z unique"))
    val out2 = Dedup.incrementalDedup(idx, batch2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out2 == Map(20L -> 1L, 21L -> 1L), s"both admitted: $out2")
  }

  test("incremental admission is micro-batch invariant: slice-wise union equals global") {
    import org.apache.spark.sql.functions.col
    val boiler = "the quick brown fox jumps over the lazy dog again and again until dawn"
    val idx = docs(
      (1L, boiler),
      (2L, "completely different indexed content about spark aggregation plans"))
    val batch = docs(
      (10L, boiler),
      (11L, "a genuinely novel document about rocksdb state stores"),
      (12L, "completely different indexed content about spark aggregation plans"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val whole = key(Dedup.incrementalDedup(idx, batch))
    // the streaming admission shape: persisted index artifacts, batch
    // processed in arbitrary slices — via BOTH the band-table path and
    // the fully-prepared (pre-shingled) path the stream runner uses
    val bands = Dedup.indexBandTable(idx).cache()
    val shingles = Dedup.indexShingleTable(idx).cache()
    val sliced = Seq(Seq(10L), Seq(11L, 12L)).map { ids =>
      key(Dedup.incrementalDedupFromBands(bands, idx,
        batch.filter(col("doc_id").isin(ids: _*))))
    }.reduce(_ ++ _)
    assert(sliced == whole, s"sliced=$sliced whole=$whole")
    val prepared = Seq(Seq(10L), Seq(11L, 12L)).map { ids =>
      key(Dedup.incrementalDedupPrepared(bands, shingles,
        batch.filter(col("doc_id").isin(ids: _*))))
    }.reduce(_ ++ _)
    assert(prepared == whole, s"prepared=$prepared whole=$whole")
  }
}
