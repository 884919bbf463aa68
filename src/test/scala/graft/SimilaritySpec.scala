package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.VectorOps

/** Cosine similarity / ANN semantics + the native dot-product expression. */
class SimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float], Int)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("native graft_dot equals hand-computed dot product (codegen path)") {
    val s = spark
    import s.implicits._
    assert(s.catalog.functionExists("graft_dot"), "extension not registered")
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val out = df.select(VectorOps.dot(s, col("a"), col("b"))).head().getDouble(0)
    assert(out == 32.0)
  }

  test("dot falls back to UDF and agrees with the native expression") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(0.5, -1.5), Seq(2.0, 4.0)),
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b") // unequal lengths too
    val native = df.select(VectorOps.dot(s, col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    // the actual UDF fallback path (what a vanilla session without the
    // extensions runs), not a second evaluation of the native expression
    val viaUdf = df.select(VectorOps.dotUdf(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(native == viaUdf)
    assert(native == Seq(0.5 * 2.0 + -1.5 * 4.0, 1.0 * 4.0 + 2.0 * 5.0))
  }

  test("brute-force top-k ranks an identical vector first with cosine 1") {
    val q = Seq(1f, 0f, 0f, 0f)
    val d = vecs(
      (0L, q, 0),               // query
      (10L, q, 0),              // identical -> cos 1
      (11L, Seq(0f, 1f, 0f, 0f), 0),  // orthogonal -> cos 0
      (12L, Seq(-1f, 0f, 0f, 0f), 0)) // opposite -> cos -1
    val out = Similarity.bruteForceTopK(d, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    assert(out(0).getDouble(2) == 1.0)
    assert(out(1).getDouble(2) == 0.0)
    assert(out(2).getDouble(2) == -1.0)
  }

  test("bucketed top-k only searches the query's sign bucket") {
    val d = vecs(
      (0L, Seq(1f, 1f, 1f, 0f), 0),   // bucket 7
      (10L, Seq(1f, 1f, 1f, 1f), 0),  // bucket 7 — reachable
      (11L, Seq(-1f, 1f, 1f, 0f), 0)) // bucket 3 — invisible to query 0
    val out = Similarity.bucketedTopK(d, nQueries = 1, k = 10).collect()
    assert(out.map(_.getLong(1)).toSet == Set(10L))
  }

  test("multi-probe top-k reaches hamming-1 buckets but not hamming-2") {
    val ones = Seq.fill(8)(1f)
    val flip1 = Seq(-1f) ++ Seq.fill(7)(1f)
    val flip2 = Seq(-1f, -1f) ++ Seq.fill(6)(1f)
    val d = vecs(
      (0L, ones, 0),    // query, bucket 255
      (10L, ones, 0),   // same bucket — reachable
      (11L, flip1, 0),  // hamming-1 bucket — reachable via probe
      (12L, flip2, 0))  // hamming-2 bucket — invisible
    val out = Similarity.multiProbeTopK(d, nQueries = 1, k = 10).collect()
    assert(out.map(_.getLong(1)).toSet == Set(10L, 11L))
  }

  test("embedding near-dup pairs at threshold") {
    val d = vecs(
      (0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0.01f), 0), (2L, Seq(0f, 1f), 0))
    val out = Similarity.nearDupPairs(d, 0.9).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 1L)
  }

  test("near-dup pairs: cell-pruned plan has no cartesian/nested-loop join and equals N² truth") {
    val d = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pruned = Similarity.nearDupPairs(d, 0.4)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cell-pruned near-dup must not cross join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "cell-pruned near-dup must use equi-joins only")
    // exact recall: the pruned result must equal the brute-force N²/2 truth
    val emb = d.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val b = emb.select(col("vec_id").as("vec_b"), col("e").as("eb"))
    val brute = emb.crossJoin(b).filter(col("vec_id") < col("vec_b"))
      .select(col("vec_id"), col("vec_b"),
        round(VectorOps.dot(spark, col("e"), col("eb")) /
          (sqrt(VectorOps.dot(spark, col("e"), col("e"))) *
            sqrt(VectorOps.dot(spark, col("eb"), col("eb")))), 6).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"pruned=${got.size} brute=${brute.size}")
  }

  test("IVF hits agree with brute-force cosines on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val ivf = Similarity.ivfTopK(Tables.embeddings(spark, dir))
      .select("query_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.nonEmpty)
    // brute-force over ALL pairs (k = corpus size): every IVF hit must
    // carry exactly the exhaustive cosine for that pair — IVF narrows
    // the candidate set (recall trade), it must never change a score.
    val n = Tables.embeddings(spark, dir).count().toInt
    val brute = Similarity.bruteForceTopK(Tables.embeddings(spark, dir), k = n)
      .select("query_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (pair, cos) =>
      assert(brute(pair) == cos, s"pair $pair: ivf=$cos brute=${brute(pair)}")
    }
  }

  test("k-means IVF hits carry exactly the exhaustive cosines (learned codebook)") {
    val dir = "/root/testdata/sf0.001"
    val km = Similarity.kmeansTopK(Tables.embeddings(spark, dir))
      .select("query_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(km.nonEmpty)
    val n = Tables.embeddings(spark, dir).count().toInt
    val brute = Similarity.bruteForceTopK(Tables.embeddings(spark, dir), k = n)
      .select("query_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    km.foreach { case (pair, cos) =>
      assert(brute(pair) == cos, s"pair $pair: kmeans=$cos brute=${brute(pair)}")
    }
  }

  test("sampled k-means trains on exactly the md5-gated subset; assignment stays full-corpus") {
    val dir = "/root/testdata/sf0.001"
    val full = Tables.embeddings(spark, dir)
    val n = full.count()
    // the gate is a proper subset, deterministic, and md5-reproducible
    val sample = Similarity.trainSample(
      full.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e")), 60)
    val sn = sample.count()
    assert(sn > 0 && sn < n, s"60% gate must be a proper subset: $sn of $n")
    assert(Similarity.trainSample(sample, 60).count() == sn, "gate is idempotent")
    // training reads ONLY the sample: the sampled codebook over the full
    // frame must equal the full-corpus codebook over the pre-filtered
    // frame — any leak of unsampled rows into seed or Lloyd rounds breaks
    // this equality
    val sampledTrain = Similarity.kmeansTopK(full, samplePct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val prefiltered = {
      val keep = sample.select("vec_id").collect().map(_.getLong(0)).toSet
      val kept = full.filter(col("vec_id").isInCollection(keep))
      Similarity.probeTopKForSpec(
        full, kept, iters = 2, nQueries = 5, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    }
    assert(sampledTrain == prefiltered,
      "sampled training must be equivalent to training on the pre-filtered frame")
    // and the result set still ranks full-corpus candidates (vectors
    // OUTSIDE the training sample appear among the hits)
    val sampleIds = sample.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(Similarity.kmeansTopK(full, samplePct = 60)
      .select("vec_id").collect().map(_.getLong(0)).exists(id => !sampleIds(id)),
      "assignment/probe must cover the full corpus, not just the sample")
  }

  test("centroid similarity: all-identical label has cosine 1 to its centroid") {
    val v = Seq.fill(64)(0.5f)
    val d = vecs((0L, v, 1), (1L, v, 1), (2L, v, 1))
    val out = Similarity.centroidSimilarity(d).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 3L)           // n
    assert(out(0).getDouble(2) == 1.0)        // avg_cos
    assert(out(0).getDouble(3) == 1.0)        // min_cos
  }

  test("native graft_rankcells equals the interpreted sort_array(transform(...)) ranking") {
    import org.apache.spark.sql.functions._
    import graft.functions.{RankCellsOps, VectorOps}
    // real corpus vectors against a codebook derived from them — every
    // (row, cell) cosine exercises the round/tie-break parity
    val v = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(spark, col("e")))
    val sums = (1 to 64).map(i => avg(element_at(col("e"), i)).as(s"c_$i"))
    val cent = v.groupBy(col("label")).agg(sums.head, sums.tail: _*)
      .select(col("label").cast("bigint").as("cell"),
        array((1 to 64).map(i => col(s"c_$i")): _*).as("ce"))
      .withColumn("cnrm", VectorOps.norm(spark, col("ce")))
    val cb = cent.agg(collect_list(struct(col("cell"), col("ce"), col("cnrm"))).as("cb"))
    val both = v.crossJoin(broadcast(cb))
      .withColumn("native", RankCellsOps.rankCells(spark, col("e"), col("cb")))
      .withColumn("hof", transform(sort_array(transform(col("cb"), c =>
        struct(
          (round(VectorOps.dot(spark, col("e"), c.getField("ce")) /
            (col("nrm") * c.getField("cnrm")), 6) * -1).as("neg_ccos"),
          c.getField("cell").as("cell")))), s => s.getField("cell")))
      .select(col("vec_id"), col("native"), col("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"vec ${r.getLong(0)} ranking diverged")
    }
  }

  test("graft_rankcells tie-break: equal rounded cosines order by cell id") {
    // two identical centroids -> identical cosine to every vector; the
    // lower cell id must rank first (the oracle's ORDER BY ... , cell)
    val e = Seq.tabulate(4)(i => (i + 1).toDouble)
    val out = graft.functions.RankCells.computeSeq(e,
      Seq((7L, e, math.sqrt(e.map(x => x * x).sum)),
        (3L, e, math.sqrt(e.map(x => x * x).sum)),
        (5L, e.map(-_), math.sqrt(e.map(x => x * x).sum))))
    assert(out == Seq(3L, 7L, 5L))
  }

  test("graft_rankcells: NaN cosine (zero-norm centroid) ranks first, matching SQL NaN-greatest DESC") {
    val e = Seq(1.0, 0.0)
    val out = graft.functions.RankCells.computeSeq(e, Seq(
      (1L, Seq(1.0, 0.0), 1.0),  // cos = 1
      (5L, Seq(0.0, 1.0), 1.0),  // cos = 0
      (2L, Seq(0.0, 0.0), 0.0))) // 0/0 = NaN — DuckDB and Spark SQL rank it first
    assert(out == Seq(2L, 1L, 5L))
  }

  test("graft_rankcells: NaN ranks strictly above an Infinity cosine (underflowed norm product)") {
    // norm product underflows to 0 with a nonzero dot => cos = +Inf;
    // SQL DESC orders NaN > Infinity > finite — the sort key must too
    val e = Seq(1e-150, 0.0) // nrm = 1e-150 (square is subnormal, not 0)
    val out = graft.functions.RankCells.computeSeq(e, Seq(
      (1L, Seq(1.0, 0.0), 1.0),       // cos = 1.0 (finite)
      (2L, Seq(1e-120, 0.0), 1e-180), // dp=1e-270, nrm*cnrm=1e-330→0 => +Inf
      (3L, Seq(0.0, 1.0), 1e-180)))   // dp=0, product→0 => NaN
    assert(out == Seq(3L, 2L, 1L))
  }

  test("quantize: exact codes reconstruct exactly; rounding error stays within half a step") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)), // ±1 are exact multiples of 1/127; 0.5 is not
      (2L, Seq(0.0f, 0.0f, 0.0f))   // zero vector: guard keeps scale positive, codes all 0
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.quantize(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (sc1, nmse1) = out(1L)
    assert(math.abs(sc1 - 1.0 / 127) < 1e-8)
    // only the 0.5 component carries error: nmse = err^2/(3*scale^2) = 0.0833
    assert(math.abs(nmse1 - 0.0833) < 1e-9, s"got nmse $nmse1")
    val (sc2, nmse2) = out(2L)
    // the 1e-12 guard scale rounds to 0 in the 8dp report; the error is 0
    assert(sc2 == 0.0 && nmse2 == 0.0, "zero vector must quantize losslessly")
    // per-element error <= scale/2 implies nmse <= 1/4 always
    assert(out.values.forall(_._2 <= 0.25))
  }

  test("quantize plan is map-only and annRecall joins stay hashed (no nested-loop fallback)") {
    val s = spark
    import s.implicits._
    val d = (0L until 10L).map(i =>
      (i, Seq.tabulate(64)(j => 1.0f + 0.1f * ((i + j) % 3)), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val qPlan = graft.ext.Similarity.quantize(d).queryExecution.executedPlan.toString
    assert(!qPlan.contains("Exchange"), s"quantize must not shuffle:\n$qPlan")
    val rPlan = graft.ext.Similarity.annRecall(d, 3, 5).queryExecution.executedPlan.toString
    assert(!rPlan.contains("CartesianProduct"), "recall joins must stay equi-joins")
  }

  test("pqQuantize: label-constant corpus codes every subspace to its own label") {
    // every vector of a label is identical => per-label subvector means
    // equal the vectors => distance 0 to the own-label code in EVERY
    // subspace, so codes = label repeated m times and recon_err = 0
    val rows = (0 until 4).flatMap { lbl =>
      (0 until 3).map(i =>
        ((lbl * 3 + i).toLong, Seq.fill(64)((lbl + 1) * 1.0f), lbl))
    }
    val out = Similarity.pqQuantize(vecs(rows: _*), m = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out.length == 12)
    out.foreach { case (id, codes, err) =>
      val lbl = (id / 3).toInt
      assert(codes == Seq.fill(8)(lbl).mkString(","), s"vec $id: $codes")
      assert(err == 0.0)
    }
  }

  test("pqQuantize: code argmin matches a local reference on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1), i % 5))
    val vectors = rows.map { case (_, e, _) => e.map(_.toDouble) }
    val labels = rows.map(_._3)
    // local per-label subspace means + rounded-dist argmin, same rules
    val m = 8; val sub = 8
    def cent(lbl: Int, s: Int): Seq[Double] = {
      val members = vectors.zip(labels).filter(_._2 == lbl).map(_._1)
      (0 until sub).map(i => members.map(_(s * sub + i)).sum / members.size)
    }
    val cents = (0 until 5).map(l => l -> (0 until m).map(s => cent(l, s))).toMap
    def localCodes(v: Seq[Double]): Seq[Int] = (0 until m).map { s =>
      (0 until 5).map { l =>
        val d = (0 until sub).map { i =>
          val diff = v(s * sub + i) - cents(l)(s)(i); diff * diff
        }.sum
        (BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, l)
      }.min._2
    }
    val out = Similarity.pqQuantize(vecs(rows: _*), m = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, e, _) =>
      val expected = localCodes(e.map(_.toDouble)).mkString(",")
      assert(out(id) == expected, s"vec $id: ${out(id)} vs $expected")
    }
  }

  test("ivfPqTopK: label-constant corpus ranks own-cell (ADC 0) candidates first") {
    // vectors of a label identical => PQ sub-centroids equal the vectors
    // => ADC 0 to every same-label candidate, > 0 across labels; the
    // query's top cell is its own label's cell
    val rows = (0 until 4).flatMap { lbl =>
      (0 until 5).map { i =>
        val e = (0 until 64).map(d => if (d % 4 == lbl) 1.0f else 0.1f * lbl)
        ((lbl * 5 + i).toLong, e, lbl)
      }
    }
    val out = Similarity.ivfPqTopK(vecs(rows: _*), nQueries = 1, k = 4, nprobe = 1)
      .orderBy("rank").collect()
    assert(out.length == 4)
    // query 0 has label 0: its 4 same-label peers (ids 1-4) at ADC 0
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.forall(_.getDouble(2) == 0.0), "same-label ADC must be 0")
  }

  test("ivfPqTopK: codebook lookup is by code VALUE — a label gap cannot shift it") {
    // labels 0, 1, 3 — label 2 absent, so positional indexing would
    // score code 3 against label 3's POSITION (index 2 ≠ code 3 slot)
    val rows = Seq(0, 1, 3).flatMap { lbl =>
      (0 until 5).map { i =>
        val e = (0 until 64).map(d => if (d % 4 == lbl % 4) 1.0f else 0.2f * lbl)
        ((lbl * 5 + i).toLong, e, lbl)
      }
    }
    val out = Similarity.ivfPqTopK(vecs(rows: _*), nQueries = 1, k = 4, nprobe = 1)
      .orderBy("rank").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.forall(_.getDouble(2) == 0.0),
      s"same-label ADC must be 0 even with a label gap: ${out.mkString(", ")}")
  }

  test("ivfAppend: new vectors route to existing centroids; drift shows in mean cos") {
    // two well-separated cells: label 0 along +e1, label 1 along +e2
    def axis(d: Int, wobble: Float) = (0 until 64).map {
      case `d` => 1.0f
      case i if i == (d + 7) % 64 => wobble
      case _ => 0.0f
    }
    val idx = vecs(
      (0L, axis(0, 0.1f), 0), (1L, axis(0, -0.1f), 0),
      (2L, axis(8, 0.1f), 1), (3L, axis(8, -0.1f), 1))
    // batch: one ON-centroid vector for cell 0, one DRIFTED vector that
    // still routes to cell 1 but at a visibly lower cosine
    val drifted = (0 until 64).map {
      case 8 => 1.0f
      case 20 => 0.9f
      case _ => 0.0f
    }
    val batch = vecs((10L, axis(0, 0.0f), 0), (11L, drifted, 1))
    val out = Similarity.ivfAppend(idx, batch).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L)._1 == 2L && out(0L)._2 == 1L, s"cell 0 sizes: ${out(0L)}")
    assert(out(1L)._1 == 2L && out(1L)._2 == 1L)
    // the on-centroid append scores at least as well as the index mean;
    // the drifted append scores strictly worse than its index mean
    assert(out(0L)._4 >= out(0L)._3, s"cell 0 append not on-centroid: ${out(0L)}")
    assert(out(1L)._4 < out(1L)._3, s"cell 1 drift not visible: ${out(1L)}")
  }

  test("embedClusters/survivors: identical vectors cluster; cluster-min survives") {
    // two identical triples (cos 1.0 within), one lone vector
    def v(seed: Int) = (0 until 64).map(d => ((d * 31 + seed) % 17) / 17.0f - 0.4f)
    val rows = Seq(
      (0L, v(1), 0), (1L, v(1), 0), (2L, v(1), 0),
      (5L, v(2), 1), (6L, v(2), 1),
      (9L, v(3), 2))
    val clusters = Similarity.embedClusters(vecs(rows: _*), threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
    val surv = Similarity.embedSurvivors(vecs(rows: _*),
      Similarity.embedClusters(vecs(rows: _*), threshold = 0.99))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(surv(0) == ((3L, 2L, 1L)), s"label 0: $surv") // 3 vecs, 2 dropped, 1 kept
    assert(surv(1) == ((2L, 1L, 1L)))
    assert(surv(2) == ((1L, 0L, 1L))) // unclustered survives trivially
  }

  test("annRecall: perfect recall when every vector shares one bucket; exact truth-set sizes") {
    val s = spark
    import s.implicits._
    // all-positive components => identical sign bucket for bucketed (3-bit)
    // and multiprobe (8-bit): both searches see the whole corpus
    val d = (0L until 12L).map { i =>
      (i, Seq.tabulate(64)(j => 1.0f + 0.1f * ((i + j) % 5)), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val rows = graft.ext.Similarity.annRecall(d, nQueries = 3, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 9, "3 methods x 3 queries")
    assert(rows.forall(_._3 == 5L), "truth set is exactly k when the corpus allows")
    val exact = rows.filter(r => r._1 == "bucketed" || r._1 == "multiprobe")
    assert(exact.forall(r => r._4 == 5L && r._5 == 1.0),
      s"single shared bucket must give perfect recall, got ${exact.mkString(", ")}")
    // the compressed ADC path is approximate by construction: it must be
    // REPORTED (that's the acceptance gate), not necessarily perfect
    val pq = rows.filter(_._1 == "ivfpq")
    assert(pq.length == 3 && pq.forall(r => r._5 >= 0.0 && r._5 <= 1.0),
      s"ivfpq rows missing/out of range: ${pq.mkString(", ")}")
  }

  test("nearDupThresholdSweep: bins partition the pairs, cumulative counts are monotone") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L, 0.92), (1L, 3L, 0.87), (2L, 3L, 0.87), (4L, 5L, 0.41))
      .toDF("vec_a", "vec_b", "cos")
    val out = graft.ext.Similarity.nearDupThresholdSweep(pairs)
      .orderBy(col("bin_lo").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0.9, 1L, 1L), (0.85, 2L, 3L), (0.4, 1L, 4L)))
  }

  test("two graft_pqadc calls codegen in one projection without name collision") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // non-nullable children → nullSafeExec emits the result code
    // UNWRAPPED; a fixed local name would redeclare and break Janino
    val cbs = Seq(Seq(0 -> Seq(1.0, 2.0)), Seq(0 -> Seq(3.0, 4.0)))
    val row = Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0))).toDF("e")
      .select(
        call_function("graft_pqadc", col("e"), typedLit(Seq(0, 0)), typedLit(cbs)).as("x"),
        call_function("graft_pqadc", col("e"), typedLit(Seq(0, 9)), typedLit(cbs)).as("y"))
      .head()
    assert(row.getDouble(0) == 0.0 && row.isNullAt(1))
  }

  test("PqKernel: argmin tie-breaks on the smaller code; ADC misses yield None") {
    import graft.functions.PqKernel
    // two codes at the SAME rounded distance from e's single subspace —
    // the smaller code must win (the oracle's ORDER BY round(d,6), label)
    val cb = Seq(Seq(7 -> Seq(1.0, 2.0), 3 -> Seq(1.0, 2.0)))
    val (codes, err) = PqKernel.assignSeq(Seq(1.5, 2.5), cb)
    assert(codes == Seq(3) && err == 0.5)
    // ADC by code VALUE: present code scores, absent code is None (the
    // element_at(map_from_entries(...), code) null contract)
    assert(PqKernel.adcSeq(Seq(1.0, 2.0), Seq(7), cb).contains(0.0))
    assert(PqKernel.adcSeq(Seq(1.0, 2.0), Seq(5), cb).isEmpty)
  }

  test("PqKernel: NaN rule is shared by native and fallback — skip NaN, all-NaN sentinel") {
    import graft.functions.PqKernel
    val sp = spark
    import sp.implicits._
    // subspace 0: code 4 has a NaN distance (NaN centroid), code 9 finite
    // — NaN must never win the argmin on either path
    val mixed = Seq(Seq(4 -> Seq(Double.NaN, 0.0), 9 -> Seq(1.0, 2.0)))
    val e = Seq(1.0, 2.0)
    val (codesSeq, errSeq) = PqKernel.assignSeq(e, mixed)
    assert(codesSeq == Seq(9) && errSeq == 0.0)
    val nativeMixed = Seq((e, mixed)).toDF("e", "cb")
      .select(org.apache.spark.sql.functions.call_function("graft_pqassign",
        org.apache.spark.sql.functions.col("e"),
        org.apache.spark.sql.functions.col("cb")).as("pa")).head().getStruct(0)
    assert(nativeMixed.getSeq[Int](0) == codesSeq && nativeMixed.getDouble(1) == errSeq)
    // all distances NaN: both paths emit the Int.MaxValue sentinel +
    // infinite err, never an arbitrary codebook entry
    val allNaN = Seq(Seq(4 -> Seq(Double.NaN, 0.0), 9 -> Seq(Double.NaN, 1.0)))
    val (codesNaN, errNaN) = PqKernel.assignSeq(e, allNaN)
    assert(codesNaN == Seq(Int.MaxValue) && errNaN.isPosInfinity)
    val nativeNaN = Seq((e, allNaN)).toDF("e", "cb")
      .select(org.apache.spark.sql.functions.call_function("graft_pqassign",
        org.apache.spark.sql.functions.col("e"),
        org.apache.spark.sql.functions.col("cb")).as("pa")).head().getStruct(0)
    assert(nativeNaN.getSeq[Int](0) == codesNaN && nativeNaN.getDouble(1).isPosInfinity)
  }

  test("hybrid RRF: a doc in both ranked lists outranks every single-list doc") {
    val s = spark
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
    val vectors = Tables.embeddings(s, "/root/testdata/sf0.001")
    val kEach = 20
    val fused = Similarity.hybridRrf(docs, vectors, nQueries = 3,
      kEach = kEach, k = 40).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(fused.nonEmpty)
    // with kEach=20 and rrfK=60, min two-list score 2/(60+20) = 0.025
    // strictly beats max one-list score 1/(60+1) — so membership count is
    // a total tier: every both-lists doc precedes every single-list doc
    val twoListFloor = 2.0 / (60 + kEach)
    val oneListCeil = 1.0 / 61
    assert(twoListFloor > oneListCeil)
    fused.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to rows.length).toSeq, "contiguous ranks")
      assert(byRank.sliding(2).forall(p => p.head._3 >= p.last._3), "rrf desc")
      val tiers = byRank.map(r => if (r._3 >= twoListFloor) 2 else 1)
      assert(!tiers.sliding(2).exists(p => p.head == 1 && p.last == 2),
        "a single-list doc must never precede a both-lists doc")
    }
  }

  test("centroid derivation enforces non-null full-width embeddings in-plan") {
    val s = spark
    import s.implicits._
    // the shared count(*) denominator is only sound when every row is
    // non-null and 64-wide — a violating row must raise, not silently
    // shift the centroid mean
    val good = (0L until 8L).map(i =>
      (i, Seq.tabulate(64)(j => ((i + j) % 5).toFloat / 5f), (i % 2).toInt))
    val withNull = good.toDF("vec_id", "embedding", "label")
      .union(Seq((99L, null.asInstanceOf[Seq[Float]], 0))
        .toDF("vec_id", "embedding", "label"))
    val eNull = intercept[Exception](
      Similarity.ivfTopK(withNull, nQueries = 1, k = 2).collect())
    assert(eNull.getMessage.contains("embeddings"), eNull.getMessage)
    val withShort = good.toDF("vec_id", "embedding", "label")
      .union(Seq((98L, Seq(1f, 2f), 1)).toDF("vec_id", "embedding", "label"))
    val eShort = intercept[Exception](
      Similarity.ivfTopK(withShort, nQueries = 1, k = 2).collect())
    assert(eShort.getMessage.contains("embeddings"), eShort.getMessage)
    // the clean frame still works
    assert(Similarity.ivfTopK(good.toDF("vec_id", "embedding", "label"),
      nQueries = 1, k = 2).count() > 0)
  }
}
