package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.Indicators
import graft.ext.Dedup

/** Property-based invariants (SURVEY §5.4): RSI bounds, window
  * assignment laws, minhash stability — ScalaCheck generators sampled
  * under fixed seeds (no scalatestplus bridge in the offline cache).
  */
class PropertiesSpec extends SparkSpec {

  private def ts(i: Int) = new Timestamp(1704067200000L + i * 60000L)

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("RSI is always within [0, 100] when defined (random walks)") {
    val gen = Gen.listOfN(25, Gen.choose(-5.0, 5.0))
    for (steps <- samples(gen, 8)) {
      val s = spark
      import s.implicits._
      val vals = steps.scanLeft(100.0)(_ + _)
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, ts(i), "x", v) }
        .toDF("event_id", "ts", "event_type", "value")
      val out = Indicators.rsi(df).select("rsi").collect()
        .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
      assert(out.forall(v => v >= 0.0 && v <= 100.0), s"violated for steps=$steps")
    }
  }

  test("sliding 1-min/30-s window assigns every event to exactly 2 windows") {
    val s = spark
    import s.implicits._
    for (offsets <- samples(Gen.listOfN(20, Gen.choose(0, 3600)), 8)) {
      val df = offsets.zipWithIndex
        .map { case (sec, i) => (i.toLong, new Timestamp(1704067200000L + sec * 1000L), "x", 1.0) }
        .toDF("event_id", "ts", "event_type", "value")
      val total = graft.silver.SilverAgg.sliding(df)
        .agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0)
      assert(total == 2L * offsets.length)
    }
  }

  test("minhash: identical docs always share all signatures") {
    val wordGen = Gen.listOfN(12, Gen.oneOf("spark", "scala", "data", "lake", "agg", "join", "scan", "sort"))
    for (words <- samples(wordGen, 8)) {
      val s = spark
      import s.implicits._
      val text = words.mkString(" ")
      val df = Seq((1L, text, "src"), (2L, text, "src")).toDF("doc_id", "text", "source")
      val sigs = Dedup.minhashSignatures(df).collect()
      assert(sigs(0).toSeq.drop(1) == sigs(1).toSeq.drop(1))
    }
  }

  test("ngrams: native expression and Seq twin equal the reference derivation") {
    import org.apache.spark.sql.functions._
    import graft.functions.NGrams
    val s = spark
    import s.implicits._
    val tokGen = Gen.listOfN(10, Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    for ((toks0, i) <- samples(tokGen, 8).zipWithIndex) {
      // vary length down to BELOW the gram width to hit the short-array path
      val toks = toks0.take(1 + (i * 3) % 10)
      for (n <- Seq(2, 3, 5)) {
        val out = NGrams.computeSeq(toks, n)
        // reference semantics: positions 0..max(len-n, 0), space-joined,
        // out-of-range positions skipped
        val expected = (0 to math.max(toks.length - n, 0)).map(p =>
          toks.slice(p, p + n).mkString(" "))
        assert(out == expected, s"toks=$toks n=$n")
        // the NATIVE ArrayData pass (what codegen calls), not just the twin
        val native = Seq(Tuple1(toks)).toDF("t")
          .select(call_function("graft_ngrams", col("t"), lit(n)).as("g"))
          .head().getSeq[String](0)
        assert(native == expected, s"native diverged: toks=$toks n=$n")
      }
    }
  }

  test("minmd5: native expression and Seq twin equal the minimum per-element md5") {
    import org.apache.spark.sql.functions._
    import graft.functions.MinMd5
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(12, Gen.alphaNumStr.map(_.take(6)))
    for (xs <- samples(gen, 8)) {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(v: String) = {
        md.reset()
        md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val expected = if (xs.isEmpty) None else Some(xs.map(hex).min)
      assert(MinMd5.computeSeq(xs) == expected)
      val row = Seq(Tuple1(xs)).toDF("t")
        .select(call_function("graft_minmd5", col("t"))).head()
      val native = if (row.isNullAt(0)) None else Some(row.getString(0))
      assert(native == expected, s"native diverged: $xs")
    }
    assert(MinMd5.computeSeq(Nil).isEmpty)
  }

  test("dup clusters equal a local union-find on random pair graphs") {
    // ground truth: classic union-find over the same edges — the
    // distributed pointer-jumping propagation must label every vertex
    // with its component's min id, whatever the graph shape (chains,
    // stars, cycles, self-loops, parallel edges)
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(v => v -> find(v)).toMap
    }
    val edgeGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    for (edges <- samples(edgeGen, 6)) {
      val s = spark
      import s.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val want = unionFind(edges)
      // BOTH execution paths must agree with the truth: the driver
      // union-find fast path (default guard) and the distributed
      // pointer-jumping loop (forced with a zero guard)
      val fast = Dedup.dupClustersFromPairs(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == want, s"fast path, edges=$edges")
      val dist = Dedup.dupClustersFromPairs(pairs, driverMaxEdges = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == want, s"distributed path, edges=$edges")
    }
  }

  test("incremental admission: rejections are truly near-dups; identical docs never admitted") {
    // soundness, not completeness: LSH banding may miss a borderline
    // true pair (that is its contract), but every REJECTION must be
    // backed by a real verified Jaccard >= threshold against a real
    // index doc with the exactly-right rounded value — and an
    // identical doc (same shingle set -> same signatures -> same
    // bands) can never slip through
    val vocab = Seq("aa", "bb", "cc", "dd")
    val w = graft.functions.MinHashSigs.shingleWidth
    val docGen = Gen.listOfN(8, Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
    for (ws <- samples(docGen, 5)) {
      val s = spark
      import s.implicits._
      val texts = ws.map(_.mkString(" "))
      val idxRows = texts.take(4).zipWithIndex.map { case (t, i) => (i.toLong, t, "src") }
      val newRows = texts.drop(4).zipWithIndex.map { case (t, i) => (10L + i, t, "src") }
      def sh(t: String) = graft.functions.NGrams.computeSeq(t.split(" ").toSeq, w).toSet
      def jac(a: Set[String], b: Set[String]) =
        a.intersect(b).size.toDouble / a.union(b).size
      val idxSh = idxRows.map { case (id, t, _) => id -> sh(t) }.toMap
      val newSh = newRows.map { case (id, t, _) => id -> sh(t) }.toMap
      val out = Dedup.incrementalDedup(idxRows.toDF("doc_id", "text", "source"),
        newRows.toDF("doc_id", "text", "source")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      assert(out.map(_._1).sorted.toSeq == newRows.map(_._1).sorted.toSeq,
        "ledger covers exactly the batch docs")
      out.foreach { case (d, m, j, adm) =>
        if (adm == 0L) {
          assert(idxSh.contains(m), s"doc $d matched non-index id $m")
          val tj = jac(newSh(d), idxSh(m))
          val tj6 = BigDecimal(tj).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(tj >= 0.5 && math.abs(tj6 - j) < 1e-9,
            s"doc $d match $m: reported $j, local $tj")
        } else assert(m == -1L && j == 0.0, s"admitted doc $d carries a match")
        if (idxSh.values.exists(_ == newSh(d)))
          assert(adm == 0L, s"identical doc $d admitted; texts=$texts")
      }
    }
  }

  test("repeated k-grams equal local set arithmetic on random corpora") {
    // local truth: distinct 5-grams per doc via the expression's Seq
    // twin, repeated = present in >= 2 docs' gram sets — the Spark
    // explode + window + rollup must reproduce the set arithmetic
    val vocab = Seq("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.listOfN(8, Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
    for (docsWords <- samples(docGen, 6)) {
      val s = spark
      import s.implicits._
      val rows = docsWords.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "), "src")
      }
      val gramSets = rows.map { case (id, text, _) =>
        id -> graft.functions.NGrams.computeSeq(text.split(" ").toSeq, 5).toSet
      }.toMap
      val want = gramSets.map { case (id, gs) =>
        val rep = gs.count(g => gramSets.exists { case (o, os) => o != id && os.contains(g) })
        id -> ((gs.size.toLong, rep.toLong))
      }
      val got = Dedup.repeatedKgrams(rows.toDF("doc_id", "text", "source")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, s"docs=$docsWords")
    }
  }

  test("rankcells: every codebook cell appears exactly once, best-first (random vectors)") {
    import graft.functions.RankCells
    val vecGen = Gen.listOfN(16, Gen.choose(-1.0, 1.0))
    // 8 genuinely distinct trials: a fresh query vector AND a fresh
    // 6-entry codebook per iteration (samples seeds Seed(42+i) per draw)
    val es = samples(vecGen, 8)
    val codebooks = samples(Gen.listOfN(6, vecGen), 8)
    for (i <- es.indices) {
      val e = es(i)
      val cb = codebooks(i).zipWithIndex.map { case (ce, c) =>
        (c.toLong, ce: Seq[Double], math.sqrt(ce.map(x => x * x).sum))
      }
      val ranked = RankCells.computeSeq(e, cb)
      // permutation property: all cells, no dup, no loss
      assert(ranked.sorted == (0L until 6L).toList, s"iter $i: $ranked")
      // best-first: recompute the rounded cosines and check monotone
      val nrm = math.sqrt(e.map(x => x * x).sum)
      def cos(c: Long): Double = {
        val (_, ce, cnrm) = cb(c.toInt)
        val dp = e.zip(ce).map { case (a, b) => a * b }.sum
        java.math.BigDecimal.valueOf(dp / (nrm * cnrm))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
      val cosines = ranked.map(cos)
      assert(cosines == cosines.sortBy(-_), s"iter $i not descending: $cosines")
    }
  }

  test("chunkDocs reconstructs every document exactly (random lengths)") {
    import graft.ext.Curation
    val s = spark
    import s.implicits._
    val lenGen = Gen.oneOf(Gen.choose(0, 10), Gen.choose(140, 160),
      Gen.choose(190, 210), Gen.choose(290, 310), Gen.choose(600, 700))
    val lens = samples(lenGen, 12)
    val rnd = new scala.util.Random(7)
    val d = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, rnd.alphanumeric.take(n).mkString, "web")
    }
    val df = d.map { case (id, t, src) => (id, t, src) }.toDF("doc_id", "text", "source")
    val byDoc = Curation.chunkDocs(df).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    for ((id, text, _) <- d) {
      val chunks = byDoc(id)
      val stride = Curation.chunkStride
      // chunk count law, geometry law, and full coverage with the
      // configured overlap: the stride-prefixes of all chunks but the
      // last, plus the last chunk, concatenate back to the document
      assert(chunks.length == 1 + math.max(text.length - 1, 0) / stride, s"doc $id count")
      assert(chunks.zipWithIndex.forall { case (r, i) => r.getLong(2) == 1L + i * stride })
      val rebuilt = chunks.init.map(r => text.substring((r.getLong(2) - 1).toInt,
          (r.getLong(2) - 1).toInt + stride)).mkString +
        text.substring((chunks.last.getLong(2) - 1).toInt)
      assert(rebuilt == text, s"doc $id (len ${text.length}) does not reconstruct")
      // digests actually describe the chunk bytes
      chunks.foreach { r =>
        val start = (r.getLong(2) - 1).toInt
        val chunk = text.substring(start, math.min(start + Curation.chunkSize, text.length))
        assert(r.getLong(3) == chunk.length)
      }
    }
  }

  test("admission ledger equals a sequential reference model (random corpora)") {
    import graft.ext.Curation
    // Every flag is guaranteed by CONSTRUCTION: clean docs are 10
    // unique alnum words (pass quality, share no benchmark 5-gram),
    // short docs fail the n_tokens >= 10 gate, contaminated docs embed
    // the benchmark's leading 5-gram inside unique filler, and dups
    // copy an earlier doc's text verbatim. A plain-Scala replay of the
    // sequential election (quality -> contamination -> exact survivor
    // -> near-dup survivor) is then exact truth for the DataFrame
    // plan, including the rescue case where a cluster's minimum doc
    // was dropped upstream.
    val benchText = "alpha beta gamma delta epsilon zeta"
    val nDocs = 24 // ids 1..24 < 53, so only doc 0 is benchmark
    val corpusGen = for {
      kinds <- Gen.listOfN(nDocs, Gen.frequency(
        (5, Gen.const("clean")), (2, Gen.const("short")),
        (2, Gen.const("contam")), (3, Gen.const("dup"))))
      dupRefs <- Gen.listOfN(nDocs, Gen.choose(0, nDocs - 1))
      clLabels <- Gen.listOfN(nDocs, Gen.option(Gen.choose(0, 4)))
    } yield (kinds, dupRefs, clLabels)
    for ((kinds, dupRefs, clLabels) <- samples(corpusGen, 5)) {
      val s = spark
      import s.implicits._
      def freshText(i: Int): String = kinds(i) match {
        case "short"  => s"s${i}a s${i}b"
        case "contam" => "alpha beta gamma delta epsilon " +
          (0 until 5).map(j => s"c$i$j").mkString(" ")
        case _        => (0 until 10).map(j => s"w$i$j").mkString(" ")
      }
      val texts = Array.ofDim[String](nDocs)
      for (i <- 0 until nDocs)
        texts(i) =
          if (kinds(i) == "dup" && dupRefs(i) < i) texts(dupRefs(i))
          else freshText(i)
      val docRows = (0 until nDocs).map(i =>
        ((i + 1).toLong, texts(i), if (i % 2 == 0) "web" else "books"))
      val clRows = clLabels.zipWithIndex.collect {
        case (Some(l), i) => ((i + 1).toLong, 1000L + l)
      }
      // reference model: flags derived from the TEXTS (so a dup of a
      // short or contaminated doc inherits its fate automatically)
      def grams(t: String) =
        t.split(" ").sliding(5).map(_.mkString(" ")).toSet
      val benchGrams = grams(benchText)
      val quality = docRows.map { case (id, t, _) =>
        id -> (t.split(" ").length >= 10) }.toMap
      val contam = docRows.map { case (id, t, _) =>
        id -> grams(t).exists(benchGrams) }.toMap
      val early = docRows.map { case (id, _, _) =>
        id -> (!quality(id) || contam(id)) }.toMap
      val keySurv = docRows.groupBy(_._2).map { case (t, ms) =>
        t -> ms.map(_._1).filterNot(early).sorted.headOption }
      val exactDrop = docRows.map { case (id, t, _) =>
        id -> (!early(id) && keySurv(t).get != id) }.toMap
      val clusterOf = clRows.toMap
      val clSurv = clRows.groupBy(_._2).map { case (c, ms) =>
        c -> ms.map(_._1).filter(id => !early(id) && !exactDrop(id))
          .sorted.headOption }
      val want = docRows.map { case (id, _, src) =>
        val reason =
          if (!quality(id)) "quality"
          else if (contam(id)) "contaminated"
          else if (exactDrop(id)) "exact_dup"
          else clusterOf.get(id) match {
            case Some(c) if clSurv(c).get != id => "near_dup"
            case _                              => "kept"
          }
        id -> ((src, reason))
      }.toMap
      val all = (0L, benchText, "web") +: docRows
      val got = Curation.admissionLedger(
        all.toDF("doc_id", "text", "source"),
        clRows.toDF("doc_id", "cluster_id")).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got == want, s"kinds=$kinds clusters=$clRows")
    }
  }

  test("sequencePack equals local per-source prefix-sum packing (random lengths)") {
    import graft.ext.Curation
    // The directed test covers the evenly-divisible case; here random
    // token counts — including docs LARGER than the budget, which make
    // pack numbers legitimately skip (cum jumps more than one budget) —
    // must match a local replay of the prefix-sum law exactly.
    val budget = 16
    val corpusGen = for {
      n    <- Gen.choose(6, 20)
      lens <- Gen.listOfN(n, Gen.oneOf(Gen.choose(1, 6), Gen.choose(14, 40)))
      srcs <- Gen.listOfN(n, Gen.oneOf("web", "books"))
    } yield lens.zip(srcs)
    for (rows <- samples(corpusGen, 6)) {
      val s = spark
      import s.implicits._
      val docs = rows.zipWithIndex.map { case ((len, src), i) =>
        ((i + 1).toLong, (1 to len).map(j => s"t$j").mkString(" "), src)
      }
      val want = docs.groupBy(_._3).flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, t, _) =>
          cum += t.split(" +").length.toLong
          (src, (cum - 1) / budget, id, t.split(" +").length.toLong)
        }
      }.groupBy(t => (t._1, t._2)).map { case (key, ms) =>
        key -> ((ms.size.toLong, ms.map(_._4).sum,
          ms.map(_._3).min, ms.map(_._3).max))
      }
      val got = Curation.sequencePack(
        docs.toDF("doc_id", "text", "source"), budget).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got == want, s"rows=$rows")
    }
  }

  test("shardManifest equals a local md5-shuffle replay (random id sets)") {
    import graft.ext.Curation
    // The order-sensitive checksum verifies the exact shuffle order,
    // so the local truth must replay the full derivation: hkey =
    // md5(id + ":shuffle"), shard = first 4 hex digits mod numShards,
    // pos = rank within the shard ordered by (hkey, id).
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val idsGen = Gen.choose(10, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 5000000L)).map(_.distinct))
    for (ids <- samples(idsGen, 6)) {
      val s = spark
      import s.implicits._
      val local = ids.map { id =>
        val hkey = md5hex(s"$id:shuffle")
        (id, hkey, java.lang.Long.parseLong(hkey.substring(0, 4), 16) %
          Curation.numShards)
      }
      val want = local.groupBy(_._3).map { case (shard, ms) =>
        val ordered = ms.sortBy(m => (m._2, m._1))
        shard -> ((ordered.size.toLong, ordered.head._1, ordered.last._1,
          ordered.zipWithIndex.map { case (m, i) => (i + 1L) * m._1 }.sum))
      }
      val got = Curation.shardManifest(ids.toDF("doc_id")).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == want, s"ids=$ids")
    }
  }

  test("md5-gated sampling and split assignment equal a local hash replay") {
    import graft.ext.Curation
    // Random ids and random SOURCE NAMES vary the per-source keep-rate
    // (10-89%) and push doc hashes across the 90/95 split thresholds —
    // edges a fixed corpus's handful of sources barely exercises. The
    // local truth replays the gate: first 4 md5 hex digits, mod, compare.
    def h4(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    val corpusGen = for {
      n    <- Gen.choose(20, 60)
      ids  <- Gen.listOfN(n, Gen.choose(0L, 5000000L)).map(_.distinct)
      srcs <- Gen.listOfN(n, Gen.alphaLowerStr.map(s => "s" + s.take(6)))
    } yield ids.zip(srcs)
    for (rows <- samples(corpusGen, 6)) {
      val s = spark
      import s.implicits._
      val docs = rows.map { case (id, src) => (id, "w1 w2 w3", src) }
      val df = docs.toDF("doc_id", "text", "source")
      val wantMix = rows.groupBy(_._2).map { case (src, ms) =>
        val rate = h4(src) % 80 + 10
        val kept = ms.count { case (id, _) => h4(id.toString) % 100 < rate }
        src -> ((ms.size.toLong, kept.toLong, rate,
          BigDecimal(kept.toDouble / ms.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      val gotMix = Curation.sampleMix(df).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(gotMix == wantMix, s"rows=$rows")
      val wantSplit = rows.groupBy { case (id, src) =>
        val h = h4(id.toString) % 100
        (src, if (h < 90) "train" else if (h < 95) "val" else "test")
      }.map { case (key, ms) => key -> ((ms.size.toLong, 3L * ms.size)) }
      val gotSplit = Curation.splitAssign(df).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(gotSplit == wantSplit, s"rows=$rows")
    }
  }

  test("quantize matches a local int8 reference on random vectors") {
    import graft.ext.Similarity
    val s = spark
    import s.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-4.0, 4.0))
    val vecs = samples(vecGen, 10).zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
    val out = Similarity.quantize(vecs.toDF("vec_id", "embedding")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((id, v) <- vecs) {
      val e = v.map(_.toDouble)
      val scale = math.max(e.map(math.abs).max, 1e-12) / 127
      val sse = e.map { x =>
        val q = java.math.BigDecimal.valueOf(x / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        math.pow(x - q * scale, 2)
      }.sum
      val nmse = sse / (e.length * scale * scale)
      val (gotScale, gotNmse) = out(id)
      assert(math.abs(gotScale - scale) < 5e-9, s"vec $id scale")
      assert(math.abs(gotNmse - nmse) < 1e-4, s"vec $id nmse: $gotNmse vs $nmse")
      assert(gotNmse >= 0 && gotNmse <= 0.25 + 1e-9, s"vec $id nmse bound")
    }
  }

  test("resampleInterp equals a local replay on random gappy tick series") {
    import java.sql.Timestamp
    import graft.analytics.Indicators
    val s = spark
    import s.implicits._
    // random subsets of a 12-minute grid with random values: every
    // minute present in [min, max] must come back, interior gaps
    // linearly blended, anchors exact
    val tickGen = Gen.zip(Gen.choose(0, 11), Gen.choose(1.0, 99.0))
    for (round <- 0 until 4) {
      val ticks = samples(Gen.listOfN(6, tickGen), 4)(round)
        .groupBy(_._1).view.mapValues(_.head._2).toSeq.sortBy(_._1)
      val rows = ticks.zipWithIndex.map { case ((m, v), i) =>
        (i.toLong, Timestamp.valueOf(f"2024-01-01 00:$m%02d:30"), "x", v)
      }
      val out = Indicators.resampleInterp(rows.toDF("event_id", "ts", "event_type", "value"))
        .collect().map(r => r.getTimestamp(1).getMinutes -> r.getDouble(2)).toMap
      val lo = ticks.head._1; val hi = ticks.last._1
      assert(out.keySet == (lo to hi).toSet, s"round $round grid")
      for (m <- lo to hi) {
        val prev = ticks.filter(_._1 <= m).last
        val next = ticks.find(_._1 >= m).get
        val want =
          if (prev._1 == next._1) prev._2
          else prev._2 + (next._2 - prev._2) *
            ((m - prev._1).toDouble * 60 / ((next._1 - prev._1).toDouble * 60))
        assert(out(m) == want, s"round $round minute $m: ${out(m)} vs $want")
      }
    }
  }

  test("cohortRetention equals a brute-force replay on random event streams") {
    import java.sql.Timestamp
    import graft.analytics.Indicators
    val s = spark
    import s.implicits._
    // users × random active days across 4 weeks starting Mon 2024-01-01
    val evGen = Gen.zip(Gen.choose(0L, 7L), Gen.choose(0, 27))
    for (round <- 0 until 3) {
      val evs = samples(Gen.listOfN(25, evGen), 3)(round).distinct
      val rows = evs.zipWithIndex.map { case ((u, day), i) =>
        (i.toLong, Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), u, "click", 1.0)
      }
      val out = Indicators.cohortRetention(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      // reference: week index = day / 7 (days 0-27 from the Monday anchor)
      val firstWeek = evs.groupBy(_._1).view.mapValues(_.map(_._2 / 7).min).toMap
      val cohortSize = firstWeek.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val expected = evs.map { case (u, d) => (firstWeek(u), d / 7 - firstWeek(u), u) }
        .distinct.groupBy(t => (t._1, t._2)).map { case ((cw, off), us) =>
          (Timestamp.valueOf(f"2024-01-${cw * 7 + 1}%02d 00:00:00"), off.toLong) ->
            ((us.size.toLong, cohortSize(cw)))
        }
      assert(out == expected, s"round $round: $out vs $expected")
    }
  }

  test("bpePairs equals brute-force adjacent-pair counting on random corpora") {
    import graft.ext.TextOps
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "bb", "c", "dd", "e")
    val docGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    for (round <- 0 until 3) {
      val docs = samples(Gen.listOfN(12, docGen), 3)(round).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "src", 0L) }
      val out = TextOps.bpePairs(
        docs.toDF("doc_id", "text", "lang", "source", "n_chars"), k = 100)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      // reference: count adjacent pairs over docs with >= 2 tokens
      val expected = docs.flatMap { case (_, text, _, _, _) =>
        val t = text.split(" +").toSeq
        if (t.length < 2) Nil else t.sliding(2).map(_.mkString(" ")).toSeq
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(out.map(p => p._1 -> p._2).toMap == expected, s"round $round")
      // ranks are 1..n in (count desc, pair asc) order
      val sorted = out.sortBy(p => (-p._2, p._1))
      assert(sorted.map(_._3).toSeq == (1 to sorted.length).toSeq, s"round $round ranks")
    }
  }

  test("sourceOverlap equals brute-force gram-set arithmetic on random corpora") {
    import graft.ext.Curation
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "bb", "c", "dd", "e", "ff", "g", "hh")
    val srcs = Seq("web", "blog", "forum", "wiki")
    val docGen = Gen.zip(Gen.oneOf(srcs), Gen.choose(2, 7)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
    for (round <- 0 until 4) {
      val docs = samples(Gen.listOfN(10, docGen), 4)(round).zipWithIndex
        .map { case ((src, ws), i) => (i.toLong, ws.mkString(" "), src) }
      val out = Curation.sourceOverlap(docs.toDF("doc_id", "text", "source"), n = 2)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // reference: per-source distinct 2-gram sets (clamped grams for 1-token docs)
      val sets = docs.groupBy(_._3).view.mapValues(_.flatMap { case (_, text, _) =>
        val t = text.split(" +").toSeq
        (0 to math.max(t.length - 2, 0)).map(i => t.slice(i, i + 2).mkString(" "))
      }.toSet).toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        shared = (sets(a) & sets(b)).size if shared > 0
      } yield (a, b) -> ((shared.toLong, sets(a).size.toLong, sets(b).size.toLong))).toMap
      assert(out == expected, s"round $round: $out vs $expected")
    }
  }

  test("pq kernels: native path and Seq twin equal a naive reference (random codebooks)") {
    import org.apache.spark.sql.functions._
    import graft.functions.PqKernel
    val s = spark
    import s.implicits._
    val m = 2; val sub = 4
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecGen = Gen.listOfN(m * sub, Gen.choose(-2.0, 2.0))
    val codeIds = Seq(0, 2, 5) // non-contiguous: lookup must be by VALUE
    for ((e, i) <- samples(vecGen, 8).zipWithIndex) {
      val cbs: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { cbS =>
        codeIds.map(c => c -> samples(vecGen, 8)((i + c + cbS) % 8).take(sub))
      }
      def dist(cbS: Int, cent: Seq[Double]): Double =
        (0 until sub).map { j => val d = e(cbS * sub + j) - cent(j); d * d }.sum
      val wantCodes = (0 until m).map(cbS =>
        cbs(cbS).map { case (c, cent) => (r6(dist(cbS, cent)), c) }.min._2)
      val wantErr = r6((0 until m).map(cbS =>
        cbs(cbS).map { case (c, cent) => (r6(dist(cbS, cent)), c) }.min._1).sum)
      val (gotCodes, gotErr) = PqKernel.assignSeq(e, cbs)
      assert(gotCodes == wantCodes && gotErr == wantErr, s"twin diverged: e=$e")
      // ADC reference for the assigned codes, plus a guaranteed miss
      val wantAdc = (0 until m).map(cbS =>
        dist(cbS, cbs(cbS).find(_._1 == wantCodes(cbS)).get._2)).sum
      assert(PqKernel.adcSeq(e, wantCodes, cbs).contains(wantAdc))
      assert(PqKernel.adcSeq(e, Seq.fill(m)(99), cbs).isEmpty)
      // the NATIVE ArrayData pass (what codegen calls), not just the twin
      val row = Seq((e, cbs)).toDF("e", "cb")
        .select(call_function("graft_pqassign", col("e"), col("cb")).as("pa"),
          call_function("graft_pqadc", col("e"), typedLit(wantCodes), col("cb")).as("adc"))
        .head()
      val pa = row.getStruct(0)
      assert(pa.getSeq[Int](0) == wantCodes && pa.getDouble(1) == wantErr,
        s"native assign diverged: e=$e")
      assert(row.getDouble(1) == wantAdc, s"native adc diverged: e=$e")
    }
  }

  test("Delta path codec: encode/decode round-trips any path; decode never throws") {
    val pathChar = Gen.frequency(
      (8, Gen.alphaNumChar),
      // the full URI-reserved set the writer must escape, plus unreserved
      // marks and multi-byte UTF-8 (escaped per byte and reassembled)
      (2, Gen.oneOf('%', '+', ' ', '/', '.', '-', '_', '#', '?', ';', '&',
        '=', '[', ']', ':', '@', ',', '$', '!', '~', '*', '\'', '(', ')')),
      (1, Gen.oneOf('é', '中', 'ß', '→', 'ж')))
    val gen = Gen.listOf(pathChar).map(_.mkString)
    for (p <- samples(gen, 200)) {
      assert(graft.sources.DeltaLog.pathCodecRoundtrip(p) == p,
        s"round-trip broke for ${p.map(c => f"$c%c(${c.toInt}%02x)").mkString}")
    }
    // supplementary-plane chars (surrogate PAIRS — unreachable through the
    // Char generator): both the escaped round-trip and a RAW unescaped
    // pair in a spec-violating foreign log must survive decode intact
    val clef = new String(Character.toChars(0x1D11E))
    assert(graft.sources.DeltaLog.pathCodecRoundtrip(s"data-$clef.parquet") ==
      s"data-$clef.parquet")
    assert(graft.sources.DeltaLog.pathDecode(s"data-$clef%20x.parquet") ==
      s"data-$clef x.parquet")
    // leniency: arbitrary junk (including malformed % escapes) must decode
    // to SOMETHING rather than crash — a wrong path fails loudly at the
    // file system, a decoder crash hides which path was at fault
    val junk = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    for (p <- samples(junk, 200)) {
      graft.sources.DeltaLog.pathDecode(p) // raw junk, malformed escapes included
      graft.sources.DeltaLog.pathDecode("%" + p)
      graft.sources.DeltaLog.pathDecode(p + "%")
      graft.sources.DeltaLog.pathDecode(p + "%z9")
    }
  }

  test("rangeTriples over-approximates every conjunctive filter (pushdown soundness)") {
    import org.apache.spark.sql.{sources => sf}
    // random conjunctions of range/equality filters over one column;
    // any value satisfying ALL filters must fall inside the triple's
    // [lo, hi] envelope — the property whole-file skipping relies on
    val boundGen = Gen.choose(-100L, 100L)
    val filterGen: Gen[sf.Filter] = Gen.oneOf(
      boundGen.map(v => sf.EqualTo("c", v)),
      boundGen.map(v => sf.GreaterThan("c", v)),
      boundGen.map(v => sf.GreaterThanOrEqual("c", v)),
      boundGen.map(v => sf.LessThan("c", v)),
      boundGen.map(v => sf.LessThanOrEqual("c", v)),
      for (a <- boundGen; b <- boundGen)
        yield sf.And(sf.GreaterThanOrEqual("c", a), sf.LessThanOrEqual("c", b)))
    val conjGen = Gen.listOfN(3, filterGen)
    def sat(f: sf.Filter, v: Long): Boolean = f match {
      case sf.EqualTo(_, x) => v == x.asInstanceOf[Long]
      case sf.GreaterThan(_, x) => v > x.asInstanceOf[Long]
      case sf.GreaterThanOrEqual(_, x) => v >= x.asInstanceOf[Long]
      case sf.LessThan(_, x) => v < x.asInstanceOf[Long]
      case sf.LessThanOrEqual(_, x) => v <= x.asInstanceOf[Long]
      case sf.And(a, b) => sat(a, v) && sat(b, v)
      case _ => true
    }
    for (filters <- samples(conjGen, 40)) {
      val triples = graft.streaming.TxLogScan.rangeTriples(filters.toArray)
      val lo = triples.collectFirst { case ("c", l, _) if l != null => l.asInstanceOf[Long] }
      val hi = triples.collectFirst { case ("c", _, h) if h != null => h.asInstanceOf[Long] }
      (-110L to 110L).foreach { v =>
        if (filters.forall(sat(_, v))) {
          assert(lo.forall(v >= _) && hi.forall(v <= _),
            s"value $v satisfies $filters but falls outside envelope [$lo, $hi]")
        }
      }
    }
  }
}
