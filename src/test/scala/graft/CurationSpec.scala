package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Curation

/** Curation semantics on constructed corpora: decontamination overlap,
  * repetition ratios, deterministic stratified sampling.
  */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("decontaminate flags only train docs sharing an n-gram with the benchmark set") {
    val bench = "alpha beta gamma delta epsilon zeta"          // doc 0 -> benchmark (0 % 53 == 0)
    val d = docs(
      (0L, bench, "web"),
      (1L, "prefix words alpha beta gamma delta epsilon tail", "web"), // shares the 5-gram
      (2L, "completely different content with no overlap at all", "web"),
      (3L, "another clean document of unrelated words entirely", "books"))
    val out = Curation.decontaminate(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("web") == ((2L, 1L)), s"web: one of two train docs contaminated, got ${out("web")}")
    assert(out("books") == ((1L, 0L)))
  }

  test("admissionLedger: sequential survivors, one precedence-ordered reason per doc") {
    val s = spark
    import s.implicits._
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val d = docs(
      (0L, "alpha beta gamma delta epsilon zeta", "web"),       // benchmark (0 % 53)
      (1L, "prefix words alpha beta gamma delta epsilon tail more filler words here", "web"),
      (2L, "short text", "web"),                                // quality reject
      (3L, base, "web"),                                        // kept (exact survivor)
      (4L, base, "web"),                                        // exact dup of 3
      (5L, "a fully unique sentence with plenty of ordinary clean words inside", "books"),
      (6L, "alpha beta gamma delta epsilon", "web"),            // fails quality AND contaminated
      (7L, "tiny words", "web"),                                // quality reject, cluster-min of {7,8}
      (8L, "a perfectly ordinary clean document that deserves to stay in the set", "web"))
    val clusters = Seq(
      (3L, 3L), (5L, 3L),   // 5 near-dups 3; 3 survives
      (7L, 7L), (8L, 7L))   // cluster-min 7 is quality-dropped -> 8 is RESCUED
      .toDF("doc_id", "cluster_id")
    val out = Curation.admissionLedger(d, clusters).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!out.contains(0L), "benchmark doc must not appear in the ledger")
    assert(out == Map(
      1L -> "contaminated",
      2L -> "quality",
      3L -> "kept",
      4L -> "exact_dup",
      5L -> "near_dup",
      6L -> "quality",      // quality outranks contamination
      7L -> "quality",
      8L -> "kept"),        // sequential survivor: the whole cluster is NOT lost
      s"ledger: $out")
  }

  test("repetition: looping text scores high and is dropped; varied text keeps") {
    val d = docs(
      (1L, "spam ham spam ham spam ham spam ham spam ham", "web"),
      (2L, "each word here appears exactly once in this document", "web"))
    val byDoc = Curation.repetition(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(byDoc(1L)._1 > 0.7 && !byDoc(1L)._2, "looping 2-grams must be dropped")
    assert(byDoc(2L)._1 == 0.0 && byDoc(2L)._2)
  }

  test("sequencePack: contiguous docs fill a budget before the next pack opens") {
    // 5 docs × 4 tokens in one source; budget 8 → packs of 2 docs
    val d = docs((1L to 5L).map(i => (i, "tok tok tok tok", "web")): _*)
    val out = Curation.sequencePack(d, budget = 8).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(out(0L) == ((2L, 1L, 2L)), s"pack 0 = docs 1-2, got ${out.get(0L)}")
    assert(out(1L) == ((2L, 3L, 4L)))
    assert(out(2L) == ((1L, 5L, 5L)))
  }

  test("packSegments: spans tile each pack contiguously and agree with sequencePack") {
    // mixed lengths: 4+4 fills budget 8, then 6+2, then 4
    val texts = Seq("a a a a", "b b b b", "c c c c c c", "d d", "e e e e")
    val d = docs(texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t, "web") }: _*)
    val segs = Curation.packSegments(d, budget = 8).orderBy("pack_no", "seg_no")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(5), r.getLong(6)))
    // within every pack: seg 1 starts at 0, spans are contiguous
    segs.groupBy(_._1).foreach { case (pack, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._4 == 0L, s"pack $pack first span must start at 0")
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, e1), (_, _, _, s2, _)) =>
          assert(e1 == s2, s"pack $pack spans must be contiguous")
        case _ =>
      }
    }
    // doc→pack assignment identical to sequencePack's aggregate view
    val packs = Curation.sequencePack(d, budget = 8).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    segs.groupBy(_._1).foreach { case (pack, ss) =>
      val ids = ss.map(_._3).sorted
      assert(packs(pack) == ((ids.length.toLong, ids.head, ids.last)),
        s"pack $pack members diverge from sequencePack")
    }
  }

  test("packSegments plans ONE exchange: the pack window reuses the source partitioning") {
    val d = docs((1L to 6L).map(i => (i, "x x x", "web")): _*)
    val plan = Curation.packSegments(d, budget = 6).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange (source), got $exchanges:\n$plan")
  }

  test("sourceOverlap: shared grams and Jaccard match hand-counted sets; disjoint pairs absent") {
    // 2-gram sets (n=2): web={a b, b c}, blog={a b, b d}, forum={x y}
    val d = docs(
      (1L, "a b c", "web"),
      (2L, "a b d", "blog"),
      (3L, "x y", "forum"))
    val out = Curation.sourceOverlap(d, n = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // only (blog, web) share: "a b"; Jaccard = 1 / (2 + 2 - 1)
    assert(out.keySet == Set(("blog", "web")))
    assert(out(("blog", "web")) == ((1L, 2L, 2L, 0.333333)))
  }

  test("sourceOverlap spans more than 64 sources via multi-word masks") {
    // 70 sources straddle the 64-bit word boundary; each pair shares the
    // four common 2-grams and keeps two private ones: Jaccard = 4/8.
    val d = docs((0L until 70L).map(i =>
      (i, s"common shared tokens here plus unique$i filler$i", f"src$i%02d")): _*)
    val out = Curation.sourceOverlap(d, n = 2).collect()
    assert(out.length == 70 * 69 / 2)
    out.foreach { r =>
      assert(r.getLong(2) == 4L, s"${r.getString(0)}~${r.getString(1)} shared")
      assert(r.getLong(3) == 6L && r.getLong(4) == 6L)
      assert(r.getDouble(5) == 0.5)
    }
  }

  test("mixWeights: temperature flattens the mixture; weights sum to 1") {
    // web has 8x forum's tokens; at tau=1 weights would be 8:1, at
    // tau=0.7 the ratio must flatten to 8^0.7 ≈ 4.29
    val d = docs(
      (1L, Seq.fill(16)("w").mkString(" "), "web"),
      (2L, "f f", "forum"))
    val out = Curation.mixWeights(d, tau = 0.7).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nw, ww, _) = out("web"); val (nf, wf, ef) = out("forum")
    assert(nw == 16L && nf == 2L)
    assert(math.abs(ww + wf - 1.0) < 1e-6)
    assert(math.abs(ww / wf - math.pow(8, 0.7)) < 1e-4)
    // forum repeats more often than once per epoch of the mixture
    assert(ef > 1.0)
  }

  test("piiScrub counts and redacts email and digit-run patterns") {
    val d = docs(
      (1L, "contact me at alice.smith@example.com or 123456789012 thanks", "web"),
      (2L, "no sensitive content here at all", "web"))
    val out = Curation.piiScrub(d).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(2) == 1L, "one email")
    assert(r.getLong(3) == 1L, "one digit run")
    assert(r.getLong(4) == 1L, "one doc hit")
    assert(r.getLong(5) > 0L, "redaction shrank the text")
  }

  test("sampleMix: rates are deterministic, within [10, 89], and gate per doc hash") {
    val d = docs((1L to 200L).map(i => (i, s"text $i", if (i % 2 == 0) "web" else "books")): _*)
    val out = Curation.sampleMix(d).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val (n, kept, rate) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate >= 10 && rate <= 89)
      assert(kept <= n)
    }
    // deterministic: a second run yields byte-identical counts
    val again = Curation.sampleMix(d).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("splitAssign: docs never migrate between splits when the corpus grows") {
    import org.apache.spark.sql.functions._
    // the PRODUCTION gate (Curation.splitLabel — the same column
    // splitAssign groups by), evaluated per doc on both corpus sizes
    def perDoc(d: DataFrame) = d
      .select(col("doc_id"), Curation.splitLabel.as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = docs((1L to 50L).map(i => (i, s"doc $i text", "web")): _*)
    val grown = docs((1L to 200L).map(i => (i, s"doc $i text", "web")): _*)
    val sSmall = perDoc(small)
    val sGrown = perDoc(grown)
    sSmall.foreach { case (id, sp) => assert(sGrown(id) == sp, s"doc $id migrated") }
    // all three splits are actually populated at 200 docs, and the
    // aggregate report partitions the corpus exactly
    assert(sGrown.values.toSet == Set("train", "val", "test"))
    val out = Curation.splitAssign(small).collect()
    assert(out.map(_.getLong(2)).sum == 50L)
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // the report's per-split doc counts equal the per-doc gate's counts
    val fromGate = sSmall.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromReport = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(fromReport == fromGate)
  }

  test("shardManifest: order checksum is deterministic and shards partition the corpus") {
    val d = docs((1L to 100L).map(i => (i, s"text $i", "web")): _*)
    val rows = Curation.shardManifest(d).collect()
    val b = Curation.shardManifest(d.repartition(7)).collect().map(_.toSeq).toSet
    // cluster order / partitioning must not change the shuffle order
    assert(rows.map(_.toSeq).toSet == b)
    assert(rows.map(_.getLong(1)).sum == 100L)
  }

  test("chunkDocs: chunks tile the document with the configured overlap") {
    val text380 = "x" * 380
    val d = docs((1L, text380, "web"), (2L, "short", "web"), (3L, "", "web"))
    val byDoc = Curation.chunkDocs(d).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq).toMap
    // 380 chars, size 200 / stride 150 -> starts 1,151,301; last reaches char 380
    assert(byDoc(1L) == Seq((1L, 200L), (151L, 200L), (301L, 80L)))
    assert(byDoc(1L).map { case (s, l) => s + l - 1 }.max == 380L, "last chunk must reach the end")
    // consecutive chunks overlap by size - stride = 50 chars
    assert(byDoc(1L).sliding(2).forall {
      case Seq((s1, l1), (s2, _)) => s2 == s1 + 150 && s1 + l1 > s2
      case _ => true
    })
    assert(byDoc(2L) == Seq((1L, 5L)), "short doc = one chunk of its own length")
    assert(byDoc(3L) == Seq((1L, 0L)), "empty doc still yields one (empty) chunk row")
  }

  test("chunkPipeline drops junk and duplicate docs before chunking; packs tile the token stream") {
    val good = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod " * 8).trim
    val d = docs(
      (1L, good, "web"),
      (2L, good, "web"),               // exact dup of 1 -> no chunks
      (3L, "!!!! ???? ....", "web"),   // junk -> quality-dropped
      (4L, good + " extra tail words here", "books"))
    val out = Curation.chunkPipeline(d, budget = 128).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // web: only doc 1 survives; books: only doc 4
    val expectedChunksWeb = 1 + (good.length - 1) / Curation.chunkStride
    assert(out("web")._1 == expectedChunksWeb.toLong,
      s"web chunks: expected $expectedChunksWeb from the one surviving doc, got ${out("web")}")
    // chunk <= 200 chars => <= 100 whitespace tokens < budget, so pack
    // numbers can never skip: n_packs == ceil(n_tokens / budget) exactly
    out.foreach { case (src, (_, nPacks, nTokens)) =>
      assert(nPacks == (nTokens + 127) / 128, s"$src: packs $nPacks vs tokens $nTokens")
    }
  }

  test("chunkDocs plan is map-only: no exchange anywhere") {
    val d = docs((1L, "some text to chunk", "web"))
    val plan = Curation.chunkDocs(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("domainCap caps a hot domain at N lowest ids and its plan pushes the limit below the shuffle") {
    // hot domain with 600 docs vs the 64-doc cap; cold domain under it
    val d = docs(((1L to 600L).map(i => (i, s"t$i", "hot")) ++
      (601L to 610L).map(i => (i, s"t$i", "cold"))): _*)
    val out = Curation.domainCap(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.count(_._2 == "hot") == Curation.domainCapN)
    assert(out.filter(_._2 == "hot").map(_._1).toSet == (1L to Curation.domainCapN).toSet,
      "survivors must be the N lowest doc_ids")
    assert(out.count(_._2 == "cold") == 10, "under-cap domains keep everything")
    // the skew-safety claim: a per-partition top-N (WindowGroupLimit)
    // must run below the exchange so no task ever windows a whole domain
    val plan = Curation.domainCap(d).queryExecution.executedPlan.toString
    val limitIdx = plan.indexOf("WindowGroupLimit")
    assert(limitIdx >= 0, "rank-limit pushdown missing from the plan")
    assert(plan.indexOf("Exchange") >= 0 &&
      plan.lastIndexOf("WindowGroupLimit") > plan.indexOf("Exchange"),
      "expected a WindowGroupLimit on the map side of the exchange")
  }
}
