package graft

import org.apache.spark.sql.DataFrame

import graft.ext.TextOps

/** Token counting / quality / language-ID / fingerprint semantics. */
class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text, lang) => (id, text, lang, "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("token counts: whitespace vs BPE-ish tokens") {
    val out = TextOps.tokenCounts(docs((1L, "hello world, it's 42", "en"))).head()
    assert(out.getInt(1) == 20)  // n_chars
    assert(out.getInt(2) == 4)   // whitespace tokens
    // BPE-ish: hello|world|,|it|'|s|42 = 7
    assert(out.getInt(3) == 7)
  }

  test("quality: short docs are dropped, normal prose kept") {
    val good = "the quick brown fox jumps over a lazy dog in the warm sun today"
    val out = TextOps.quality(docs((1L, good, "en"), (2L, "too short", "en")))
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(5))   // keep
    assert(!out(1).getBoolean(5))  // n_tokens < 10
  }

  test("language ID picks the language with most marker hits") {
    val out = TextOps.langId(docs(
      (1L, "the cat is on the mat and the dog", "en"),
      (2L, "der hund ist und das haus ist gross", "de"),
      (3L, "qwzx vbnm ghjk", "xx")))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("en") == "en")
    assert(out("de") == "de")
    assert(out("xx") == "unknown")
  }

  test("vocab report: terms, tokens, hapax fraction, top-N coverage") {
    val out = TextOps.vocabReport(docs(
      (1L, "the cat sat", "en"),
      (2L, "the dog sat", "en"),
      (3L, "the end", "en")), topN = 2).head()
    // terms: the(3) sat(2) cat(1) dog(1) end(1) -> 5 terms, 8 tokens, 3 hapax
    assert(out.getLong(0) == 5 && out.getLong(1) == 8 && out.getLong(2) == 3)
    assert(out.getDouble(3) == 0.6)
    // top-2 by (freq desc, term asc) = the(3) + sat(2) = 5/8
    assert(out.getDouble(4) == 0.625)
  }

  test("fingerprint: same normalized content => same fingerprints") {
    val out = TextOps.fingerprint(docs(
      (1L, "Alpha Beta: Gamma, Delta Epsilon Zeta!", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "en"),
      (3L, "different content entirely here now folks", "en")))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == out(1).getString(1)) // exact_fp
    assert(out(0).getString(2) == out(1).getString(2)) // content_fp
    assert(out(0).getString(1) != out(2).getString(1))
  }

  test("bpe pairs: adjacent-pair counts, rank order, short docs excluded") {
    val out = TextOps.bpePairs(docs(
      (1L, "a b a b c", "en"),     // pairs: a b, b a, a b, b c
      (2L, "a b", "en"),           // pairs: a b
      (3L, "solo", "en")), k = 3)  // no pairs (1 token)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // a b ×3, then (b a, b c) ×1 tie broken by pair asc
    assert(out.toSeq == Seq(("a b", 3L, 1), ("b a", 1L, 2), ("b c", 1L, 3)))
  }

  test("lm score: add-1 bigram model matches hand math; repeated text outranks shuffled") {
    // corpus: "a b a b" (doc 1) and "b a" (doc 2)
    // bigrams: (a,b)x2, (b,a)x2 → C(a,b)=2 C(b,a)=2, heads C(a)=2 C(b)=2, V=2
    // P(b|a) = (2+1)/(2+2) = 0.75 for every observed bigram
    val out = TextOps.lmScore(docs((1L, "a b a b", "en"), (2L, "b a", "en")))
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    val expected = BigDecimal(math.log(0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("lm_score") == expected)
    assert(out(1).getAs[Double]("lm_score") == expected)
    // fluency ranking: a doc of common bigrams scores above one whose
    // bigrams are rare in the corpus
    val ranked = TextOps.lmScore(docs(
      (1L, "the cat sat", "en"), (2L, "the cat sat", "en"),
      (3L, "the cat sat", "en"), (4L, "sat the cat", "en")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    assert(ranked(1L) > ranked(4L), "common word order must outscore rare order")
  }

  test("bpe train: greedy merges with deterministic tie-breaks, hand-traced") {
    // "a a a b a b": pairs (a,a)x2 (a,b)x2 (b,a)x1 → tie at 2 broken
    // lexicographically → merge (a,a) greedily: [aa, a, b, a, b].
    // Round 2: (a,b)x2 wins → [aa, ab, ab]. Round 3: (aa,ab) vs (ab,ab)
    // tie at 1 → lexicographic → (aa, ab).
    val out = TextOps.bpeTrain(docs((1L, "a a a b a b", "en")), merges = 3)
      .orderBy("merge_rank").collect()
    assert(out(0).getString(1) == "a a" && out(0).getLong(2) == 2L)
    assert(out(1).getString(1) == "a b" && out(1).getLong(2) == 2L)
    assert(out(2).getString(1) == "a a a b" && out(2).getLong(2) == 1L)
  }

  test("batched bpe equals sequential when the top pairs are token-disjoint") {
    // disjoint top pairs with separated counts: 3× "aa bb", 2× "cc dd",
    // 1× "ee ff" — merging one pair cannot touch another's count, and a
    // merged doc collapses to one token (no new pairs), so batched
    // (1 round × 2 merges) must equal sequential (2 rounds × 1 merge)
    val corpus = docs(
      (1L, "aa bb", "en"), (2L, "aa bb", "en"), (3L, "aa bb", "en"),
      (4L, "cc dd", "en"), (5L, "cc dd", "en"),
      (6L, "ee ff", "en"))
    val seq = TextOps.bpeTrain(corpus, merges = 2)
      .orderBy("merge_rank").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val bat = TextOps.bpeTrainBatched(corpus, merges = 2, batchK = 2)
      .orderBy("merge_rank").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(seq.toSeq == Seq((1, "aa bb", 3L), (2, "cc dd", 2L)))
    assert(bat.toSeq == seq.toSeq,
      "disjoint top pairs: one batched round ≡ two sequential rounds")
  }

  test("batched bpe greedily skips a token-sharing pair within a round") {
    // (aa,bb)x3 tops; (bb,cc)x2 shares bb with it, so the batch must
    // skip it and take (dd,ee)x1 — while the SEQUENTIAL trainer, whose
    // round-2 counts see (bb,cc) intact after the first merge, picks
    // (bb,cc): the documented ranking divergence of batching
    val corpus = docs(
      (1L, "aa bb", "en"), (2L, "aa bb", "en"), (3L, "aa bb", "en"),
      (4L, "bb cc", "en"), (5L, "bb cc", "en"),
      (6L, "dd ee", "en"))
    val bat = TextOps.bpeTrainBatched(corpus, merges = 2, batchK = 2)
      .orderBy("merge_rank").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(bat.toSeq == Seq(("aa bb", 3L), ("dd ee", 1L)))
    val seq = TextOps.bpeTrain(corpus, merges = 2)
      .orderBy("merge_rank").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(seq.toSeq == Seq(("aa bb", 3L), ("bb cc", 2L)))
  }

  test("batched bpe spills a partial batch into the next round") {
    // merges=3, batchK=2: round 1 takes 2 disjoint pairs, round 2 takes
    // the single remaining merge — counts for round 2 come AFTER the
    // first batch applied
    val corpus = docs(
      (1L, "aa bb", "en"), (2L, "aa bb", "en"), (3L, "aa bb", "en"),
      (4L, "cc dd", "en"), (5L, "cc dd", "en"),
      (6L, "ee ff", "en"))
    val bat = TextOps.bpeTrainBatched(corpus, merges = 3, batchK = 2)
      .orderBy("merge_rank").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(bat.toSeq == Seq((1, "aa bb", 3L), (2, "cc dd", 2L), (3, "ee ff", 1L)))
  }

  test("bpe encode: trained merges collapse pairs; chained merges and empty docs hand-traced") {
    // merges learned on this corpus (merges=2, batchK=2): (aa,bb) x4 then
    // (cc,dd) x3 — disjoint, one batch. Encoding re-applies them:
    //   "aa bb"        -> [aa bb]            1 token  (base 2)
    //   "cc dd"        -> [cc dd]            1 token  (base 2)
    //   "ee ff"        -> untouched          2 tokens (base 2)
    //   "aa bb cc dd"  -> [aa bb, cc dd]     2 tokens (base 4)
    //   "!!!"          -> ONE empty token under the shared tokenizer
    //                     (TextNorm.toks convention) -> 1 (base 1)
    val corpus = docs(
      (1L, "aa bb", "en"), (2L, "aa bb", "en"), (3L, "aa bb", "en"),
      (4L, "cc dd", "en"), (5L, "cc dd", "en"),
      (6L, "ee ff", "en"),
      (7L, "aa bb cc dd", "en"),
      (8L, "!!!", "en"))
    val out = TextOps.bpeEncode(corpus, merges = 2, batchK = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L),
      (4L, 1L, 2L), (5L, 1L, 2L),
      (6L, 2L, 2L),
      (7L, 2L, 4L),
      (8L, 1L, 1L)))
  }

  test("bm25: term-matching docs rank by saturating tf, misses never appear") {
    val corpus = docs(
      (1L, "spark join spark join spark", "en"),   // both terms, high tf
      (2L, "spark window window window", "en"),    // one term
      (3L, "filter sort merge hash", "en"),        // no query term
      (4L, "spark join window filter", "en"))      // both terms, tf=1 each
    val out = TextOps.bm25TopK(corpus,
      queries = Seq("q" -> Seq("spark", "join")), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val ids = out.map(_._2).toSet
    assert(!ids.contains(3L), "a doc with no query term must not score")
    assert(ids == Set(1L, 2L, 4L))
    // ranks are contiguous from 1 and scores non-increasing
    val byRank = out.sortBy(_._4)
    assert(byRank.map(_._4).toSeq == (1 to out.length).toSeq)
    assert(byRank.sliding(2).forall(p => p.head._3 >= p.last._3))
    // the double-term doc with the highest tf wins
    assert(byRank.head._2 == 1L)
    // matching both terms beats matching one, despite lower single-term tf
    val rank4 = out.find(_._2 == 4L).get._4
    val rank2 = out.find(_._2 == 2L).get._4
    assert(rank4 < rank2,
      "two matched terms (idf-summed) outrank one term's repeated tf")
  }

  test("length histogram: power-of-two buckets with exact edges") {
    val out = TextOps.lengthHistogram(docs(
      (1L, "one", "en"),                          // 1 token  -> bucket 0
      (2L, "a b c d e f g h", "en"),              // 8 tokens -> bucket 3
      (3L, "a b c d e f g h i j k l m n o", "en") // 15 tokens -> bucket 3
    )).orderBy("bucket").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq((0, 1L, 1L, 1L, 0.333333), (3, 8L, 15L, 2L, 0.666667)))
  }
}
