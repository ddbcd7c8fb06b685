package graft

import graft.operators.TextAnalysis

/** n-gram LM counts and BM25 ranking on a tiny hand-checkable corpus. */
class TextRankSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the cat"),
    (3L, "a dog sat on the mat and the dog sat on the mat again " +
      "and more and more words pad this document out considerably"),
    (4L, "zz yy xx"))
    .toDF("doc_id", "text")

  test("ngramCounts counts trigrams globally with a cutoff") {
    val m = TextAnalysis.ngramCounts(docs, n = 3, minCount = 2)
      .as[(String, Long)].collect().toMap
    // "sat on the": docs 1, 2, 3 (twice in 3) -> 4
    assert(m("sat on the") === 4L)
    // "the cat sat": docs 1 and 2 -> 2
    assert(m("the cat sat") === 2L)
    // below cutoff: "zz yy xx" appears once -> pruned
    assert(!m.contains("zz yy xx"))
  }

  test("bm25 saturates tf and penalizes long documents") {
    val r = TextAnalysis.bm25Rank(docs, Seq("cat", "mat"), k = 10)
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, h) => id -> ((s, h)) }.toMap
    // doc 2 (cat x2, short) must outrank doc 3 (mat x2 but much longer:
    // length norm divides its tf saturation down)
    assert(r(2)._1 > r(3)._1)
    // doc 1 hits both terms once
    assert(r(1)._2 === 2L)
    // doc 4 hits nothing
    assert(!r.contains(4L))
    // tf saturation: doc 2's two cats score < 2x doc 1's single cat
    // contribution (extract per-term weight by comparing hit counts)
    assert(r(2)._1 < 2L * r(1)._1)
  }

  test("LM familiarity: common-pattern docs score high, gibberish scores 0") {
    import spark.implicits._
    // 4 docs repeat the same sentence (its trigrams clear the cutoff);
    // one is pure gibberish (every trigram unique in the corpus)
    val common = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 4L).map(i => (i, common)) :+
      (9L, "zxq wvu tsr qpo nml kji hgf")).toDF("doc_id", "text")
    val lm = graft.operators.TextAnalysis.ngramCounts(docs, 3, 3)
    val got = graft.operators.TextAnalysis.lmFamiliarity(docs, lm)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("familiarity_pm"))
      .toMap
    assert(got(1L) === 1000L && got(4L) === 1000L)
    assert(got(9L) === 0L)
  }

  test("vocab coverage: top-V cut by (count desc, word), OOV per doc") {
    // corpus frequencies: "aa"×4, "bb"×3, "cc"×2, "dd"×2, "zz"×1 —
    // vocabSize 3 keeps {aa, bb, cc} (cc beats dd on the word tie-break)
    val docs = Seq(
      (1L, "aa aa bb cc"), (2L, "aa bb dd dd"), (3L, "aa bb cc zz"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, vocabSize = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((4L, 0L, 1000L)))
    assert(got(2L) === ((4L, 2L, 500L)))
    assert(got(3L) === ((4L, 1L, 750L)))
  }

  test("BPE: pair stats and merge sequence match the hand-derived run") {
    // the classic BPE walkthrough corpus (Sennrich et al. 2016 §3.2
    // shape): low x5, lower x2, newest x6, widest x3
    val corpus = Seq((1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val top = TextAnalysis.bpePairStats(corpus, k = 3)
      .as[(String, Long)].collect()
    // "e s" rides newest(6) + widest(3) = 9; "s t" and "t </w>" tie at 9
    // behind it lexicographically
    assert(top.head === (("e s", 9L)))
    assert(top.toSeq === Seq(("e s", 9L), ("s t", 9L), ("t </w>", 9L)))

    val merges = TextAnalysis.bpeTrain(corpus, numMerges = 5)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("gopherRules: first failing rule named, cascade order holds") {
    import spark.implicits._
    val docs = Seq(
      // 60 in-vocab words incl. 2 required stops → KEEP
      (1L, (Seq.fill(29)("the data") :+ "of be").mkString(" ")),
      (2L, "too short to keep"), // WORD_COUNT
      // 60 single-char words → mean length 100 < 300; word count passes
      (3L, Seq.fill(60)("a").mkString(" ")), // MEAN_WORD_LENGTH
      // hash-heavy: 15/115 symbol words = 13% > 10%, mean length in range
      (4L, (Seq.fill(50)("the data") ++ Seq.fill(15)("####"))
        .mkString(" ")), // SYMBOL_RATIO
      // 25/105 numeric words → alpha 761 < 800, everything above passes
      (5L, (Seq.fill(40)("the data") ++ Seq.fill(25)("1234"))
        .mkString(" ")), // ALPHA_FRACTION
      // clean text but only ONE required stopword
      (6L, Seq.fill(60)("the data").mkString(" "))) // STOPWORDS (only 'the')
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "KEEP", 2L -> "WORD_COUNT",
      3L -> "MEAN_WORD_LENGTH", 4L -> "SYMBOL_RATIO",
      5L -> "ALPHA_FRACTION", 6L -> "STOPWORDS"))
  }
}
