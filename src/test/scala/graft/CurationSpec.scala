package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Curation operators: PII redaction, repetition filter, decontamination,
  * sequence packing — crafted fixtures exercising each rule directly
  * (the oracle gate covers the documents-table path). */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("piiScrub redacts every class and leaves clean docs untouched") {
    // doc_id 3 (% 3 == 0) stays unaugmented; others gain the contact line
    val out = Curation.piiScrub(docs(3L -> "plain text only", 4L -> "body"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val clean = out(3L)
    assert(clean.getInt(1) == 0 && clean.getInt(2) == 0 &&
      clean.getInt(3) == 0 && clean.getInt(4) == 0)
    assert(clean.getInt(6) == 0) // len_delta: nothing redacted
    val dirty = out(4L)
    assert(dirty.getInt(1) == 2) // two emails in the contact line
    assert(dirty.getInt(2) == 1 && dirty.getInt(3) == 1 && dirty.getInt(4) == 1)
    assert(dirty.getInt(6) > 0)
  }

  test("piiScrub output contains no residual PII matches") {
    val aug = Curation.piiAugmented(docs(1L -> "x", 2L -> "y", 5L -> "z"))
    val scrubbedRe = Seq(Curation.EmailRe, Curation.SsnRe,
      Curation.PhoneRe, Curation.IpRe)
    val residual = scrubbedRe.map { re =>
      aug.withColumn("s",
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("aug"), Curation.EmailRe, "<EMAIL>"), Curation.SsnRe, "<SSN>"),
            Curation.PhoneRe, "<PHONE>"), Curation.IpRe, "<IP>"))
        .where(expr(s"s RLIKE '${re.replace("\\", "\\\\")}'")).count()
    }.sum
    assert(residual == 0L)
  }

  test("repetitionFilter: runs, bigram occupancy, keep decision") {
    val out = Curation.repetitionFilter(docs(
      1L -> "a a a a b",          // run of 4 'a', top bigram 'a a' ×3 of 4
      2L -> ('a' to 'z').mkString(" "))) // 26 distinct tokens, 25 unique bigrams
      .collect().map(r => r.getLong(0) -> r).toMap
    val rep = out(1L)
    assert(rep.getLong(1) == 4L)        // max_token_run
    assert(rep.getLong(2) == 4L)        // n_grams
    assert(rep.getLong(3) == 3L)        // top_gram_occ ('a a')
    assert(rep.getLong(4) == 3L)        // dup_gram_occ
    assert(!rep.getBoolean(7))          // dropped
    val ok = out(2L)
    assert(ok.getLong(1) == 1L)
    assert(ok.getLong(3) == 1L)         // all bigrams unique
    assert(ok.getLong(6) == 0L)         // dup_x1000
    assert(ok.getBoolean(7))            // kept: top 40‰ ≤ 50‰, dup 0
  }

  test("decontaminate flags exactly the docs sharing a 4-gram with the bench split") {
    // doc 7 is the benchmark (7 % 50 == 7); doc 1 shares its 4-gram twice
    // (distinct-gram semantics → n_shared_grams 1), doc 2 shares nothing
    val out = Curation.decontaminate(docs(
      7L -> "alpha beta gamma delta",
      1L -> "x alpha beta gamma delta y alpha beta gamma delta",
      2L -> "one two three four five"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(7L)) // bench docs are not scored
    assert(out(1L).getLong(1) == 1L && out(1L).getLong(2) == 1L &&
      out(1L).getBoolean(3))
    assert(out(2L).getLong(1) == 0L && !out(2L).getBoolean(3))
  }

  test("seqPack: offsets are contiguous per shard and block spans cover tokens") {
    val src = (0L until 200L).map(i => i -> ("w " * (i % 37 + 1).toInt).trim)
    val out = Curation.seqPack(docs(src: _*), shards = 4, seqLen = 64)
    val byShard = out.collect().groupBy(_.getLong(1))
    assert(byShard.size == 4)
    byShard.values.foreach { rs =>
      val ordered = rs.sortBy(_.getLong(0))
      // start_off of doc k == end_off (start+n_tokens) of doc k-1; first is 0
      ordered.foldLeft(0L) { (expectedStart, r) =>
        assert(r.getLong(3) == expectedStart)
        assert(r.getLong(4) == r.getLong(3) / 64)                     // start_block
        assert(r.getLong(5) == (r.getLong(3) + r.getInt(2) - 1) / 64) // end_block
        r.getLong(3) + r.getInt(2)
      }
    }
  }

  test("doc chunks: stride windows cover every token, overlap by 64") {
    val d = Seq((1L, ("w " * 448).trim), (2L, ("w " * 449).trim),
      (3L, "short doc")).toDF("doc_id", "text")
    val got = Curation.docChunks(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 448 tokens: [0,256) + [192,448); 449 adds [384,449); short: 1 chunk
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 256L), (1L, 1L, 192L, 448L),
      (2L, 0L, 0L, 256L), (2L, 1L, 192L, 448L), (2L, 2L, 384L, 449L),
      (3L, 0L, 0L, 2L)))
    // invariants: first chunk starts at 0, last ends at n, consecutive
    // chunks overlap by exactly window - stride
    got.groupBy(_._1).values.foreach { rs =>
      val s = rs.sortBy(_._2)
      assert(s.head._3 === 0L)
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + 192)
        case _ =>
      }
    }
  }

  test("pack stats: token conservation, tail-pad bound, cut consistency") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val pack = Curation.seqPack(docs).cache()
    val stats = Curation.packStats(docs).collect()
    // every shard row internally consistent; padding strictly under one
    // block; block count covers the token mass exactly
    stats.foreach { r =>
      val (total, nBlocks, tailPad) =
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("n_blocks"),
          r.getAs[Long]("tail_pad"))
      assert(tailPad >= 0 && tailPad < 2048, s"shard ${r.get(0)}")
      assert(nBlocks * 2048 === total + tailPad)
    }
    // conservation vs the packing layout itself
    val fromPack = pack.groupBy("shard")
      .agg(sum("n_tokens").as("t"), sum(expr("n_blocks - 1")).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    stats.foreach { r =>
      val (t, c) = fromPack(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("total_tokens") === t)
      assert(r.getAs[Long]("boundary_cuts") === c)
    }
    pack.unpersist()
  }

  test("curation funnel: first-failing-stage attribution, all classes live") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val funnel = Curation.curationFunnel(docs).cache()
    try {
      assert(funnel.count() === docs.count())
      val classes = funnel.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(classes.keySet === Set("benchmark", "lang", "quality",
        "repetition", "contaminated", "keep"),
        s"missing verdict classes: $classes")
      // priority: every non-'lang' verdict row must have predicted en
      // (a failing earlier stage always wins)
      assert(funnel.filter(col("verdict").isin("quality", "repetition",
        "contaminated", "keep") && col("predicted_lang") =!= "en").isEmpty)
      // benchmark split is exactly the held-out congruence class
      assert(funnel.filter((col("doc_id") % 50 === 7) =!=
        (col("verdict") === "benchmark")).isEmpty)
      // kept docs can still carry PII redactions (scrub, don't drop)
      assert(funnel.filter(col("verdict") === "keep" && col("n_pii") > 0)
        .count() > 0)
    } finally funnel.unpersist()
  }
}
