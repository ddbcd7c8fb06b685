package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators.Sampling

/** Deterministic sampling: exact per-stratum quotas, token-budget fill
  * invariants, reproducibility across partitionings. */
class SamplingSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("stratified sample takes exactly min(quota, |stratum|) per stratum") {
    val docs = T.documents(spark, sf)
    val quota = 10
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratifiedSample(docs, "lang", quota)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet)
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.min(quota.toLong, n), s"stratum $lang")
    }
  }

  test("sample is stable under repartitioning (order comes from the hash, not the layout)") {
    val docs = T.documents(spark, sf)
    val a = Sampling.stratifiedSample(docs, "lang", 15)
      .collect().map(_.toSeq).toSet
    val b = Sampling.stratifiedSample(docs.repartition(13), "lang", 15)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("corpus mix never exceeds the budget and fills it greedily") {
    val docs = T.documents(spark, sf)
    val budget = 500L
    val mix = Sampling.corpusMix(docs, "source", budget).collect()
    assert(mix.nonEmpty)
    val bySource = mix.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val total = rs.map(_.getAs[Long]("n_tokens")).sum
      assert(total <= budget, s"$src over budget")
      assert(total == rs.map(_.getAs[Long]("cum_tokens")).max, s"$src cumsum")
    }
    // greedy: the next doc in hash order would overflow the budget for at
    // least one source (i.e., the cut is tight, not arbitrary)
    val all = Sampling.corpusMix(docs, "source", Long.MaxValue)
    val next = all
      .join(Sampling.corpusMix(docs, "source", budget)
          .select(col("source"), col("cum_tokens"))
          .groupBy("source").agg(max("cum_tokens").as("taken")),
        Seq("source"))
      .filter(col("cum_tokens") > col("taken"))
      .groupBy("source").agg(min("cum_tokens").as("next_cum"))
    next.collect().foreach { r =>
      assert(r.getAs[Long]("next_cum") > budget,
        s"${r.getString(0)}: a fitting doc was skipped")
    }
  }

  test("mix weights damp large domains and upsample small ones (α = 1/2)") {
    import spark.implicits._
    // 100:1 token skew between web and rare
    val docs = ((1 to 100).map(i => (i.toLong, "web", "w " * 100)) ++
      (1 to 10).map(i => (100L + i, "rare", "w " * 10)))
      .toDF("doc_id", "source", "text")
    val out = Sampling.mixWeights(docs, "source", budgetTokens = 100000L)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    val (web, rare) = (out("web"), out("rare"))
    val totalTokens =
      web.getAs[Long]("tokens") + rare.getAs[Long]("tokens")
    def shareBp(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("tokens") * 10000 / totalTokens
    // smoothing compresses the ratio: the big domain's weight sits below
    // its token share, the small one's above
    assert(web.getAs[Long]("weight_bp") < shareBp(web))
    assert(rare.getAs[Long]("weight_bp") > shareBp(rare))
    // weights normalize (up to DIV truncation) and budget splits likewise
    val wSum = web.getAs[Long]("weight_bp") + rare.getAs[Long]("weight_bp")
    assert(wSum <= 10000 && wSum >= 9998)
    // sqrt(100x) = 10x: the smoothed ratio is the square root of the raw
    val ratio = web.getAs[Long]("weight_bp").toDouble /
      rare.getAs[Long]("weight_bp")
    assert(ratio > 9.0 && ratio < 11.0, s"smoothed ratio $ratio")
  }

  test("mix allocation: Hamilton apportionment sums exactly to the budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "x " * 100), (2L, "b", "x " * 100), (3L, "c", "x " * 100))
      .toDF("doc_id", "source", "text")
    // equal domains, budget 100: 100/3 floors to 33 each, 1 leftover goes
    // to the lexicographically-first domain of the tied remainders
    val got = Sampling.mixAllocation(docs, "source", 100L).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got("a") === ((33L, 34L)))
    assert(got("b") === ((33L, 33L)))
    assert(got("c") === ((33L, 33L)))
    // fixture corpus: the allocation is exact at any budget
    val alloc = Sampling.mixAllocation(
      T.documents(spark, "/root/testdata/sf0.001"), "source", 999983L)
    assert(alloc.agg(sum("alloc")).head.getLong(0) === 999983L)
    // and never drifts more than one token from the floor share
    assert(alloc.filter(col("alloc") - col("base_alloc") > 1).isEmpty)
  }

  test("data split: partition of the corpus, growth-stable, near the shares") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val split = Sampling.dataSplit(docs).cache()
    // a partition: every doc exactly once, split consistent with bucket
    assert(split.count() === docs.count())
    assert(split.filter(
      (col("bucket_pm") < 10 && col("split") =!= "test") ||
      (col("bucket_pm") >= 10 && col("bucket_pm") < 20 &&
        col("split") =!= "val") ||
      (col("bucket_pm") >= 20 && col("split") =!= "train")).isEmpty)
    // growth-stable: the assignment on a SUBSET equals the full run's
    val sub = Sampling.dataSplit(docs.filter(col("doc_id") % 3 === 0))
      .select("doc_id", "split")
    val full = split.select("doc_id", "split")
      .withColumnRenamed("split", "split_full")
    assert(sub.join(full, "doc_id")
      .filter(col("split") =!= col("split_full")).isEmpty)
    split.unpersist()
  }

  test("trainOrder: per-epoch permutations, round-robin domain slots") {
    val T = graft.core.Tables
    val rows = graft.operators.Sampling.trainOrder(
      T.documents(spark, sf)).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("slot"),
        r.getAs[String]("domain"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id")))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(0L, 1L))
    // every epoch covers the whole corpus exactly once
    val docs = rows.map(_._5).toSet
    byEpoch.values.foreach(e => assert(e.map(_._5).toSet === docs))
    // the two epochs are DIFFERENT permutations (seeded reshuffle)
    val order0 = byEpoch(0L).sortBy(_._2).map(_._5).toSeq
    val order1 = byEpoch(1L).sortBy(_._2).map(_._5).toSeq
    assert(order0 !== order1)
    // slots are unique per epoch and rotate domains round-robin:
    // slot mod |domains| identifies the domain for every row
    val nDomains = rows.map(_._3).distinct.length
    byEpoch.values.foreach { e =>
      assert(e.map(_._2).distinct.length === e.length)
      val domainOfIdx = e.map(r => (r._2 % nDomains) -> r._3).toMap
      e.foreach(r => assert(domainOfIdx(r._2 % nDomains) === r._3))
    }
    // deterministic: a second run reproduces the exact order
    val again = graft.operators.Sampling.trainOrder(
      T.documents(spark, sf)).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("slot"),
        r.getAs[Long]("doc_id")))
    assert(again.toSeq === rows.map(r => (r._1, r._2, r._5)).toSeq)
  }
}
