package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus-sampling operators for training-data pipelines:
 * exact-quota stratified sampling and token-budget corpus mixing.
 *
 * Both order documents by md5(doc_id) — a uniform, seedless, reproducible
 * shuffle of each stratum that any engine reproduces bit-for-bit (no RNG
 * state, no partition-order dependence). Scale shape: ONE shuffle on the
 * stratum key; the rank/cumsum window parallelizes per stratum. A skewed
 * stratum would salt the same way q_salted_volume_bytes does; there is no
 * global sort and no driver-side pass.
 */
object Sampling {

  private def hashOrderWindow(stratum: String) =
    Window.partitionBy(stratum)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))

  /** Exact-quota stratified sample: the first `quota` docs per stratum in
    * md5 order — every stratum contributes exactly min(quota, |stratum|)
    * docs, the degenerate-free alternative to Bernoulli sampleBy (whose
    * per-stratum counts only hold in expectation). */
  def stratifiedSample(docs: DataFrame, stratum: String,
                       quota: Int): DataFrame =
    docs
      .withColumn("sample_rank",
        row_number().over(hashOrderWindow(stratum)).cast("long"))
      .filter(col("sample_rank") <= quota)
      .select(col("doc_id"), col(stratum), col("sample_rank"))
      .orderBy(col(stratum), col("sample_rank"))

  /** Token-budget corpus mix: greedy hash-ordered fill per stratum — a doc
    * is kept while the running token total (inclusive) fits the stratum's
    * budget. Token counts are whitespace tokens (`\S+`), matching
    * [[TextAnalysis.textStats]]. */
  def corpusMix(docs: DataFrame, stratum: String,
                budgetTokens: Long): DataFrame =
    docs
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long"))
      .withColumn("cum_tokens",
        sum("n_tokens").over(hashOrderWindow(stratum)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col(stratum), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col(stratum), col("cum_tokens"))

  /**
   * Temperature-smoothed mixture weights (α = 1/2): per-domain sampling
   * probability p_i ∝ tokens_i^α — the exponent-smoothing rebalancing rule
   * for multi-domain/multilingual corpora (small domains are upsampled
   * relative to their share, large ones damped; α = 1 is proportional,
   * α = 0 uniform). All quantities stay integer: floor(sqrt(x)) is
   * engine-portable because IEEE-754 sqrt is correctly rounded (exact for
   * x < 2^52), and the weight/epoch math is basis-point DIV. epochs_bp >
   * 10000 means the domain repeats within the budget.
   *
   * Scale shape: one map-side-combined hash agg to per-domain totals
   * (domains are control-plane-small) + a 1-row broadcast normalizer.
   */
  def mixWeights(docs: DataFrame, domain: String,
                 budgetTokens: Long): DataFrame = {
    val per = docs
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long"))
      .groupBy(col(domain).as("domain"))
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .withColumn("isq", expr("CAST(floor(sqrt(tokens)) AS BIGINT)"))
    val total = per.agg(sum("isq").as("isq_total"))
    per.crossJoin(broadcast(total))
      .withColumn("weight_bp", expr("isq * 10000 DIV isq_total"))
      .withColumn("sampled_tokens",
        expr(s"$budgetTokens * weight_bp DIV 10000"))
      .withColumn("epochs_bp", expr("sampled_tokens * 10000 DIV tokens"))
      .select("domain", "docs", "tokens", "weight_bp", "sampled_tokens",
        "epochs_bp")
      .orderBy("domain")
  }

  /**
   * Exact token-budget apportionment across domains by largest remainder
   * (Hamilton's method) over the same √-smoothed weights as
   * [[mixWeights]]: base_i = ⌊B·isq_i / isq_total⌋, then the B − Σbase
   * leftover tokens go one each to the largest scaled remainders
   * (B·isq_i mod isq_total; ties broken by domain name). Unlike the
   * floor-only sampled_tokens of [[mixWeights]], Σ alloc == B exactly —
   * what a training loader actually schedules.
   *
   * Scale shape: identical to [[mixWeights]] up to the per-domain table
   * (one map-side-combined agg); the remainder-rank window runs over the
   * control-plane-sized domain list, like the reference's in-memory
   * snapshot chain fold.
   */
  def mixAllocation(docs: DataFrame, domain: String,
                    budgetTokens: Long): DataFrame = {
    val per = docs
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long"))
      .groupBy(col(domain).as("domain"))
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .withColumn("isq", expr("CAST(floor(sqrt(tokens)) AS BIGINT)"))
    val total = per.agg(sum("isq").as("isq_total"))
    val based = per.crossJoin(broadcast(total))
      .withColumn("base_alloc", expr(s"$budgetTokens * isq DIV isq_total"))
      .withColumn("rem", expr(s"($budgetTokens * isq) % isq_total"))
    val short = based
      .agg((lit(budgetTokens) - sum("base_alloc")).as("n_extra"))
    based.crossJoin(broadcast(short))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("domain"))))
      .withColumn("alloc", col("base_alloc") +
        when(col("rk") <= col("n_extra"), 1L).otherwise(0L))
      .select("domain", "docs", "tokens", "base_alloc", "alloc")
      .orderBy("domain")
  }

  /**
   * Deterministic train/val/test assignment: each document's split is a
   * pure function of md5(doc_id) reduced to a per-mille bucket —
   * reproducible across runs and engines, stable under corpus growth (a
   * doc never changes split when others arrive, unlike rank-based
   * slicing), and embarrassingly parallel (a pure projection, no shuffle
   * at any scale). `valPm`/`testPm` are per-mille shares: bucket <
   * testPm → test, < testPm+valPm → val, else train.
   */
  def dataSplit(docs: DataFrame, valPm: Int = 10,
                testPm: Int = 10): DataFrame =
    docs
      .withColumn("bucket_pm",
        expr("graft_hash60(CAST(doc_id AS STRING)) % 1000"))
      .withColumn("split",
        when(col("bucket_pm") < testPm, lit("test"))
          .when(col("bucket_pm") < testPm + valPm, lit("val"))
          .otherwise(lit("train")))
      .select(col("doc_id"), col("source"), col("bucket_pm"), col("split"))
      .orderBy("doc_id")

  /**
   * Deterministic training order: a seeded per-epoch shuffle with
   * domain-interleaved curriculum slots — the data-loader ordering step
   * of a training pipeline. Each epoch re-shuffles every document by
   * `md5(epoch:doc_id)` (a different but reproducible permutation per
   * epoch, the standard seeded-epoch-shuffle contract); documents are
   * then dealt round-robin across domains by assigning the k-th
   * document of domain d to slot `(k-1)·|domains| + idx(d)` — a CLOSED
   * FORM, so the global order needs no single-partition window: the
   * only shuffle is the per-(epoch, domain) rank, which partitions
   * cleanly at any scale. Unequal domain sizes leave empty slots at the
   * tail exactly like a round-robin batch sampler that exhausts small
   * domains.
   */
  def trainOrder(docs: DataFrame, domain: String = "source",
                 epochs: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    val ep = spark.range(epochs).toDF("epoch")
    val dDim = docs.select(col(domain).as("domain")).distinct()
      .withColumn("domain_idx",
        row_number().over(Window.orderBy("domain")).cast("long") - 1L)
    val dCount = dDim.agg(count(lit(1)).as("n_domains"))
    docs.select(col("doc_id"), col(domain).as("domain"))
      .crossJoin(broadcast(ep))
      .withColumn("shuffle_key",
        md5(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("epoch", "domain").orderBy("shuffle_key"))
        .cast("long"))
      .join(broadcast(dDim), Seq("domain"))
      .crossJoin(broadcast(dCount))
      .withColumn("slot",
        (col("rank") - 1L) * col("n_domains") + col("domain_idx"))
      .select("epoch", "slot", "domain", "rank", "doc_id")
      .orderBy("epoch", "slot")
  }
}
