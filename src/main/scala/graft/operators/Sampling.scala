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
}
