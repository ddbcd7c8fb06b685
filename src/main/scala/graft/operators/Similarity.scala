package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search over an `Array[Float]` column:
 *   - brute-force cosine top-k (the correctness baseline),
 *   - random-hyperplane LSH bucketing (the 100 TB scale path: candidates
 *     are generated per bucket, cost ∝ Σ bucket² instead of n²),
 *   - threshold near-duplicate pairs.
 *
 * Determinism contract (cross-engine bit parity):
 *   - embeddings quantized to BIGINT (floor(x * 1000)) — dot products and
 *     norms are exact integers (|q| ≤ ~530 ⇒ dot ≤ 1.8e7, no overflow);
 *   - cosine emitted as floor(dot / sqrt(n_a · n_b) · 1e6): every step
 *     (int→double exact below 2^53, sqrt/÷/× correctly rounded IEEE) is
 *     bit-identical in Spark and DuckDB;
 *   - rankings order by the integer cosine with id tie-breaks.
 *
 * Scale design: the query side of top-k is broadcast (queries ≪ corpus);
 * LSH planes are a tiny broadcast dim; all hot paths are codegen'd
 * higher-order array functions (zip_with/aggregate) — no UDFs.
 */
object Similarity {

  /** Quantized vectors + integer squared norm. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("qv",
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .withColumn("nrm",
        expr("aggregate(zip_with(qv, qv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select("vec_id", "label", "qv", "nrm")

  private val cosExpr =
    "CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(nrm_a AS DOUBLE) * CAST(nrm_b AS DOUBLE)) * 1000000) AS BIGINT)"

  /** Brute-force cosine top-k: every (vec_id % queryMod == 0) vector probes
    * the full corpus. Queries are broadcast into the corpus scan. */
  def annTopK(embeddings: DataFrame, queryMod: Int = 25, k: Int = 5): DataFrame = {
    val corpus = quantized(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("qv").as("cv"), col("nrm").as("nrm_a"))
    val queries = quantized(embeddings)
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("sv"), col("nrm").as("nrm_b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("dot",
        expr("aggregate(zip_with(cv, sv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /** Deterministic random-hyperplane weights: numPlanes × dim, each weight
    * derived from an md5 prefix — reproducible in any engine, no RNG. */
  def hyperplanes(spark: SparkSession, numPlanes: Int, dim: Int): DataFrame =
    spark.range(numPlanes).toDF("p")
      .crossJoin(spark.range(dim).toDF("d"))
      .withColumn("w",
        expr("CAST(conv(substring(md5(concat(p, '_', d)), 1, 8), 16, 10) AS BIGINT) % 2001 - 1000"))

  /** Sign-bucket of every vector under the hyperplane family: bucket =
    * Σ_p (⟨w_p, v⟩ > 0 ? 1<<p : 0). The wide qv array never shuffles for
    * the bucket computation — only (vec_id, p, partial sums) do; the
    * buckets rejoin the quantized vectors by vec_id afterwards. */
  def lshBuckets(embeddings: DataFrame, planes: DataFrame): DataFrame = {
    val q = quantized(embeddings)
    val buckets = q
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("d", "v")))
      .join(broadcast(planes), "d")
      .groupBy("vec_id", "p")
      .agg(sum(expr("w * v")).as("sp"))
      .groupBy("vec_id")
      .agg(
        sum(expr("CASE WHEN sp > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)) ELSE CAST(0 AS BIGINT) END"))
          .as("bucket"))
    q.join(buckets, "vec_id")
  }

  /** LSH-bucketed ANN: probe only same-bucket candidates — the 100 TB path
    * (each bucket is an independent partition; no global pairwise join). */
  def annLsh(spark: SparkSession, embeddings: DataFrame,
             numPlanes: Int = 4, k: Int = 3): DataFrame = {
    val bk = lshBuckets(embeddings, hyperplanes(spark, numPlanes, 64))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
    bk.as("a").join(bk.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("b.vec_id").as("query_id"), col("a.vec_id").as("neighbor_id"),
        col("b.bucket").as("bucket"),
        expr("aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("dot"),
        col("a.nrm").as("nrm_a"), col("b.nrm").as("nrm_b"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "bucket", "rank", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold (x1e6). Exact
    * verification — at scale, feed LSH candidates instead of all pairs. */
  def nearDupPairs(embeddings: DataFrame, minCosX1e6: Long = 400000): DataFrame = {
    val n = quantized(embeddings)
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr("aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("dot"),
        col("a.nrm").as("nrm_a"), col("b.nrm").as("nrm_b"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .select("vec_a", "vec_b", "cos_x1e6")
      .orderBy("vec_a", "vec_b")
  }
}
