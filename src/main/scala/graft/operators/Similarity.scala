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
 * LSH planes are a tiny broadcast dim; the dot-product kernel is the
 * native codegen'd `graft_dot_long` Expression (functions/ArrayDotLong —
 * one primitive loop in whole-stage codegen, no per-row allocation); the
 * remaining array math stays in higher-order functions — no UDFs.
 */
object Similarity {

  /** Quantized vectors + integer squared norm. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("qv",
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .withColumn("nrm",
        expr("graft_dot_long(qv, qv)"))
      .select("vec_id", "label", "qv", "nrm")

  /**
   * Integer-EXACT cosine ×scale: floor(dot·scale ÷ isqrt(na·nb)) where
   * isqrt is the exact integer square root (double-sqrt seed with ±1
   * correction against BIGINT squares) and the division is sign-split so
   * both engines' truncating integer division implements floor. The old
   * float chain (`dot / sqrt(na·nb) · 1e6` then floor) was IEEE-
   * deterministic only if neither engine build contracts the multiply
   * chain (FMA) and both use correctly-rounded sqrt — a 1-ulp divergence
   * flips the floor and changes a BIGINT output. Here no step after the
   * corrected seed depends on FP rounding at all. Domain: na·nb of the
   * unit-scale quantized vectors ≤ ~1e12, so every product fits BIGINT.
   */
  private[graft] def cosIntSql(dot: String, na: String, nb: String,
                               scale: Long = 1000000L): String = {
    val x = s"(CAST(($na) AS BIGINT) * CAST(($nb) AS BIGINT))"
    val s0 = s"CAST(floor(sqrt(CAST($x AS DOUBLE))) AS BIGINT)"
    val s = s"(CASE WHEN $s0 * $s0 > $x THEN $s0 - 1 " +
      s"WHEN ($s0 + 1) * ($s0 + 1) <= $x THEN $s0 + 1 ELSE $s0 END)"
    s"(CASE WHEN ($dot) >= 0 THEN (CAST(($dot) AS BIGINT) * ${scale}L) DIV $s " +
      s"ELSE -((-CAST(($dot) AS BIGINT) * ${scale}L + $s - 1) DIV $s) END)"
  }

  private val cosExpr = cosIntSql("dot", "nrm_a", "nrm_b")

  /**
   * Per-vector int8 affine quantization stats — the scalar-quantizer (SQ8)
   * prep of a serving-side ANN index: each vector gets (min, max) range
   * params and 255-step codes `(v - min) · 255 ÷ span`; emitted here as
   * the code checksum plus the max absolute reconstruction error (the
   * bound on cosine drift a retrieval stack validates before swapping the
   * float index out). All arithmetic is non-negative integer DIV over the
   * milli-quantized components, so both engines agree bit-for-bit; a
   * constant vector (span 0) degenerates to code 0 / error 0.
   *
   * Scale shape: a pure codegen'd projection over the embedding scan —
   * zero shuffles at any corpus size.
   */
  def quantizeStats(embeddings: DataFrame): DataFrame =
    quantized(embeddings)
      .withColumn("mn", expr("array_min(qv)"))
      .withColumn("mx", expr("array_max(qv)"))
      .withColumn("gspan", expr("greatest(mx - mn, 1L)"))
      .withColumn("code_sum", expr(
        "aggregate(transform(qv, v -> (v - mn) * 255 DIV gspan), " +
          "0L, (a, x) -> a + x)"))
      .withColumn("max_err_milli", expr(
        "aggregate(transform(qv, v -> abs(v - (mn + " +
          "((v - mn) * 255 DIV gspan) * gspan DIV 255))), " +
          "0L, (a, x) -> greatest(a, x))"))
      .select("vec_id", "mn", "mx", "code_sum", "max_err_milli")
      .orderBy("vec_id")

  /**
   * Semantic decontamination — the embedding-space sibling of the n-gram
   * [[Curation.decontaminate]] pass (SemDeDup-style screening): corpus
   * vectors whose cosine against ANY held-out benchmark vector clears the
   * threshold are flagged, with their closest benchmark match and the hit
   * count. The held-out split (vec_id % benchMod) is fixture-side small —
   * like any real benchmark suite — so it broadcasts into one pass over
   * the corpus; the corpus never shuffles (the flagged fraction alone
   * reaches the per-vector argmax agg).
   */
  def semanticDecon(embeddings: DataFrame, benchMod: Long = 50,
                    minCosX1e6: Long = 350000): DataFrame = {
    val q = quantized(embeddings)
    val bench = q.filter(col("vec_id") % benchMod === 0)
      .select(col("vec_id").as("bench_id"), col("qv").as("bv"),
        col("nrm").as("nrm_b"))
    val corpus = q.filter(col("vec_id") % benchMod =!= 0)
      .select(col("vec_id"), col("qv").as("cv"), col("nrm").as("nrm_a"))
    corpus.crossJoin(broadcast(bench))
      .withColumn("dot", expr("graft_dot_long(cv, bv)"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .groupBy("vec_id")
      .agg(
        min_by(struct(col("bench_id"), col("cos_x1e6")),
          struct((-col("cos_x1e6")).as("nc"), col("bench_id"))).as("__b"),
        count(lit(1)).as("n_bench_hits"))
      .select(col("vec_id"), col("__b.bench_id").as("bench_id"),
        col("__b.cos_x1e6").as("cos_x1e6"), col("n_bench_hits"))
      .orderBy("vec_id")
  }

  /** Brute-force cosine top-k for a BOUNDED query set (vec_id < numQueries):
    * exact baseline, cost O(numQueries · corpus) — linear in the corpus for
    * a fixed query batch, so it scales (unlike a query set that grows with
    * the corpus, which degenerates to O(n²)). Queries are broadcast into
    * the corpus scan; the corpus is never shuffled. */
  def annTopK(embeddings: DataFrame, numQueries: Int = 20, k: Int = 5): DataFrame = {
    val corpus = quantized(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("qv").as("cv"), col("nrm").as("nrm_a"))
    val queries = quantized(embeddings)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("sv"), col("nrm").as("nrm_b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("dot",
        expr("graft_dot_long(cv, sv)"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /**
   * Matryoshka-truncated retrieval — the MRL serving pattern (Kusupati et
   * al., "Matryoshka Representation Learning", NeurIPS 2022): rank with
   * only the FIRST `mdim` dimensions of the embedding (a prefix of an
   * MRL-trained vector is itself a valid lower-capacity embedding),
   * paying 1/4 of the dot-product FLOPs and index bytes, then report the
   * full-dimension cosine of each truncated-rank neighbor so the quality
   * gap is visible in the result (the recall spec gates it). Same
   * deterministic integer pipeline as [[annTopK]]; the truncated vector
   * renormalizes over its own prefix norm.
   *
   * Scale shape: identical to the brute-force baseline — the bounded
   * query batch broadcasts into one corpus scan; at index scale the
   * truncated prefix is what an IVF/HNSW would store, and the full
   * vector is only touched for the k re-scored finalists.
   */
  def annMatryoshka(embeddings: DataFrame, numQueries: Int = 20,
                    k: Int = 5, mdim: Int = 16): DataFrame = {
    val base = quantized(embeddings)
      .withColumn("tv", expr(s"slice(qv, 1, $mdim)"))
      .withColumn("tnrm", expr("graft_dot_long(tv, tv)"))
    val corpus = base.select(col("vec_id").as("neighbor_id"),
      col("qv").as("cv"), col("tv").as("ctv"),
      col("nrm").as("nrm_a"), col("tnrm").as("tnrm_a"))
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("sv"),
        col("tv").as("stv"), col("nrm").as("nrm_b"),
        col("tnrm").as("tnrm_b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_trunc_x1e6").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("tdot", expr("graft_dot_long(ctv, stv)"))
      // zero-prefix guard: a vector whose first mdim components all
      // quantize to 0 has tnrm 0; its truncated cosine is defined as 0
      // (Spark would CAST NaN→0 silently, DuckDB would refuse the cast)
      .withColumn("cos_trunc_x1e6", expr(
        "CASE WHEN tnrm_a = 0 OR tnrm_b = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE ${cosIntSql("tdot", "tnrm_a", "tnrm_b")} END"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("dot", expr("graft_dot_long(cv, sv)"))
      .withColumn("cos_full_x1e6", expr(cosExpr))
      .select("query_id", "neighbor_id", "rank", "cos_trunc_x1e6",
        "cos_full_x1e6")
      .orderBy("query_id", "rank")
  }

  /**
   * Hard-negative mining — the contrastive-training data op (the
   * in-batch-negatives regime of DPR/SimCSE-style training needs mined
   * HARD negatives: the most similar corpus items with a DIFFERENT
   * label): per query vector, the top-k highest-cosine neighbors whose
   * label differs, plus the margin to the best SAME-label positive — a
   * pair below-margin is the informative triplet a trainer keeps.
   * Deterministic integer cosine as everywhere in this module.
   *
   * Scale shape: the bounded query batch broadcasts into one corpus
   * scan (at index scale the candidate set comes from the ANN index and
   * the label filter rides the posting lists); one window per query.
   */
  def hardNegatives(embeddings: DataFrame, numQueries: Int = 20,
                    k: Int = 3): DataFrame = {
    val base = quantized(embeddings)
    val corpus = base.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"), col("qv").as("cv"),
      col("nrm").as("nrm_a"))
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("qv").as("sv"), col("nrm").as("nrm_b"))
    val scored = corpus
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", expr("graft_dot_long(cv, sv)"))
      .withColumn("cos_x1e6", expr(cosExpr))
    val wAll = Window.partitionBy("query_id")
    val wNeg = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("best_pos_cos",
        max(when(col("n_label") === col("q_label"), col("cos_x1e6")))
          .over(wAll))
      .withColumn("neg_rank",
        sum(when(col("n_label") =!= col("q_label"), 1L).otherwise(0L))
          .over(wNeg))
      .filter(col("n_label") =!= col("q_label") && col("neg_rank") <= k)
      .withColumn("margin_x1e6",
        coalesce(col("best_pos_cos"), lit(0L)) - col("cos_x1e6"))
      .select(col("query_id"), col("neighbor_id"),
        col("neg_rank").as("rank"), col("cos_x1e6"), col("margin_x1e6"))
      .orderBy("query_id", "rank")
  }

  val NumPlanes = 16
  val BandBits = 8 // 2 OR-ed hash tables of 8 sign bits ⇒ 256 buckets/band

  /** Deterministic random-hyperplane weights: numPlanes × dim, each weight
    * derived from an md5 prefix — reproducible in any engine, no RNG. */
  def hyperplanes(spark: SparkSession, numPlanes: Int, dim: Int): DataFrame =
    spark.range(numPlanes).toDF("p")
      .crossJoin(spark.range(dim).toDF("d"))
      .withColumn("w",
        expr("CAST(conv(substring(md5(concat(p, '_', d)), 1, 8), 16, 10) AS BIGINT) % 2001 - 1000"))

  /**
   * Banded sign-LSH (the OR-of-ANDs / multi-hash-table construction): the 16
   * hyperplane sign bits split into 2 bands of 8 bits; two vectors are
   * candidates iff they agree on ALL bits of SOME band. Long format:
   * (vec_id, band, sig).
   *
   * The wide qv array never shuffles for the signature computation — only
   * (vec_id, plane, partial sum) triples do. At 100 TB the knobs are
   * numPlanes/bandBits: per-band bucket count is 2^bandBits, so bandBits
   * tunes to ~log2(n / targetBucketSize) and candidate cost stays
   * Σ_band Σ_bucket sz² with bounded bucket sizes, never n².
   */
  def lshBands(embeddings: DataFrame, planes: DataFrame,
               bandBits: Int = BandBits): DataFrame =
    quantized(embeddings)
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("d", "v")))
      .join(broadcast(planes), "d")
      .groupBy("vec_id", "p")
      .agg(sum(expr("w * v")).as("sp"))
      .withColumn("band", expr(s"CAST(p DIV $bandBits AS INT)"))
      .groupBy("vec_id", "band")
      .agg(
        sum(expr(s"CASE WHEN sp > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(p % $bandBits AS INT)) ELSE CAST(0 AS BIGINT) END"))
          .as("sig"))

  /** Undirected candidate pairs from the banded join — ids only (narrow
    * rows through the shuffle), deduped across bands with the band-match
    * count kept as the LSH score. */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(count(lit(1)).as("shared_bands"))

  /** Attach exact integer cosine to candidate pairs: two id-equi-joins fetch
    * the quantized vectors for only the candidate rows (linear shuffles). */
  private def withCosine(cands: DataFrame, q: DataFrame): DataFrame =
    cands
      .join(q.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("nrm").as("nrm_a")), "vec_a")
      .join(q.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
        col("nrm").as("nrm_b")), "vec_b")
      .withColumn("dot",
        expr("graft_dot_long(qa, qb)"))
      .withColumn("cos_x1e6", expr(cosExpr))

  /** LSH-bucketed ANN: rank same-band candidates per query by exact cosine —
    * the 100 TB product surface (candidate generation is banded, verification
    * touches only candidate pairs; no global pairwise join anywhere). */
  def annLsh(spark: SparkSession, embeddings: DataFrame,
             numPlanes: Int = NumPlanes, k: Int = 3): DataFrame = {
    val q = quantized(embeddings)
    val cands = lshCandidates(lshBands(embeddings, hyperplanes(spark, numPlanes, 64)))
    val scored = withCosine(cands, q)
    val directed = scored
      .select(col("vec_a").as("query_id"), col("vec_b").as("neighbor_id"),
        col("shared_bands"), col("cos_x1e6"))
      .unionByName(scored.select(col("vec_b").as("query_id"),
        col("vec_a").as("neighbor_id"), col("shared_bands"), col("cos_x1e6")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
    directed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "shared_bands", "rank", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs: exact cosine ≥ threshold verified over
    * LSH candidates only — the candidates-then-verify topology (recall is
    * governed by the band parameters, cost by bucket sizes; never an
    * all-pairs join). */
  def nearDupPairs(spark: SparkSession, embeddings: DataFrame,
                   minCosX1e6: Long = 400000): DataFrame = {
    val cands = lshCandidates(
      lshBands(embeddings, hyperplanes(spark, NumPlanes, 64)))
    withCosine(cands, quantized(embeddings))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .select("vec_a", "vec_b", "cos_x1e6")
      .orderBy("vec_a", "vec_b")
  }

  private val centCosExpr = cosIntSql("cdot", "nrm", "cnrm")

  /** Rank every (vector, centroid) pair by integer cosine; keep ranks ≤
    * `keep` (1 = hard assignment, >1 = multi-probe). Input cents:
    * (cell_id, cv, cnrm); output keeps (vec_id, cell_id, qv, nrm, rn). */
  private def rankCells(q: DataFrame, cents: DataFrame, keep: Int): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cell_id"))
    q.crossJoin(broadcast(cents))
      .withColumn("cdot",
        expr("graft_dot_long(qv, cv)"))
      .withColumn("ccos", expr(centCosExpr))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .select("vec_id", "label", "cell_id", "qv", "nrm", "rn")
  }

  /**
   * Lloyd-refined IVF centroids, fully deterministic: seeded start (first
   * `numCells` corpus vectors by id) + `iters` assign/re-center passes.
   * Component means are floor(sum / count) — exact integers in both
   * engines (sums stay far below 2⁵³), so the DuckDB oracle reproduces the
   * centroids bit-for-bit. Cells that lose all members simply drop out
   * (standard Lloyd behavior). Returns (cell_id, cv, cnrm).
   *
   * Scale design: each pass is one broadcast of the tiny centroid set into
   * the corpus scan plus one aggregation keyed by (cell, component) — the
   * corpus never shuffles; at 100 TB the refined centroids would be
   * materialized once (like the LSH bands) and reused by every probe.
   */
  def ivfCentroids(q: DataFrame, numCells: Int = 16, iters: Int = 2): DataFrame = {
    var cents = q.filter(col("vec_id") < numCells)
      .select(col("vec_id").as("cell_id"), col("qv").as("cv"),
        col("nrm").as("cnrm"))
    for (_ <- 1 to iters) {
      val assigned = rankCells(q, cents, keep = 1)
      cents = assigned
        .select(col("cell_id"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cell_id", "pos")
        .agg(expr("CAST(floor(CAST(sum(v) AS DOUBLE) / count(1)) AS BIGINT)")
          .as("mv"))
        .groupBy("cell_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), s -> s.mv)")
          .as("cv"))
        .withColumn("cnrm",
          expr("graft_dot_long(cv, cv)"))
    }
    cents
  }

  /** IVF posting lists: every vector hard-assigned to its nearest
    * Lloyd-refined centroid. Returns (vec_id, cell_id, qv, nrm). */
  def ivfCells(embeddings: DataFrame, numCells: Int = 16,
               iters: Int = 2): DataFrame = {
    val q = quantized(embeddings)
    rankCells(q, ivfCentroids(q, numCells, iters), keep = 1)
      .select("vec_id", "cell_id", "qv", "nrm")
  }

  /** IVF ANN with multi-probe: a bounded query batch (vec_id < numQueries)
    * probes its `nprobe` nearest cells' posting lists, ranked by exact
    * cosine — cost ∝ nprobe · cell size, never corpus size; recall grows
    * with nprobe (spec-checked against the brute-force oracle). */
  def annIvf(embeddings: DataFrame, numCells: Int = 16,
             numQueries: Int = 20, k: Int = 3, nprobe: Int = 2,
             iters: Int = 2, precomputedCentroids: Option[DataFrame] = None): DataFrame = {
    val q = quantized(embeddings)
    val cents = precomputedCentroids
      .getOrElse(ivfCentroids(q, numCells, iters))
    val cells = rankCells(q, cents, keep = 1)
    val probes = rankCells(q.filter(col("vec_id") < numQueries), cents, nprobe)
      .select(col("vec_id").as("query_id"), col("cell_id"),
        col("qv").as("sv"), col("nrm").as("snrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
    cells
      .select(col("vec_id").as("neighbor_id"), col("cell_id"),
        col("qv").as("cv"), col("nrm").as("nrm_a"))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot",
        expr("graft_dot_long(cv, sv)"))
      .withColumn("cos_x1e6", expr(cosIntSql("dot", "nrm_a", "snrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cell_id", "rank", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /**
   * IVF-routed hard-negative mining — the SCALE path of
   * [[hardNegatives]]: the brute-force miner broadcasts the query side
   * against the whole corpus (fine while queries ≪ corpus); at a growing
   * query set or a 100 TB corpus the mining must ride the same inverted
   * index as retrieval. Each query probes its `nprobe` nearest cells and
   * mines top-k different-label neighbors (with the best same-label
   * positive's margin) WITHIN the probed cells — the approximation a
   * production miner makes (negatives come from the retrieval shortlist;
   * FAISS-style IVF mining).
   *
   * Scale shape: the corpus stays partitioned by its precomputed cell
   * assignment; only the tiny probe set broadcasts; per-query work is
   * O(Σ probed-cell sizes), never O(corpus).
   */
  def hardNegativesIvf(embeddings: DataFrame, numQueries: Int = 20,
                       k: Int = 3, nprobe: Int = 2, numCells: Int = 16,
                       iters: Int = 2,
                       precomputedCentroids: Option[DataFrame] = None)
      : DataFrame = {
    val q = quantized(embeddings)
    val cents = precomputedCentroids
      .getOrElse(ivfCentroids(q, numCells, iters))
    val cells = rankCells(q, cents, keep = 1)
    val probes = rankCells(q.filter(col("vec_id") < numQueries), cents,
        nprobe)
      .select(col("vec_id").as("query_id"), col("cell_id"),
        col("qv").as("sv"), col("nrm").as("snrm"),
        col("label").as("q_label"))
    val scored = cells
      .select(col("vec_id").as("neighbor_id"), col("cell_id"),
        col("qv").as("cv"), col("nrm").as("nrm_a"),
        col("label").as("n_label"))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", expr("graft_dot_long(cv, sv)"))
      .withColumn("cos_x1e6", expr(cosIntSql("dot", "nrm_a", "snrm")))
    val wAll = Window.partitionBy("query_id")
    val wNeg = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("best_pos_cos",
        max(when(col("n_label") === col("q_label"), col("cos_x1e6")))
          .over(wAll))
      .withColumn("neg_rank",
        sum(when(col("n_label") =!= col("q_label"), 1L).otherwise(0L))
          .over(wNeg))
      .filter(col("n_label") =!= col("q_label") && col("neg_rank") <= k)
      .withColumn("margin_x1e6",
        coalesce(col("best_pos_cos"), lit(0L)) - col("cos_x1e6"))
      .select(col("query_id"), col("neighbor_id"),
        col("neg_rank").as("rank"), col("cos_x1e6"), col("margin_x1e6"))
      .orderBy("query_id", "rank")
  }

  // ---- product quantization (PQ): the compressed-corpus scale path ----

  val PqM = 4 // subspaces
  val PqK = 8 // codewords per subspace
  val PqDim = 16 // dims per subspace (PqM · PqDim = 64)

  /** One row per (vector, subspace): the 16-dim integer subvector of the
    * UNIT-NORMALIZED vector — floor(qv·1024 ÷ isqrt(‖qv‖²)) via the same
    * integer-exact kernel as the cosine (cosIntSql with nb = 1, scale
    * 1024). Normalizing first makes PQ's squared L2 monotone with
    * cosine, the metric every other ANN query here ranks by. */
  private def pqSubvectors(q: DataFrame): DataFrame =
    q.withColumn("nv",
        expr("transform(qv, v -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE ${cosIntSql("v", "nrm", "1", 1024L)} END)"))
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), " +
          s"m -> struct(m AS m, slice(nv, m * $PqDim + 1, $PqDim) AS sv))"))
        .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Nearest codeword per (vector, subspace) under exact integer squared
    * L2, code tie-break — the PQ encode step. */
  private def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "m")
      .orderBy(col("dist"), col("code"))
    sub.join(broadcast(cb), "m")
      .withColumn("dist",
        expr("aggregate(zip_with(sv, cb, (x, c) -> (x - c) * (x - c)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "m", "code")
  }

  /**
   * Deterministic PQ codebooks: per subspace, `PqK` codewords seeded from
   * the first `PqK` corpus vectors' subvectors and refined by `iters`
   * Lloyd passes under squared L2 with floor-mean re-centering — the same
   * exact-integer recipe as [[ivfCentroids]], so the DuckDB oracle
   * reproduces every codeword. Returns (m, code, cb).
   *
   * Scale design: codebooks are PqM·PqK tiny rows trained by broadcast
   * passes (corpus never shuffles) and, like the IVF centroids, would be
   * materialized once per corpus and reused by every encode/probe.
   */
  def pqCodebooks(q: DataFrame, iters: Int = 1): DataFrame = {
    val sub = pqSubvectors(q)
    var cb = sub.filter(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sv").as("cb"))
    for (_ <- 1 to iters) {
      cb = pqAssign(sub, cb)
        .join(sub, Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("m", "code", "pos")
        .agg(expr("CAST(floor(CAST(sum(v) AS DOUBLE) / count(1)) AS BIGINT)")
          .as("mv"))
        .groupBy("m", "code")
        .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), s -> s.mv)")
          .as("cb"))
    }
    cb
  }

  /** PQ codes: every corpus vector compressed to PqM small codes —
    * 4 bytes a vector instead of 64 floats. Returns (vec_id, m, code). */
  def pqCodes(embeddings: DataFrame,
              codebooks: Option[DataFrame] = None): DataFrame = {
    val q = quantized(embeddings)
    pqAssign(pqSubvectors(q), codebooks.getOrElse(pqCodebooks(q)))
  }

  /**
   * PQ ANN — the production two-stage probe:
   *   1. ADC shortlist: each query precomputes a (subspace, code) →
   *      squared-L2 lookup table against the codebooks; a neighbor's
   *      approximate distance is the sum of its PqM table hits, and only
   *      the `shortlist` best survive. The corpus side touches ONLY the
   *      integer codes — at 100 TB the original vectors never leave
   *      storage for this stage, the scan is a (m, code) equi-join + sum.
   *   2. Exact rerank: the shortlist rows (and nothing else) fetch their
   *      real vectors by id and rank by exact integer cosine.
   * Accuracy/cost trade on PqM/PqK/shortlist exactly as in a production
   * IVF-PQ index; recall@k is spec-bounded against the brute force.
   */
  def annPq(embeddings: DataFrame, numQueries: Int = 20, k: Int = 5,
            shortlist: Int = 100,
            precomputedCodebooks: Option[DataFrame] = None): DataFrame = {
    val q = quantized(embeddings)
    val cb = precomputedCodebooks.getOrElse(pqCodebooks(q))
    val codes = pqAssign(pqSubvectors(q), cb)
    val lut = pqSubvectors(q.filter(col("vec_id") < numQueries))
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cb), "m")
      .withColumn("d",
        expr("aggregate(zip_with(sv, cb, (x, c) -> (x - c) * (x - c)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select("query_id", "m", "code", "d")
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("neighbor_id"))
    val short = codes
      .join(broadcast(lut), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("d").as("adist"))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id"))
    short
      .join(q.select(col("vec_id").as("neighbor_id"), col("qv").as("cv"),
        col("nrm").as("nrm_a")), "neighbor_id")
      .join(broadcast(q.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("qv").as("sv2"),
          col("nrm").as("nrm_b"))), "query_id")
      .withColumn("dot",
        expr("graft_dot_long(cv, sv2)"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /** All-pairs exact near-dup (the O(n²) correctness oracle for
    * [[nearDupPairs]]) — dev/spec use only, never the declared query. */
  def nearDupPairsExact(embeddings: DataFrame, minCosX1e6: Long = 400000): DataFrame = {
    val n = quantized(embeddings)
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr("graft_dot_long(a.qv, b.qv)").as("dot"),
        col("a.nrm").as("nrm_a"), col("b.nrm").as("nrm_b"))
      .withColumn("cos_x1e6", expr(cosExpr))
      .filter(col("cos_x1e6") >= minCosX1e6)
      .select("vec_a", "vec_b", "cos_x1e6")
      .orderBy("vec_a", "vec_b")
  }
}
