package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/**
 * Corpus-curation operators for training-data pipelines: PII redaction,
 * repetition-based quality filtering (Gopher/C4-style), benchmark
 * decontamination, and concat-and-chop sequence packing.
 *
 * Scale design notes (100 TB):
 *   - piiScrub is a pure projection (regex count + sequential
 *     regexp_replace) — codegen'd, no shuffle, parallel per row-group.
 *   - repetitionFilter shuffles once on (doc_id) after per-doc token /
 *     bigram explode-aggregate; rows through the shuffle are (doc_id,
 *     counter) narrow rows, never text.
 *   - decontaminate broadcasts the benchmark n-gram set (benchmarks are
 *     tiny relative to the corpus) into a stream over training n-grams —
 *     linear in corpus tokens, no corpus-side shuffle except the final
 *     per-doc rollup.
 *   - seqPack is one window over (shard) — the standard GPT-style
 *     concat-and-chop layout, embarrassingly parallel across shards.
 */
object Curation {

  // PII patterns — shared Java/RE2 subset so Spark and the DuckDB oracle
  // match identically (\b is an ASCII word boundary in both).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val IpRe    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The synthetic fixture corpus contains no PII, so the scrubber is
    * exercised over an augmented copy: docs with doc_id % 3 != 0 gain a
    * deterministic contact line derived from doc_id (two emails, one
    * phone, one SSN-shaped id, one IPv4), built identically in the DuckDB
    * oracle. doc_id % 3 == 0 rows stay untouched → genuine zero-hit rows. */
  def piiAugmented(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val contact = concat(
      col("text"),
      lit(" contact user"), id.cast("string"),
      lit("@example.com or admin."), id.cast("string"),
      lit("@corp.example.org call 415-555-"),
      lpad((id % 10000).cast("string"), 4, "0"),
      lit(" ssn 078-05-"), lpad((id % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (id % 200).cast("string"),
      lit("."), ((id * 7) % 250).cast("string"),
      lit("."), (id % 250).cast("string"))
    docs.withColumn("aug",
      when(id % 3 === 0, col("text")).otherwise(contact))
  }

  /** Count PII matches per class on the raw text, then redact
    * sequentially (email → ssn → phone → ip; the classes are disjoint by
    * construction but the order is fixed and mirrored in the oracle).
    * Emits the redaction counts, a 60-bit fingerprint of the scrubbed
    * text, and the byte delta. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val aug = piiAugmented(docs)
    def cnt(re: String) =
      expr(s"size(regexp_extract_all(aug, '${re.replace("\\", "\\\\")}', 0))")
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
            SsnRe, "<SSN>"),
          PhoneRe, "<PHONE>"),
        IpRe, "<IP>")
    aug
      .withColumn("n_email", cnt(EmailRe))
      .withColumn("n_ssn", cnt(SsnRe))
      .withColumn("n_phone", cnt(PhoneRe))
      .withColumn("n_ip", cnt(IpRe))
      .withColumn("scrubbed", scrubbed)
      .withColumn("scrub_fp60", tokenHash60("scrubbed"))
      .withColumn("len_delta", length(col("aug")) - length(col("scrubbed")))
      .select("doc_id", "n_email", "n_ssn", "n_phone", "n_ip",
        "scrub_fp60", "len_delta")
      .orderBy("doc_id")
  }

  /** Gopher/C4-style repetition statistics: longest identical-token run
    * (gaps-and-islands over token positions), top word-bigram occupancy
    * and duplicate-bigram occupancy (‰ of bigram slots), plus the keep
    * decision. Thresholds sit inside the fixture's observed range so both
    * kept and dropped rows exist at every SF. */
  def repetitionFilter(docs: DataFrame,
                       maxRun: Int = 2,
                       topPerMille: Int = 50,
                       dupPerMille: Int = 100): DataFrame = {
    val words = docs.withColumn("ws", split(normText(col("text")), " "))

    val tok = words.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("pos", "w")))
    val runs = tok
      .withColumn("isl", col("pos") -
        row_number().over(Window.partitionBy("doc_id", "w").orderBy("pos")))
      .groupBy("doc_id", "w", "isl").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(max("run").as("max_token_run"))

    val grams = words
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(shingleExpr("ws", 2)).as("g"))
    val gstats = grams
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_grams"),
        max("c").as("top_gram_occ"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_gram_occ"))

    runs.join(gstats, Seq("doc_id"))
      .withColumn("top_x1000", expr("top_gram_occ * 1000 DIV n_grams"))
      .withColumn("dup_x1000", expr("dup_gram_occ * 1000 DIV n_grams"))
      .withColumn("keep",
        col("max_token_run") <= maxRun &&
          col("top_x1000") <= topPerMille && col("dup_x1000") <= dupPerMille)
      .select("doc_id", "max_token_run", "n_grams", "top_gram_occ",
        "dup_gram_occ", "top_x1000", "dup_x1000", "keep")
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag training docs sharing any word
    * n-gram with the held-out benchmark split (doc_id % benchMod ==
    * benchRem). n = 4 at fixture scale — the synthetic vocabulary is ~30
    * words, so 4-grams discriminate like the production 8–13-grams do on
    * real text. The benchmark gram set is broadcast (benchmarks are tiny
    * vs the corpus); training grams are hashed to 60-bit ints before the
    * join so no text crosses the wire. */
  def decontaminate(docs: DataFrame, n: Int = 4,
                    benchMod: Int = 50, benchRem: Int = 7): DataFrame = {
    val grams = docs
      .withColumn("ws", split(normText(col("text")), " "))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), explode(shingleExpr("ws", n)).as("g"))
      .select(col("doc_id"), tokenHash60("g").as("gh"))
      .distinct()
    val bench = grams.where(col("doc_id") % benchMod === benchRem)
      .select(col("doc_id").as("bench_doc"), col("gh"))
    val train = grams.where(col("doc_id") % benchMod =!= benchRem)
    val hits = train.join(broadcast(bench), Seq("gh"))
      .groupBy("doc_id").agg(
        countDistinct("gh").as("n_shared_grams"),
        countDistinct("bench_doc").as("n_bench_docs"))
    docs.select("doc_id").where(col("doc_id") % benchMod =!= benchRem)
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shared_grams", "n_bench_docs"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
      .orderBy("doc_id")
  }

  /**
   * The curation funnel: every quality gate of the pipeline evaluated per
   * document with FIRST-FAILING-STAGE attribution — the report a corpus
   * owner reads to see where the data goes (and why) before training:
   * benchmark split (held out entirely) → language gate → quality score →
   * repetition → contamination → keep. PII is a transform, not a gate:
   * its redaction count rides along so "kept" never means "unscrubbed".
   *
   * Scale shape: each stage is already a per-doc frame shuffled on
   * doc_id; the funnel joins co-partition on that same key, so composing
   * five gates adds joins but no new shuffle pattern. Thresholds are
   * fixture-calibrated so every verdict class is populated at every SF.
   */
  def curationFunnel(docs: DataFrame, qualityMin: Int = 900,
                     benchMod: Int = 50, benchRem: Int = 7): DataFrame = {
    val lang = TextAnalysis.langId(docs)
      .select(col("doc_id"), col("predicted_lang"))
    val qual = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_x1000"))
    val rep = repetitionFilter(docs)
      .select(col("doc_id"), col("keep").as("__rep_keep"))
    val pii = piiScrub(docs).select(col("doc_id"),
      (col("n_email") + col("n_ssn") + col("n_phone") + col("n_ip"))
        .as("n_pii"))
    val dec = decontaminate(docs, benchMod = benchMod, benchRem = benchRem)
      .select(col("doc_id"), col("contaminated"))
    docs.select("doc_id")
      .join(lang, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(pii, Seq("doc_id"))
      .join(dec, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("doc_id") % benchMod === benchRem, lit("benchmark"))
          .when(col("predicted_lang") =!= "en", lit("lang"))
          .when(col("quality_x1000") < qualityMin, lit("quality"))
          .when(!col("__rep_keep"), lit("repetition"))
          .when(col("contaminated"), lit("contaminated"))
          .otherwise(lit("keep")))
      .select("doc_id", "predicted_lang", "quality_x1000", "n_pii",
        "verdict")
      .orderBy("doc_id")
  }

  /**
   * Overlapping-window chunk plan — the retrieval/embedding prep dual of
   * [[seqPack]]: each document splits into `window`-token chunks advancing
   * by `stride` (< window ⇒ adjacent chunks overlap by window − stride
   * tokens, so no boundary sentence is ever lost to a cut). Emits one row
   * per chunk with its token span; a doc at or under one window is a
   * single chunk. Pure per-row arithmetic + an explode — no shuffle until
   * the output ordering.
   */
  def docChunks(docs: DataFrame, window: Int = 256,
                stride: Int = 192): DataFrame =
    docs
      .withColumn("ws", split(normText(col("text")), " "))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("n_chunks", expr(s"IF(n_tokens <= $window, 1L, " +
        s"(n_tokens - $window + ${stride - 1}) DIV $stride + 1)"))
      .select(col("doc_id"), col("n_tokens"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("end_tok",
        least(col("start_tok") + window, col("n_tokens")))
      .select("doc_id", "chunk_idx", "start_tok", "end_tok", "n_tokens")
      .orderBy("doc_id", "chunk_idx")

  /** Concat-and-chop sequence packing: deterministic shard assignment
    * (md5 of doc_id → shard), docs concatenated in doc_id order within a
    * shard, then chopped into fixed seqLen token blocks. Emits each doc's
    * shard, token offset, and the block span it lands in — exactly the
    * layout a training loader consumes. One window per shard, no other
    * shuffle. */
  def seqPack(docs: DataFrame, shards: Int = 8, seqLen: Long = 2048): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    docs
      .withColumn("n_tokens", size(split(normText(col("text")), " ")))
      .withColumn("shard",
        pmod(tokenHash60(col("doc_id").cast("string")), lit(shards.toLong)))
      .withColumn("end_off", sum("n_tokens").over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("start_block", expr(s"start_off DIV ${seqLen}L"))
      .withColumn("end_block", expr(s"(end_off - 1) DIV ${seqLen}L"))
      .withColumn("n_blocks", col("end_block") - col("start_block") + 1)
      .select("doc_id", "shard", "n_tokens", "start_off", "start_block",
        "end_block", "n_blocks")
      .orderBy("doc_id")
  }

  /**
   * Packing diagnostics over the [[seqPack]] layout — the numbers a
   * training-data engineer reads to pick seqLen and shard count: per
   * shard, the token mass, the block count and tail padding (the ONLY
   * padding concat-and-chop ever produces), and fragmentation (documents
   * that cross a block boundary lose attention locality at the cut).
   * `pad_pm` = padded-slot share per mille of the shard's block capacity.
   *
   * Scale shape: rides seqPack's single per-shard window shuffle, then
   * folds to one row per shard (map-side combinable agg).
   */
  def packStats(docs: DataFrame, shards: Int = 8,
                seqLen: Long = 2048): DataFrame =
    seqPack(docs, shards, seqLen)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("n_blocks") > 1, 1L).otherwise(0L)).as("split_docs"),
        sum(col("n_blocks") - 1).as("boundary_cuts"))
      .withColumn("n_blocks",
        expr(s"(total_tokens + ${seqLen - 1}L) DIV ${seqLen}L"))
      .withColumn("tail_pad",
        expr(s"n_blocks * ${seqLen}L - total_tokens"))
      .withColumn("pad_pm",
        expr(s"tail_pad * 1000 DIV (n_blocks * ${seqLen}L)"))
      .select("shard", "n_docs", "total_tokens", "n_blocks", "tail_pad",
        "pad_pm", "split_docs", "boundary_cuts")
      .orderBy("shard")

  /**
   * URL canonicalization + URL-level dedup — the web-crawl curation step
   * every large corpus pipeline runs before content dedup (the CCNet /
   * RefinedWeb recipe: two fetches of the same resource differ only in
   * scheme case, host case, default ports, tracking params, fragments,
   * param order, and index-file suffixes):
   *  - scheme and host lowercase; an explicit default port (http:80,
   *    https:443) drops; other ports stay;
   *  - the path collapses duplicate slashes and strips a trailing
   *    /index.html to the bare directory;
   *  - the fragment drops entirely; tracking params (utm_*, fbclid,
   *    gclid) drop; surviving query params sort by full text so
   *    param order never splits a URL group;
   *  - doc groups sharing a canonical URL dedup keep-min-doc_id.
   *
   * Scale shape: canonicalization is a codegen'd per-row projection;
   * the dedup is one groupBy on the canonical hash — the same shape as
   * exact content dedup, a fraction of MinHash's cost, which is why
   * pipelines run the URL pass first.
   */
  def urlDedup(urls: DataFrame): DataFrame = {
    val hostport = regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]+)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val scheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
    val rawPath =
      regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path0 = regexp_replace(rawPath, "/{2,}", "/")
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "/index\\.html$", "/"))
    val rawQuery = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val keptParams = array_join(
      array_sort(filter(split(rawQuery, "&"), p =>
        !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
          p.startsWith("gclid=") || p === ""))), "&")
    val portKept = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val canonical = concat(scheme, lit("://"), host, portKept, path,
      when(keptParams === "", lit(""))
        .otherwise(concat(lit("?"), keptParams)))
    val w = Window.partitionBy("canonical")
    urls
      .withColumn("canonical", canonical)
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("keep_id", min("doc_id").over(w))
      .select(col("doc_id"), col("canonical"), col("cluster_size"),
        (col("cluster_size") > 1).as("is_dup"),
        (col("doc_id") === col("keep_id")).as("keep"))
      .orderBy("doc_id")
  }
}
