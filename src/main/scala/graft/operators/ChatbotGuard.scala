package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Recon chatbot tool-call guard — the safety ladder between the LLM's
 * tool selection and any Recon API execution (recon/.../chatbot/):
 *
 *  - an empty/missing toolName never reaches validation: processQuery
 *    falls back to a plain-LLM answer (ChatbotAgent.java:213-217);
 *  - Layer 1, allowlist (ChatbotAgent.validateToolCall:535-545 over
 *    ReconApiAllowlist.java:32-62): only the EXACT registered route
 *    names run — prompt-injected paths die here, and the exact-match
 *    set is what makes /api/v1/keys2 unable to ride /api/v1/keys;
 *  - Layer 2, safe scope (:547-556 + ChatbotUtils
 *    .isBucketScopedListKeysPrefix:51-69): listKeys alone additionally
 *    needs a bucket-scoped startPrefix — trimmed, non-empty, not "/",
 *    leading "/", no "..", ≥ 2 non-empty segments;
 *  - limit hygiene (ReconQueryExecutor.execute:72-95 + ChatbotUtils
 *    .parsePositiveInt:75-88): prevKey is ALWAYS stripped (the chatbot
 *    never paginates), blank/unparseable/overflowing limits fall back
 *    to the 1000 cap, parseable limits clamp to min(requested, 1000) —
 *    but a parseable limit ≤ 0 THROWS (only NumberFormatException is
 *    caught), surfacing as an execution error rather than a default.
 *
 * Scale shape: pure per-row string/predicate projection against a
 * broadcast allowlist — no shuffle.
 */
object ChatbotGuard {

  val ListKeysTool = "api_v1_keys_listKeys"
  val MaxRecordsPerCall = 1000L

  private def bucketScoped(p: Column): Column = {
    val t = trim(p)
    p.isNotNull && t =!= "" && t =!= "/" &&
      t.startsWith("/") && !t.contains("..") &&
      size(filter(split(t, "/"), x => x =!= "")) >= 2
  }

  def toolCallGuard(calls: DataFrame, allowlist: DataFrame): DataFrame = {
    val t = trim(col("limit_raw"))
    val parseable = col("limit_raw").isNotNull && t =!= "" &&
      t.rlike("^[+-]?[0-9]+$") &&
      t.cast("decimal(38,0)").between(-2147483648L, 2147483647L)
    val parsed = when(parseable, t.cast("long"))
    calls
      .join(broadcast(allowlist.select(col("tool").as("tool_name"))
        .withColumn("registered", lit(true))), Seq("tool_name"), "left")
      .withColumn("verdict",
        when(col("tool_name") === "", lit("FALLBACK"))
          .when(col("registered").isNull, lit("BLOCKED_UNKNOWN_TOOL"))
          .when(col("tool_name") === ListKeysTool &&
            !bucketScoped(col("start_prefix")), lit("BLOCKED_UNSCOPED"))
          .when(parseable && parsed <= 0, lit("ERROR_BAD_LIMIT"))
          .otherwise(lit("ALLOWED")))
      .withColumn("effective_limit",
        when(col("verdict") === "ALLOWED",
          least(coalesce(parsed, lit(MaxRecordsPerCall)),
            lit(MaxRecordsPerCall)))
          .otherwise(lit(0L)))
      .withColumn("prev_key_stripped",
        col("verdict") === "ALLOWED" && col("has_prev_key"))
      .select("call_id", "verdict", "effective_limit", "prev_key_stripped")
      .orderBy("call_id")
  }
}
