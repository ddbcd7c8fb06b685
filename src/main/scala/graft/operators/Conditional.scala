package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Conditional read/write evaluation — the S3 gateway's If-Match /
 * If-None-Match / If-Modified-Since / If-Unmodified-Since handling
 * (apache/ozone s3gateway ObjectEndpoint.java:187,1278), with RFC 7232 §6
 * precedence: If-Match(412) → If-Unmodified-Since(412) →
 * If-None-Match(304) → If-Modified-Since(304) → 200.
 *
 * Scale design: a pure per-row CASE projection over (etag,
 * modification_time) — codegen'd, no shuffle; at 100 TB it rides the scan.
 */
object Conditional {

  /** Conditional-request header set (None = header absent). */
  case class ReadConds(
    ifMatch: Option[String] = None,
    ifNoneMatch: Option[String] = None,
    ifModifiedSince: Option[Long] = None,
    ifUnmodifiedSince: Option[Long] = None)

  /** Decision column for a GET under `conds` (statuses: 200 / 304 / 412).
    * RFC 7232 §3.4/§3.3 ignore rules: If-Unmodified-Since is IGNORED when
    * If-Match is present; If-Modified-Since is IGNORED when If-None-Match
    * is present. */
  def statusCol(conds: ReadConds): Column = {
    val checks: Seq[(Column, String)] = Seq(
      conds.ifMatch.map(e => (col("etag") =!= e) -> "412"),
      conds.ifUnmodifiedSince.filter(_ => conds.ifMatch.isEmpty)
        .map(t => (col("modification_time") > t) -> "412"),
      conds.ifNoneMatch.map(e => (col("etag") === e) -> "304"),
      conds.ifModifiedSince.filter(_ => conds.ifNoneMatch.isEmpty)
        .map(t => (col("modification_time") <= t) -> "304")
    ).flatten
    checks.foldRight(lit("200")) { case ((cond, code), acc) =>
      when(cond, lit(code)).otherwise(acc)
    }
  }

  /** Per-key conditional GET evaluation over the namespace. */
  def conditionalRead(objects: DataFrame, conds: ReadConds): DataFrame =
    objects
      .withColumn("status", statusCol(conds))
      .select("volume", "bucket", "key", "etag", "modification_time", "status")
      .orderBy("volume", "bucket", "key", "modification_time")

  /**
   * Conditional-WRITE ladder — S3ConditionalRequest.parseWriteConditions /
   * parseDeleteCondition + the PUT/DELETE evaluation (s3gateway/.../endpoint/
   * S3ConditionalRequest.java:155-214, eTagMatches:212-228). Header parse
   * errors fire BEFORE any store probe, in reference order:
   *   1. If-None-Match present but BLANK        → INVALID_EMPTY_INM;
   *   2. If-Match present but BLANK             → INVALID_EMPTY_IM;
   *   3. both headers together on a PUT         → INVALID_BOTH;
   *   4. If-None-Match other than `*` on a PUT  → INVALID_INM_NOT_STAR
   *      (S3 conditional put supports only create-if-absent);
   * then the probe against current key state:
   *   5. If-None-Match:* and the key EXISTS     → PRECONDITION_FAILED;
   *   6. If-Match and no candidate matches the current ETag (a MISSING
   *      key matches nothing; the header is a comma list of
   *      optionally-quoted ETags, `*` matches any existing)
   *                                             → PRECONDITION_FAILED;
   *   7. else WRITTEN / DELETED.
   * DELETE accepts only If-Match (:193-202). ETag candidates are
   * normalized by trimming and stripping one pair of double quotes, as
   * parseETag does.
   *
   * Scale shape: the request batch broadcasts into one probe join against
   * the key state; the ladder is a codegen'd CASE projection.
   */
  /**
   * Atomic key-rewrite generation fencing — `OMKeyRequest
   * .validateAtomicRewrite` (`ozone-manager/.../request/key/
   * OMKeyRequest.java:1358-1379`) plus the If-Match-ETag-to-generation
   * conversion (`:1396-1424`): the OM-side fences behind S3 conditional
   * writes on the two-phase CreateKey→CommitKey path.
   *
   * Per request against the key's LATEST generation (updateID):
   *   1. expectedGen = CREATE_IF_ABSENT and the key exists
   *      ⇒ KEY_ALREADY_EXISTS (:1363-1367);
   *   2. CREATE_IF_ABSENT and absent ⇒ CREATED;
   *   3. a concrete expectedGen and the key absent ⇒ KEY_NOT_FOUND
   *      (:1370-1373);
   *   4. expectedGen ≠ stored updateID ⇒ GENERATION_MISMATCH — the
   *      reference deliberately reports KEY_NOT_FOUND for both so a
   *      racer can't distinguish, the reason column splits them
   *      (:1374-1377);
   *   5. an expected ETag that matches converts to a generation fence
   *      (ETAG_TO_GEN with the stored generation, :1414-1424);
   *      a mismatch ⇒ ETAG_MISMATCH (:1408-1410);
   *   6. else REWRITTEN.
   *
   * Fixture: the md5-sampled key population (1/16 of distinct keys),
   * request class from the second md5 nibble; stored state = the
   * max-version winner per key (the engine's updateID stand-in), ETag
   * = the catalog's md5(key).
   *
   * Scale shape: the store aggregates only the sampled keys (semi-join
   * pruned); one broadcast probe, one CASE projection.
   */
  def atomicRewrite(objects: DataFrame): DataFrame = {
    val CreateIfAbsent = -1L
    val fullKey = concat_ws("/", col("volume"), col("bucket"), col("key"))
    val store = objects
      .withColumn("mk", md5(fullKey))
      .filter(substring(col("mk"), 1, 1) === "0")
      .groupBy("volume", "bucket", "key")
      .agg(max("version").as("stored_gen"),
        max(col("mk")).as("mk"))  // constant per (v,b,key): md5 of the key
      .withColumn("etag", md5(col("key")))
    val reqs = store
      .withColumn("cls", ascii(substring(col("mk"), 2, 1)) % 7)
      .select(col("volume"), col("bucket"),
        when(col("cls").isin(2, 4), concat(col("key"), lit("#nx")))
          .otherwise(col("key")).as("key"),
        when(col("cls").isin(1, 2), lit(CreateIfAbsent))
          .when(col("cls") === 0, col("stored_gen").cast("long"))
          .when(col("cls") === 3, col("stored_gen") + 7L)
          .when(col("cls") === 4, lit(1L))
          .otherwise(lit(null).cast("long")).as("expected_gen"),
        when(col("cls") === 5, md5(col("key")))
          .when(col("cls") === 6, md5(concat(col("key"), lit("x"))))
          .otherwise(lit(null).cast("string")).as("expected_etag"),
        col("cls"))
    reqs
      .join(broadcast(store.select(col("volume"), col("bucket"),
        col("key"), col("stored_gen"), col("etag"))),
        Seq("volume", "bucket", "key"), "left")
      .withColumn("exists", col("stored_gen").isNotNull)
      .withColumn("verdict",
        when(col("expected_gen") === CreateIfAbsent && col("exists"),
          lit("KEY_ALREADY_EXISTS"))
          .when(col("expected_gen") === CreateIfAbsent, lit("CREATED"))
          .when(col("expected_gen").isNotNull && !col("exists"),
            lit("KEY_NOT_FOUND"))
          .when(col("expected_gen").isNotNull &&
            col("expected_gen") =!= col("stored_gen"),
            lit("GENERATION_MISMATCH"))
          .when(col("expected_gen").isNotNull, lit("REWRITTEN"))
          .when(col("expected_etag") === col("etag"),
            lit("ETAG_TO_GEN"))
          .otherwise(lit("ETAG_MISMATCH")))
      .withColumn("effective_gen",
        when(col("verdict").isin("REWRITTEN", "ETAG_TO_GEN"),
          col("stored_gen").cast("long"))
          .when(col("verdict") === "CREATED", lit(0L))
          .otherwise(lit(-1L)))
      .select("volume", "bucket", "key", "verdict", "effective_gen")
      .orderBy("volume", "bucket", "key", "verdict")
  }

  def conditionalWrites(requests: DataFrame, objects: DataFrame): DataFrame = {
    // probe pushdown: only the requested keys' state is aggregated — the
    // namespace scan is semi-filtered by the (tiny) request batch
    val state = objects
      .join(broadcast(requests.select("volume", "bucket", "key").distinct()),
        Seq("volume", "bucket", "key"), "left_semi")
      .groupBy("volume", "bucket", "key")
      .agg(max("etag").as("cur_etag"))
      .withColumn("key_exists", lit(true))
    val normalize = (c: Column) =>
      regexp_replace(trim(c), "^\"|\"$", "")
    requests
      .join(state, Seq("volume", "bucket", "key"), "left")
      .withColumn("inm_norm", normalize(col("inm_value")))
      .withColumn("im_match",
        when(!col("has_im"), lit(false)).otherwise(
          exists(transform(split(col("im_value"), ","),
            x => regexp_replace(trim(x), "^\"|\"$", "")),
            x => x === "*" && col("key_exists").isNotNull ||
              col("cur_etag").isNotNull && x === col("cur_etag"))))
      .withColumn("decision",
        // parseDeleteCondition reads ONLY If-Match (:193-202) — every
        // If-None-Match rung, including the blank-header check, is
        // PUT-only; a DELETE carrying the header silently ignores it
        when(col("op") === "PUT" && col("has_inm") &&
          trim(col("inm_value")) === "", lit("INVALID_EMPTY_INM"))
          .when(col("has_im") && trim(col("im_value")) === "",
            lit("INVALID_EMPTY_IM"))
          .when(col("op") === "PUT" && col("has_inm") && col("has_im"),
            lit("INVALID_BOTH"))
          .when(col("op") === "PUT" && col("has_inm") &&
            col("inm_norm") =!= "*", lit("INVALID_INM_NOT_STAR"))
          .when(col("op") === "PUT" && col("has_inm") &&
            col("inm_norm") === "*" && col("key_exists").isNotNull,
            lit("PRECONDITION_FAILED"))
          .when(col("has_im") && !col("im_match"),
            lit("PRECONDITION_FAILED"))
          .when(col("op") === "PUT", lit("WRITTEN"))
          .otherwise(lit("DELETED")))
      .select("req_id", "op", "decision")
      .orderBy("req_id")
  }
}
