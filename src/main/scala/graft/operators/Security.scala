package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * OM delegation-token write plane —
 * `OzoneDelegationTokenSecretManager` renew/cancel over the dTokenTable
 * (reference:
 * hadoop-ozone/ozone-manager/src/main/java/org/apache/hadoop/ozone/security/
 * OzoneDelegationTokenSecretManager.java).
 *
 * Scale shape: the token table is a control-plane dimension (one row per
 * live token); both ladders are one broadcast existence probe into a
 * protocol-sized request batch — zero shuffles.
 */
object Security {

  /** The dtoken plane's fixed "now" (1995-05-01, matching the expiry
    * scan's horizon) and the configured renew interval (24 h default). */
  val TokenNowMs = 799286400000L
  val TokenRenewIntervalMs = 86400000L

  /**
   * RenewToken ladder (OzoneDelegationTokenSecretManager.renewToken
   * :267-298, reference order):
   *   1. presented maxDate < now → TOKEN_EXPIRED (:278-283 — checked
   *      BEFORE the store lookup, so an expired UNKNOWN token reports
   *      expiry, not invalidity)
   *   2. validateToken store probe → INVALID_TOKEN (:284)
   *   3. renewer empty on the identifier → ACCESS_DENIED (:285-289)
   *   4. caller != identifier renewer → ACCESS_DENIED (:290-295)
   *   5. RENEWED; new expiry = min(maxDate, now + renewInterval) (:297).
   */
  def renewTokenDecisions(requests: DataFrame,
                          dTokens: DataFrame): DataFrame = {
    val store = dTokens.select(col("token_id"),
      lit(true).as("__in_store"))
    requests
      .join(broadcast(store), Seq("token_id"), "left")
      .select(col("req_id"), col("token_owner"), col("caller"),
        when(col("max_expiry_ms") < TokenNowMs, lit("TOKEN_EXPIRED"))
          .when(col("__in_store").isNull, lit("INVALID_TOKEN"))
          .when(col("renewer") === "", lit("ACCESS_DENIED"))
          .when(col("caller") =!= col("renewer"), lit("ACCESS_DENIED"))
          .otherwise(lit("RENEWED")).as("decision"),
        when(col("max_expiry_ms") >= TokenNowMs &&
          col("__in_store").isNotNull && col("renewer") =!= "" &&
          col("caller") === col("renewer"),
          least(col("max_expiry_ms"),
            lit(TokenNowMs + TokenRenewIntervalMs)))
          .otherwise(lit(0L)).as("new_expiry_ms"))
      .orderBy("req_id")
  }

  /**
   * CancelToken ladder (cancelToken:318-350, reference order):
   *   1. identifier owner missing → INVALID_TOKEN (:329-331)
   *   2. caller is neither the owner nor the renewer → ACCESS_DENIED
   *      (:335-341)
   *   3. token absent from the store → INVALID_TOKEN (:345-348 — the
   *      access check runs BEFORE the store probe)
   *   4. CANCELLED.
   * The reason column splits the two INVALID_TOKEN branches.
   */
  def cancelTokenDecisions(requests: DataFrame,
                           dTokens: DataFrame): DataFrame = {
    val store = dTokens.select(col("token_id"),
      lit(true).as("__in_store"))
    requests
      .join(broadcast(store), Seq("token_id"), "left")
      .select(col("req_id"), col("token_owner"), col("caller"),
        when(col("presented_owner") === "", lit("INVALID_TOKEN"))
          .when(col("caller") =!= col("presented_owner") &&
            (col("renewer") === "" || col("caller") =!= col("renewer")),
            lit("ACCESS_DENIED"))
          .when(col("__in_store").isNull, lit("INVALID_TOKEN"))
          .otherwise(lit("CANCELLED")).as("decision"),
        when(col("presented_owner") === "", lit("NO_OWNER"))
          .when(col("caller") =!= col("presented_owner") &&
            (col("renewer") === "" || col("caller") =!= col("renewer")),
            lit(""))
          .when(col("__in_store").isNull, lit("NOT_FOUND"))
          .otherwise(lit("")).as("reason"))
      .orderBy("req_id")
  }

  /**
   * RevokeSecret ladder (S3RevokeSecretRequest.preExecute:52-61 +
   * validateAndUpdateCache:90-110): the permission gate runs in
   * preExecute, BEFORE the store probe — the caller must be the
   * accessId's owning principal (for tenant access ids, the catalog's
   * user principal, S3SecretRequestHelper.java:99-101; for plain
   * Kerberos ids, the id itself, :120) or an S3 admin, so an
   * unauthorized revoke of a NONEXISTENT secret still reports
   * ACCESS_DENIED. Then remove-if-exists: stored secret → REVOKED,
   * absent → S3_SECRET_NOT_FOUND (a non-error status, :107).
   *
   * Scale shape: two broadcast control-plane probes (access catalog,
   * secret store) into a protocol-sized batch — zero shuffles.
   */
  def revokeSecretDecisions(requests: DataFrame, secrets: DataFrame,
                            accessCatalog: DataFrame,
                            s3Admins: Seq[String] = Seq("om-admin"))
      : DataFrame = {
    val ownerProbe = accessCatalog.select(col("access_id"),
      col("user_principal").as("__owner"))
    val secretProbe = secrets.select(col("access_id"),
      lit(true).as("__has_secret"))
    requests
      .join(broadcast(ownerProbe), Seq("access_id"), "left")
      .join(broadcast(secretProbe), Seq("access_id"), "left")
      .select(col("req_id"), col("access_id"), col("caller"),
        when(col("caller") =!= coalesce(col("__owner"), col("access_id"))
          && !col("caller").isin(s3Admins: _*), lit("ACCESS_DENIED"))
          .when(col("__has_secret").isNull, lit("S3_SECRET_NOT_FOUND"))
          .otherwise(lit("REVOKED")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * Prepare-gate fold — OM write fencing for upgrades/downgrades
   * (OzoneManagerStateMachine.preAppendTransaction:398-440 +
   * OzoneManagerPrepareState.requestAllowed:226-235,
   * OMPrepareRequest / OMCancelPrepareRequest admin gates):
   *   - Prepare: the superuser check runs BEFORE the gate is enabled —
   *     a non-admin Prepare is ACCESS_DENIED and moves nothing; an
   *     admin Prepare enables the gate and records its own log index
   *     as the prepare marker (re-prepare while prepared is allowed —
   *     requestAllowed lets Prepare through the gate)
   *   - CancelPrepare: passes the gate unconditionally, then the same
   *     admin check; an admin cancel disables the gate (idempotent with
   *     the gate already off), a non-admin cancel is refused with the
   *     gate UNMOVED
   *   - every other write: fenced while the gate is on —
   *     NOT_SUPPORTED_OPERATION_WHEN_PREPARED (admins fence too; the
   *     gate is type-based, not principal-based).
   *
   * Gate state before op i = the most recent successful Prepare/Cancel
   * before i — a last-non-null running fold over the op log, exactly the
   * prefix-ACL fold's shape. Scale: the prepare log is control-plane
   * sized (a handful of ops per upgrade); the single-sequence window is
   * bounded by it, never by data-plane volume.
   */
  def prepareGateFold(ops: DataFrame,
                      admins: Seq[String] = Seq("om-admin")): DataFrame = {
    val isAdmin = col("caller").isin(admins: _*)
    val stateChange =
      when(col("op_type") === "PREPARE" && isAdmin, lit(1))
        .when(col("op_type") === "CANCEL_PREPARE" && isAdmin, lit(0))
    val wPrev = Window.orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    ops
      .withColumn("sc", stateChange)
      .withColumn("gate_on",
        coalesce(last("sc", ignoreNulls = true).over(wPrev) === 1,
          lit(false)))
      .withColumn("decision",
        when(col("op_type") === "PREPARE",
          when(!isAdmin, lit("ACCESS_DENIED")).otherwise(lit("PREPARED")))
          .when(col("op_type") === "CANCEL_PREPARE",
            when(!isAdmin, lit("ACCESS_DENIED"))
              .otherwise(lit("CANCELLED")))
          .when(col("gate_on"),
            lit("NOT_SUPPORTED_OPERATION_WHEN_PREPARED"))
          .otherwise(lit("APPLIED")))
      .select(col("seq"), col("op_type"), col("caller"), col("gate_on"),
        col("decision"),
        when(col("decision") === "PREPARED", col("seq")).otherwise(lit(-1L))
          .as("prepare_index"))
      .orderBy("seq")
  }

  /**
   * FinalizeUpgrade gate fold — layout-version fencing
   * (upgrade/OMLayoutFeatureAspect.checkLayoutFeature: a request
   * annotated @DisallowedUntilLayoutVersion(F) is refused
   * NOT_SUPPORTED_OPERATION_PRIOR_FINALIZATION while the metadata
   * layout version sits below F's version; OMLayoutFeature.java:28-49
   * is the version catalog; FinalizeUpgrade — admin-only, like prepare
   * — walks every un-finalized feature's upgrade actions in version
   * order and advances MLV to the software layout version, a second
   * finalize reporting ALREADY_FINALIZED):
   *   - REQUEST: feature version ≤ MLV-before → ALLOWED, else refused
   *   - FINALIZE by a non-admin → ACCESS_DENIED, MLV unmoved
   *   - FINALIZE by an admin → FINALIZATION_DONE with features_run =
   *     slv − MLV-before (the contiguous catalog makes the count the
   *     version gap); at MLV == slv → ALREADY_FINALIZED, 0 run.
   * Same last-non-null fold shape as [[prepareGateFold]]; the upgrade
   * log is control-plane sized.
   */
  def finalizeGateFold(ops: DataFrame, features: DataFrame,
                       startMlv: Long = 4L, slv: Long = 11L,
                       admins: Seq[String] = Seq("om-admin")): DataFrame = {
    val isAdmin = col("caller").isin(admins: _*)
    val wPrev = Window.orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    ops
      .withColumn("sc",
        when(col("op_type") === "FINALIZE" && isAdmin, lit(1)))
      .withColumn("mlv_before",
        when(last("sc", ignoreNulls = true).over(wPrev) === 1, lit(slv))
          .otherwise(lit(startMlv)))
      .join(broadcast(features.select(col("feature"),
        col("version").as("feature_version"))), Seq("feature"), "left")
      .withColumn("decision",
        when(col("op_type") === "FINALIZE",
          when(!isAdmin, lit("ACCESS_DENIED"))
            .when(col("mlv_before") === slv, lit("ALREADY_FINALIZED"))
            .otherwise(lit("FINALIZATION_DONE")))
          .when(col("feature_version") <= col("mlv_before"),
            lit("ALLOWED"))
          .otherwise(lit("NOT_SUPPORTED_OPERATION_PRIOR_FINALIZATION")))
      .select(col("seq"), col("op_type"), col("feature"), col("caller"),
        col("mlv_before"), col("decision"),
        when(col("decision") === "FINALIZATION_DONE",
          lit(slv) - col("mlv_before")).otherwise(lit(0L))
          .as("features_run"))
      .orderBy("seq")
  }

  /** The token-mint plane's max lifetime (the 7-day Hadoop DT default
    * the reference inherits via tokenMaxLifetime). */
  val TokenMaxLifetimeMs = 604800000L

  /**
   * GetDelegationToken mint ladder (OzoneManager.getDelegationToken
   * :4416-4445 + OzoneDelegationTokenSecretManager.createToken:199-222,
   * updateIdentifierDetails:241-250; the leader mints in preExecute and
   * replicates the result, OMGetDelegationTokenRequest.java:66-130):
   *   1. isAllowedDelegationTokenOp — with security on, only KERBEROS /
   *      KERBEROS_SSL / CERTIFICATE connections may be issued a token;
   *      TOKEN-authenticated callers are refused INVALID_AUTH_METHOD (a
   *      delegation token cannot mint another), but a security-OFF
   *      deployment bypasses the gate entirely
   *   2. no running secret manager → WARN + null token; the RPC still
   *      SUCCEEDS with an empty response (NO_TOKEN, not an error)
   *   3. MINTED: owner = the caller UGI, realUser rides along for proxy
   *      callers, renew-by = issue + renewInterval, maxDate = issue +
   *      maxLifetime.
   *
   * Scale shape: a pure projection over the request batch — no joins,
   * no shuffles.
   */
  def getTokenDecisions(requests: DataFrame): DataFrame = {
    val decision =
      when(col("security_on") &&
        !col("auth_method").isin("KERBEROS", "KERBEROS_SSL",
          "CERTIFICATE"), lit("INVALID_AUTH_METHOD"))
        .when(!col("mgr_running"), lit("NO_TOKEN"))
        .otherwise(lit("MINTED"))
    requests
      .withColumn("decision", decision)
      .select(col("req_id"), col("caller"), col("renewer"),
        col("decision"),
        when(col("decision") === "MINTED", col("caller")).otherwise(lit(""))
          .as("owner"),
        when(col("decision") === "MINTED", col("real_user"))
          .otherwise(lit("")).as("real_user"),
        when(col("decision") === "MINTED",
          lit(TokenNowMs + TokenRenewIntervalMs)).otherwise(lit(0L))
          .as("renew_by_ms"),
        when(col("decision") === "MINTED",
          lit(TokenNowMs + TokenMaxLifetimeMs)).otherwise(lit(0L))
          .as("max_date_ms"))
      .orderBy("req_id")
  }

  /**
   * Multi-level ACL check routing — OzoneAclUtils.checkAllAcls
   * (ozone-manager/.../OzoneAclUtils.java:78-130) + getParentNativeAcl
   * (:139-181):
   *  - VOLUME access is a single check with the VOLUME owner as the
   *    {OWNER} substitution;
   *  - bucket/key/prefix access by the VOLUME OWNER short-circuits to a
   *    single check (still volume-owner context);
   *  - otherwise TWO checks run: the parent VOLUME check first — right
   *    READ for the Ranger authorizer, but under the native authorizer a
   *    BUCKET op derives its parent right (CREATE→WRITE, everything
   *    else→READ) — then the resource check with the BUCKET owner as
   *    {OWNER};
   *  - the native authorizer's full parent table (the child→parent
   *    mapping for key/prefix under their bucket: CREATE→WRITE,
   *    WRITE→WRITE, DELETE/LIST/READ_ACL/WRITE_ACL→READ, READ→READ) is
   *    surfaced as parent_native_acl for every scenario.
   */
  def aclParentChain(scenarios: DataFrame): DataFrame = {
    val parentNative =
      when(col("res_type") === "VOLUME", lit("NONE"))
        .when(col("acl_type") === "CREATE", lit("WRITE"))
        .when(col("res_type") === "BUCKET", lit("READ"))
        .when(col("acl_type") === "WRITE", lit("WRITE"))
        .when(col("acl_type").isin("DELETE", "LIST", "READ_ACL",
          "WRITE_ACL"), lit("READ"))
        .otherwise(col("acl_type"))
    scenarios
      .withColumn("parent_native_acl", parentNative)
      .withColumn("single",
        col("res_type") === "VOLUME" || col("is_vol_owner"))
      .withColumn("n_checks",
        when(col("single"), lit(1L)).otherwise(lit(2L)))
      .withColumn("first_res",
        when(col("single"), col("res_type")).otherwise(lit("VOLUME")))
      .withColumn("first_right",
        when(col("single"), col("acl_type"))
          .when(col("native_enabled") && col("res_type") === "BUCKET",
            col("parent_native_acl"))
          .otherwise(lit("READ")))
      .withColumn("first_owner_ctx", lit("volume"))
      .withColumn("second_right",
        when(col("single"), lit("")).otherwise(col("acl_type")))
      .withColumn("second_owner_ctx",
        when(col("single"), lit("")).otherwise(lit("bucket")))
      .select("sc_id", "n_checks", "first_res", "first_right",
        "first_owner_ctx", "second_right", "second_owner_ctx",
        "parent_native_acl")
      .orderBy("sc_id")
  }
}
