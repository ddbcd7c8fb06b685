package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-tenancy read surface (apache/ozone OMDBDefinition.java:279-298:
 * tenantStateTable / tenantAccessIdTable / principalToAccessIdsTable, and
 * the ListTenant / TenantGetUserInfo dispatch of
 * OzoneManagerRequestHandler.java).
 *
 * Scale design: tenant catalogs are control-plane tables (rows ∝ tenants ×
 * principals, never keys) — every query here is a scan/filter over an
 * already-small dimension; the only key-table contact is the usage rollup
 * already aggregated in tenant_state.
 */
object Tenants {

  /** ListTenant: every tenant with its volume and usage rollup. */
  def listTenants(tenantState: DataFrame): DataFrame =
    tenantState
      .select("tenant_id", "volume", "bucket_count", "used_bytes")
      .orderBy("tenant_id")

  /** TenantGetUserInfo: all access ids held by one principal across
    * tenants (the principalToAccessIds reverse index as a filter). */
  def tenantUserInfo(tenantAccessIds: DataFrame, principal: String): DataFrame =
    tenantAccessIds
      .filter(col("user_principal") === principal)
      .select("access_id", "tenant_id", "user_principal")
      .orderBy("access_id")

  /**
   * AssignUserAccessId decision table — the validation ladder of
   * OMTenantAssignUserAccessIdRequest.java:120-270, evaluated in the
   * reference's exact order for a whole request batch in one pass:
   *   1. accessId at/over the 100-char cap        → INVALID_ACCESS_ID
   *   2. '$' (the tenant delimiter) in principal  → INVALID_TENANT_USERNAME
   *   3. '$' in tenant name                       → INVALID_TENANT_ID
   *   4. tenant absent from tenantStateTable      → TENANT_NOT_FOUND
   *   5. accessId already in tenantAccessIdTable, OR the principal already
   *      holds an accessId in this tenant → TENANT_USER_ACCESS_ID_ALREADY_EXISTS
   *   6. otherwise ASSIGNED (the request also mints the S3 secret —
   *      served by the existing GetS3Secret facade).
   *
   * Scale shape: three broadcast probes (tenant catalog, accessId set,
   * (tenant, principal) membership — all control-plane dims) into the
   * request batch scan.
   */
  def assignAccessIdDecisions(requests: DataFrame, tenantState: DataFrame,
                              tenantAccessIds: DataFrame): DataFrame = {
    val tenants = tenantState.select("tenant_id").distinct()
      .withColumn("__tenant_exists", lit(true))
    val ids = tenantAccessIds.select("access_id").distinct()
      .withColumn("__id_exists", lit(true))
    val membership = tenantAccessIds
      .select("tenant_id", "user_principal").distinct()
      .withColumn("__user_in_tenant", lit(true))
    requests
      .join(broadcast(tenants), Seq("tenant_id"), "left")
      .join(broadcast(ids), Seq("access_id"), "left")
      .join(broadcast(membership), Seq("tenant_id", "user_principal"),
        "left")
      .withColumn("decision",
        when(length(col("access_id")) >= 100, lit("INVALID_ACCESS_ID"))
          .when(col("user_principal").contains("$"),
            lit("INVALID_TENANT_USERNAME"))
          .when(col("tenant_id").contains("$"), lit("INVALID_TENANT_ID"))
          .when(col("__tenant_exists").isNull, lit("TENANT_NOT_FOUND"))
          .when(col("__id_exists").isNotNull ||
            col("__user_in_tenant").isNotNull,
            lit("TENANT_USER_ACCESS_ID_ALREADY_EXISTS"))
          .otherwise(lit("ASSIGNED")))
      .select("tenant_id", "user_principal", "access_id", "decision")
      .orderBy("tenant_id", "user_principal", "access_id")
  }

  /**
   * CreateTenant ladder (OMTenantCreateRequest.preExecute:110-180, in
   * reference order):
   *   1. '$' in tenant id → INVALID_VOLUME_NAME (:123 — the reference
   *      reports the volume-name code for the delimiter too)
   *   2. tenantStateTable hit → TENANT_ALREADY_EXISTS (:132)
   *   3. OmUtils.validateVolumeName on the tenant's volume (defaults to
   *      the tenant name) → INVALID_VOLUME_NAME (:141)
   *   4. volume exists and force flag unset → VOLUME_ALREADY_EXISTS
   *      (:170-172, forceCreationWhenVolumeExists skips)
   *   5. CREATED.
   */
  def tenantCreateDecisions(requests: DataFrame, tenantState: DataFrame,
                            volumes: DataFrame): DataFrame = {
    val tenants = tenantState.select("tenant_id").distinct()
      .withColumn("__tenant_exists", lit(true))
    val vols = volumes.select("volume").distinct()
      .withColumn("__vol_exists", lit(true))
    requests
      .join(broadcast(tenants), Seq("tenant_id"), "left")
      .join(broadcast(vols), Seq("volume"), "left")
      .select(col("req_id"), col("tenant_id"), col("volume"),
        when(col("tenant_id").contains("$"), lit("INVALID_VOLUME_NAME"))
          .when(col("__tenant_exists").isNotNull,
            lit("TENANT_ALREADY_EXISTS"))
          .when(!BucketOps.volumeNameValid(col("volume")),
            lit("INVALID_VOLUME_NAME"))
          .when(col("__vol_exists").isNotNull &&
            !col("force_when_volume_exists"), lit("VOLUME_ALREADY_EXISTS"))
          .otherwise(lit("CREATED")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * DeleteTenant ladder (OMTenantDeleteRequest.preExecute:75-115). The
   * not-empty check runs BEFORE the existence lookup (isTenantEmpty must
   * precede the Ranger policy teardown) — so a tenant missing from the
   * state table but still holding access ids reports TENANT_NOT_EMPTY,
   * not TENANT_NOT_FOUND. A truthful reference quirk, probed by the
   * fixture:
   *   1. access ids exist under the tenant → TENANT_NOT_EMPTY (:91)
   *   2. tenantStateTable miss → TENANT_NOT_FOUND (:105)
   *   3. DELETED (volume decoupled).
   */
  def tenantDeleteDecisions(requests: DataFrame, tenantState: DataFrame,
                            accessCatalog: DataFrame): DataFrame = {
    val tenants = tenantState.select("tenant_id").distinct()
      .withColumn("__tenant_exists", lit(true))
    val nonEmpty = accessCatalog.where(col("tenant_id").isNotNull)
      .select("tenant_id").distinct()
      .withColumn("__has_ids", lit(true))
    requests
      .join(broadcast(tenants), Seq("tenant_id"), "left")
      .join(broadcast(nonEmpty), Seq("tenant_id"), "left")
      .select(col("req_id"), col("tenant_id"),
        when(col("__has_ids").isNotNull, lit("TENANT_NOT_EMPTY"))
          .when(col("__tenant_exists").isNull, lit("TENANT_NOT_FOUND"))
          .otherwise(lit("DELETED")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * RevokeUserAccessId ladder (OMTenantRevokeUserAccessIdRequest:90-125):
   *   1. accessId absent from tenantAccessIdTable → ACCESS_ID_NOT_FOUND
   *   2. the accessId row carries no tenant → TENANT_NOT_FOUND
   *   3. the accessId is a tenant admin → PERMISSION_DENIED (admins must
   *      be revoked via TenantRevokeAdmin first)
   *   4. REVOKED.
   */
  def tenantRevokeDecisions(requests: DataFrame,
                            accessCatalog: DataFrame): DataFrame = {
    val probe = accessCatalog.select(col("access_id"),
      col("tenant_id").as("__row_tenant"), col("is_admin"),
      lit(true).as("__id_exists"))
    requests
      .join(broadcast(probe), Seq("access_id"), "left")
      .select(col("req_id"), col("access_id"),
        when(col("__id_exists").isNull, lit("ACCESS_ID_NOT_FOUND"))
          .when(col("__row_tenant").isNull, lit("TENANT_NOT_FOUND"))
          .when(col("is_admin"), lit("PERMISSION_DENIED"))
          .otherwise(lit("REVOKED")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * TenantAssignAdmin ladder (OMTenantAssignAdminRequest.preExecute:71-111,
   * reference order):
   *   1. empty tenantId → infer it from the accessId; accessId unassigned
   *      anywhere → TENANT_NOT_FOUND (:83-90)
   *   2. checkTenantExistence on the (explicit) tenant → TENANT_NOT_FOUND
   *      (:94)
   *   3. accessId absent from tenantAccessIdTable → ACCESS_ID_NOT_FOUND
   *      (:99-104)
   *   4. accessId assigned to a DIFFERENT tenant → INVALID_TENANT_ID
   *      (:107-111)
   *   5. ASSIGNED / ASSIGNED_DELEGATED (:125-128 — the delegated flag
   *      rides into the admin grant).
   *
   * Scale shape: two broadcast control-plane probes (accessId catalog,
   * tenant catalog) into the request batch; no shuffle.
   */
  def assignAdminDecisions(requests: DataFrame, tenantState: DataFrame,
                           accessCatalog: DataFrame): DataFrame = {
    val idProbe = accessCatalog.select(col("access_id"),
      col("tenant_id").as("__id_tenant"), lit(true).as("__id_exists"))
    val tenants = tenantState.select(col("tenant_id").as("__eff_tenant"))
      .distinct().withColumn("__tenant_exists", lit(true))
    requests
      .join(broadcast(idProbe), Seq("access_id"), "left")
      .withColumn("__eff_tenant",
        when(col("tenant_id") === "", col("__id_tenant"))
          .otherwise(col("tenant_id")))
      .join(broadcast(tenants), Seq("__eff_tenant"), "left")
      .select(col("req_id"),
        coalesce(col("__eff_tenant"), lit("")).as("tenant_id"),
        col("access_id"),
        when(col("tenant_id") === "" && col("__id_exists").isNull,
          lit("TENANT_NOT_FOUND")) // inference found no assignment
          .when(col("__tenant_exists").isNull, lit("TENANT_NOT_FOUND"))
          .when(col("__id_exists").isNull, lit("ACCESS_ID_NOT_FOUND"))
          .when(col("__id_tenant") =!= col("__eff_tenant"),
            lit("INVALID_TENANT_ID"))
          .when(col("delegated"), lit("ASSIGNED_DELEGATED"))
          .otherwise(lit("ASSIGNED")).as("decision"))
      .orderBy("req_id")
  }

  /**
   * TenantRevokeAdmin ladder (OMTenantRevokeAdminRequest.preExecute:71-111)
   * — the exact mirror of [[assignAdminDecisions]]: empty tenant inferred
   * through the accessId (unassigned anywhere → TENANT_NOT_FOUND :83-90),
   * explicit-tenant existence (:94), accessId membership (:99-104),
   * wrong-tenant INVALID_TENANT_ID (:107-111). The apply phase
   * unconditionally clears BOTH admin flags (:183-190
   * setIsAdmin(false).setIsDelegatedAdmin(false)) — revoking a non-admin
   * accessId still succeeds (idempotent), so `was_admin` reports whether
   * the grant existed rather than gating the decision.
   *
   * Scale shape: identical to assign — two broadcast control-plane
   * probes into a protocol-sized batch, no shuffle.
   */
  def revokeAdminDecisions(requests: DataFrame, tenantState: DataFrame,
                           accessCatalog: DataFrame): DataFrame = {
    val idProbe = accessCatalog.select(col("access_id"),
      col("tenant_id").as("__id_tenant"),
      col("is_admin").as("__is_admin"), lit(true).as("__id_exists"))
    val tenants = tenantState.select(col("tenant_id").as("__eff_tenant"))
      .distinct().withColumn("__tenant_exists", lit(true))
    requests
      .join(broadcast(idProbe), Seq("access_id"), "left")
      .withColumn("__eff_tenant",
        when(col("tenant_id") === "", col("__id_tenant"))
          .otherwise(col("tenant_id")))
      .join(broadcast(tenants), Seq("__eff_tenant"), "left")
      .withColumn("decision",
        when(col("tenant_id") === "" && col("__id_exists").isNull,
          lit("TENANT_NOT_FOUND")) // inference found no assignment
          .when(col("__tenant_exists").isNull, lit("TENANT_NOT_FOUND"))
          .when(col("__id_exists").isNull, lit("ACCESS_ID_NOT_FOUND"))
          .when(col("__id_tenant") =!= col("__eff_tenant"),
            lit("INVALID_TENANT_ID"))
          .otherwise(lit("REVOKED")))
      .select(col("req_id"),
        coalesce(col("__eff_tenant"), lit("")).as("tenant_id"),
        col("access_id"), col("decision"),
        (col("decision") === "REVOKED" &&
          coalesce(col("__is_admin"), lit(false))).as("was_admin"))
      .orderBy("req_id")
  }

  /**
   * SetSecret ladder (OMSetSecretRequest.preExecute:57-88, reference
   * order): the accessId existence probe runs FIRST (:73
   * ACCESS_ID_NOT_FOUND — even an invalid secret on an unknown accessId
   * reports the accessId error), then empty secret (:80-82
   * INVALID_REQUEST), then the S3_SECRET_KEY_MIN_LENGTH = 8 floor
   * (OzoneConsts.java:372, :85-88 INVALID_REQUEST), else SET. The reason
   * column disambiguates the two INVALID_REQUEST branches.
   */
  def setSecretDecisions(requests: DataFrame,
                         accessCatalog: DataFrame): DataFrame = {
    val idProbe = accessCatalog.select(col("access_id"),
      lit(true).as("__id_exists")).distinct()
    requests
      .join(broadcast(idProbe), Seq("access_id"), "left")
      .select(col("req_id"), col("access_id"),
        when(col("__id_exists").isNull, lit("ACCESS_ID_NOT_FOUND"))
          .when(length(col("secret")) === 0, lit("INVALID_REQUEST"))
          .when(length(col("secret")) < 8, lit("INVALID_REQUEST"))
          .otherwise(lit("SET")).as("decision"),
        when(col("__id_exists").isNull, lit(""))
          .when(length(col("secret")) === 0, lit("EMPTY_SECRET"))
          .when(length(col("secret")) < 8, lit("SECRET_TOO_SHORT"))
          .otherwise(lit("")).as("reason"))
      .orderBy("req_id")
  }

  /**
   * Ranger background-sync reconcile — OMRangerBGSyncService's
   * OM-DB-is-source-of-truth diff against the Ranger policy/role state
   * (ozone-manager/.../service/OMRangerBGSyncService.java:508-556
   * processAllPoliciesFromOMDB + :453-466 mtRangerPoliciesOpHelper,
   * :604-668 loadAllRolesFromDB, :678-757 processAllRolesFromOMDB):
   *
   *   POLICY rows — every tenant STATE expects its two default policies
   *   (volume + bucket access; even a tenant with no members, the state
   *   iteration drives it): expected-but-missing → CREATE (the service
   *   recreates the default policy), present both sides → IN_SYNC,
   *   Ranger-only → DELETE.
   *
   *   ROLE rows — OM roles exist only for tenants with ≥1 accessId (the
   *   accessId iteration creates both the user and admin role entries,
   *   so an admin role with no admins still exists EMPTY; accessIds
   *   whose tenant state is gone are skipped, :649-652): user role =
   *   every tenant member, admin role = the isAdmin subset. Missing in
   *   Ranger → CREATE_AND_PUSH; member sets differing in EITHER
   *   direction → PUSH (OM's list overwrites); equal → IN_SYNC;
   *   Ranger-only → DELETE (applied in reverse name order so a user
   *   role drops before its admin role, :737-741).
   *
   * Scale shape: tenant catalogs are control-plane dims — two
   * broadcast full-outer diffs, csv member lists via map-side
   * collect_set; nothing data-plane-sized is touched.
   */
  def rangerSync(tenantStates: DataFrame, accessCatalog: DataFrame,
                 rangerPolicies: DataFrame,
                 rangerRoles: DataFrame): DataFrame = {
    val tenants = tenantStates.select("tenant_id").distinct()
    val expectedPolicies = tenants
      .select(explode(array(
        concat(col("tenant_id"), lit("-VolumeAccess")),
        concat(col("tenant_id"), lit("-BucketAccess")))).as("name"))
      .withColumn("om_side", lit(true))
    val policies = expectedPolicies
      .join(rangerPolicies.select(col("policy_name").as("name"))
        .withColumn("ranger_side", lit(true)), Seq("name"), "full_outer")
      .select(lit("POLICY").as("kind"), col("name"),
        when(col("ranger_side").isNull, lit("CREATE"))
          .when(col("om_side").isNull, lit("DELETE"))
          .otherwise(lit("IN_SYNC")).as("decision"),
        lit("").as("om_users"), lit("").as("ranger_users"))
    // OM roles: only tenants with >= 1 accessId; both roles per tenant
    val members = accessCatalog
      .join(broadcast(tenants), Seq("tenant_id"), "left_semi")
    val roleShells = members.select("tenant_id").distinct()
      .select(explode(array(
        concat(col("tenant_id"), lit("-UserRole")),
        concat(col("tenant_id"), lit("-AdminRole")))).as("role_name"))
    val omRoleMembers = members
      .select(concat(col("tenant_id"), lit("-UserRole")).as("role_name"),
        col("user_principal"))
      .unionByName(members.filter(col("is_admin"))
        .select(concat(col("tenant_id"), lit("-AdminRole")).as("role_name"),
          col("user_principal")))
    val omRoles = roleShells
      .join(omRoleMembers.groupBy("role_name")
          .agg(sort_array(collect_set("user_principal")).as("om_set")),
        Seq("role_name"), "left")
      .select(col("role_name"),
        coalesce(col("om_set"), array().cast("array<string>")).as("om_set"),
        lit(true).as("om_side"))
    val rgRoles = rangerRoles.groupBy("role_name")
      .agg(sort_array(collect_set("user_principal")).as("ranger_set"))
      .withColumn("ranger_side", lit(true))
    val roles = omRoles.join(rgRoles, Seq("role_name"), "full_outer")
      .select(lit("ROLE").as("kind"), col("role_name").as("name"),
        when(col("ranger_side").isNull, lit("CREATE_AND_PUSH"))
          .when(col("om_side").isNull, lit("DELETE"))
          .when(col("om_set") =!= col("ranger_set"), lit("PUSH"))
          .otherwise(lit("IN_SYNC")).as("decision"),
        coalesce(array_join(col("om_set"), ","), lit("")).as("om_users"),
        coalesce(array_join(col("ranger_set"), ","), lit(""))
          .as("ranger_users"))
    policies.unionByName(roles).orderBy("kind", "name")
  }

  /**
   * GetS3VolumeContext — OzoneManager.getS3VolumeContext
   * (ozone-manager/.../om/OzoneManager.java:3958-4040), the resolution
   * every S3 request pays before touching a bucket:
   *   1. no S3 auth attached (an old gateway) → the DEFAULT s3 volume,
   *      principal = the remote user's short name;
   *   2. an accessId with no tenant assignment (plain `ozone s3
   *      getsecret` ids — including catalog rows whose tenant_id is
   *      null) → the default volume, principal = the accessId's short
   *      name (auth_to_local of a plain id is itself);
   *   3. an assigned accessId whose tenant has NO state row →
   *      TENANT_NOT_FOUND (the tenant was removed mid-flight, or the DB
   *      is inconsistent — the reference refuses rather than fall back);
   *   4. else the tenant's bucket-namespace volume, principal =
   *      accessIdToUserPrincipal (the part after the `$` delimiter).
   *
   * Scale shape: two broadcast probes (access catalog, tenant state)
   * into the request batch.
   */
  def s3VolumeContext(requests: DataFrame, accessCatalog: DataFrame,
                      tenantState: DataFrame,
                      defaultVolume: String = "s3v"): DataFrame = {
    val cat = accessCatalog.select(col("access_id"),
      col("tenant_id").as("cat_tenant"))
    val st = tenantState.select(col("tenant_id").as("cat_tenant"),
      col("volume").as("tenant_volume"))
    requests
      .join(broadcast(cat), Seq("access_id"), "left")
      .join(broadcast(st), Seq("cat_tenant"), "left")
      .withColumn("status",
        when(!col("has_auth"), lit("OK"))
          .when(col("cat_tenant").isNull, lit("OK"))
          .when(col("tenant_volume").isNull, lit("TENANT_NOT_FOUND"))
          .otherwise(lit("OK")))
      .withColumn("s3_volume",
        when(col("status") =!= "OK", lit(""))
          .when(!col("has_auth") || col("cat_tenant").isNull,
            lit(defaultVolume))
          .otherwise(col("tenant_volume")))
      .withColumn("user_principal",
        when(col("status") =!= "OK", lit(""))
          .when(!col("has_auth"), col("remote_user"))
          .when(col("cat_tenant").isNull, col("access_id"))
          .otherwise(substring_index(col("access_id"), "$", -1)))
      .select("req_id", "status", "s3_volume", "user_principal")
      .orderBy("req_id")
  }

  /**
   * Ranger service-version fence — OMRangerBGSyncService
   * .triggerRangerSyncOnce (ozone-manager/.../multitenant/
   * OMRangerBGSyncService.java:214-266) + OMSetRangerServiceVersionRequest
   * (the Ratis write that persists the observed version, :49-73): a sync
   * run loops while the OM-DB version differs from Ranger's, pushing the
   * OM-DB state and then persisting the OBSERVED Ranger version — so a
   * version bumped mid-sync (by tenant requests or a manual Ranger edit)
   * re-enters the loop, and MAX_ATTEMPT (2) bounds the chase. Closed-form
   * over the per-run observation sequence v0,v1,v2 (Ranger's version
   * before each check):
   *   db == v0            → IN_SYNC, 0 attempts;
   *   v1 == v0            → SYNCED after 1 (the common case: the second
   *                          check sees the version the run just wrote);
   *   v2 == v1            → SYNCED after 2;
   *   else                → ABORTED_MAX_ATTEMPT with db left at v1.
   *
   * Scale shape: a pure projection over the (control-plane) run batch.
   */
  def rangerSyncVersionFold(runs: DataFrame): DataFrame =
    runs
      .withColumn("attempts",
        when(col("db_version") === col("v0"), lit(0L))
          .when(col("v1") === col("v0"), lit(1L))
          .otherwise(lit(2L)))
      .withColumn("final_db_version",
        when(col("db_version") === col("v0"), col("db_version"))
          .when(col("v1") === col("v0"), col("v0"))
          .otherwise(col("v1")))
      .withColumn("outcome",
        when(col("db_version") === col("v0"), lit("IN_SYNC"))
          .when(col("v1") === col("v0"), lit("SYNCED"))
          .when(col("v2") === col("v1"), lit("SYNCED"))
          .otherwise(lit("ABORTED_MAX_ATTEMPT")))
      .select("run_id", "db_version", "attempts", "final_db_version",
        "outcome")
      .orderBy("run_id")
}
