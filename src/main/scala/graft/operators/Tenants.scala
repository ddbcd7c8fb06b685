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
}
