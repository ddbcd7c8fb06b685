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
}
