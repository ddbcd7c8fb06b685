package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Operators over the nested key shape (apache/ozone OmKeyInfo.java:72-113:
 * MAP tags, ARRAY<STRUCT> acls, ARRAY<STRUCT> block locations) — the type
 * checklist of SURVEY §1.2 exercised for real: map subscript, array-lambda
 * predicates, and a generator explode of the location list
 * (KeyManagerImpl block resolution shape).
 *
 * Scale design: map/array access and `exists()` lambdas are codegen'd
 * per-row expressions (no shuffle); the location explode is a Generator —
 * output rows ∝ blocks, parallel per input partition; the ACL probe is a
 * broadcast LEFT SEMI join (principal sets are tiny).
 */
object Nested {

  /** Lifecycle tag-rule filter via real map access (tags['flag']) — the
    * MapType dual of the flat tag_flag rule in [[Lifecycle]]. */
  def tagRuleExpiry(objectsNested: DataFrame, flagValue: String,
                    beforeMs: Long): DataFrame =
    objectsNested
      .filter(col("tags")("flag") === flagValue &&
        col("modification_time") < beforeMs)
      .select("volume", "bucket", "key", "data_size", "modification_time")
      .orderBy("volume", "bucket", "key", "data_size", "modification_time")

  /**
   * Principal-accurate ACL probe: (key, principal) pairs where the
   * requesting principal holds READ through a USER acl entry matching its
   * OWN name — the checkAccess resolution of the reference
   * (hadoop-ozone/common/.../OzoneAclUtil.java: each entry matched on
   * name + type + rights), not an owner shortcut. The principal set is
   * broadcast; the acl match is an exists() lambda over the nested array
   * evaluated inside the (codegen'd) join condition — the key table never
   * shuffles.
   */
  def aclProbe(objectsNested: DataFrame, principals: DataFrame): DataFrame =
    objectsNested.join(broadcast(principals),
        exists(col("acls"), a =>
          a("type") === "USER" && a("name") === col("principal") &&
            a("rights").contains("r")))
      .select("volume", "bucket", "key", "principal")
      .orderBy("volume", "bucket", "key", "principal")

  /** Explode the per-key block location list — one row per block with its
    * byte range (the lookupKey → block-list resolution of the reference). */
  def locationsExplode(objectsNested: DataFrame): DataFrame =
    objectsNested
      .select(col("key"), col("data_size"),
        posexplode(col("locations")).as(Seq("block_idx", "loc")))
      .select(
        col("key"), col("data_size"),
        col("loc.container_id").as("container_id"),
        col("loc.local_id").as("local_id"),
        col("loc.offset").as("offset"),
        col("loc.length").as("length"))
      .orderBy("key", "data_size", "offset")
}
