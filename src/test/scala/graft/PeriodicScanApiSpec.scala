package graft

import org.apache.spark.sql.functions._
import graft.streaming.PeriodicScan

/** Cursor-driven periodic scans + the read-RPC facade. */
class PeriodicScanApiSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val objs = Seq(
    ("v", "b", "k1", 10L, 100L), ("v", "b", "k2", 20L, 200L),
    ("v", "b", "k3", 30L, 300L), ("v", "b", "k4", 40L, 400L))
    .toDF("volume", "bucket", "key", "data_size", "modification_time")

  test("periodic scan ticks advance the cursor and never rescan old rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scan_").toString
    val rule = col("data_size") > 0L
    val t1 = PeriodicScan.tick(objs, dir, nowMs = 250L, rule)(rows)
    assert(t1.map(_(2)) === Seq("k1", "k2"))
    assert(PeriodicScan.readCursor(dir) === 250L)
    val t2 = PeriodicScan.tick(objs, dir, nowMs = 400L, rule)(rows)
    assert(t2.map(_(2)) === Seq("k3", "k4")) // only rows newer than the cursor
    val t3 = PeriodicScan.tick(objs, dir, nowMs = 500L, rule)(rows)
    assert(t3.isEmpty)
  }

  test("periodic scan is at-least-once: a failed consumer leaves the cursor put") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scan_alo_").toString
    val rule = col("data_size") > 0L
    intercept[RuntimeException] {
      PeriodicScan.tick(objs, dir, nowMs = 250L, rule) { _ =>
        throw new RuntimeException("downstream failed")
      }
    }
    assert(PeriodicScan.readCursor(dir) === Long.MinValue) // not advanced
    // retry re-delivers the same rows
    val t = PeriodicScan.tick(objs, dir, nowMs = 250L, rule)(rows)
    assert(t.map(_(2)) === Seq("k1", "k2"))
  }

  private val sf = "/root/testdata/sf0.001"

  test("API facade: point lookups and listings delegate to the operators") {
    val vol = Api.infoVolume(spark, sf, "vol1")
    assert(vol.count() === 1)
    val bkt = Api.infoBucket(spark, sf, "vol1", "bucket3")
    assert(bkt.count() === 1)
    val page = Api.listKeys(spark, sf, "vol1", "bucket3", "warehouse/", "", 5)
    assert(page.count() === 6) // maxKeys+1 truncation row
    val k = page.select("key").as[String].head()
    assert(Api.lookupKey(spark, sf, "vol1", "bucket3", k).count() >= 1)
    assert(Api.getKeyInfo(spark, sf, "vol1", "bucket3", k)
      .select("tags", "acls", "locations").columns.length === 3)
    assert(Api.getAcl(spark, sf, "vol1", "bucket3", k).count() >= 2)
    assert(Api.listSnapshots(spark, sf).count() === 2)
    assert(Api.dbUpdates(spark, sf, Long.MaxValue).count() === 0)
  }

  test("API facade: every key RPC resolves bucket links consistently") {
    // the same logical namespace must be visible through a link no matter
    // which read RPC is used (lookup, key info, acl, listings)
    val direct = Api.listKeys(spark, sf, "vol0", "bucket0", "warehouse/", "", 5)
    val viaLink = Api.listKeys(spark, sf, "vol1", "link-a", "warehouse/", "", 5)
    assert(rows(viaLink) === rows(direct) && viaLink.count() > 0)
    val k = direct.select("key").as[String].head()
    assert(rows(Api.lookupKey(spark, sf, "vol1", "link-a", k)) ===
      rows(Api.lookupKey(spark, sf, "vol0", "bucket0", k)))
    assert(rows(Api.getKeyInfo(spark, sf, "vol1", "link-a", k)) ===
      rows(Api.getKeyInfo(spark, sf, "vol0", "bucket0", k)))
    assert(rows(Api.getAcl(spark, sf, "vol1", "link-a", k)) ===
      rows(Api.getAcl(spark, sf, "vol0", "bucket0", k)))
    assert(rows(Api.listStatus(spark, sf, "vol2", "link-b", "warehouse")) ===
      rows(Api.listStatus(spark, sf, "vol0", "bucket0", "warehouse")))
    assert(rows(Api.listObjectsV2(spark, sf, "vol2", "link-b", "warehouse/", "", 10)) ===
      rows(Api.listObjectsV2(spark, sf, "vol0", "bucket0", "warehouse/", "", 10)))
    // broken links: empty through EVERY RPC, flagged in the catalog
    assert(Api.lookupKey(spark, sf, "vol3", "link-broken", k).count() === 0)
    assert(Api.getKeyInfo(spark, sf, "vol3", "link-broken", k).count() === 0)
    assert(Api.listStatus(spark, sf, "vol3", "link-broken", "warehouse").count() === 0)
    assert(Api.resolveBucketLinks(spark, sf)
      .filter(col("status") =!= "OK").count() === 3)
  }

  test("API facade: auth catalog lookups") {
    assert(Api.getS3Secret(spark, sf, "tenant0$clerk1").count() === 1)
    assert(Api.getUserInfo(spark, sf, "admin0").count() === 1)
    assert(Api.listDelegationTokens(spark, sf).count() === 7)
    assert(Api.checkAccess(spark, sf, "auditor2").count() > 0)
    assert(Api.listMultipartUploads(spark, sf, "vol2", "bucket0",
      "warehouse/mpu/").count() > 0)
  }

  test("API facade: light listings, snapshot catalog, diff jobs, tenants") {
    assert(Api.listKeysLight(spark, sf, "vol1", "bucket3", "warehouse/", "", 5)
      .columns.toSeq === Seq("key", "data_size", "creation_time"))
    assert(Api.getSnapshotInfo(spark, sf, "s2").count() === 1)
    val jobs = Api.listSnapshotDiffJobs(spark, sf).collect()
    assert(jobs.map(_.getString(0)).toSeq === Seq("s1->s2"))
    assert(jobs.head.getAs[Long]("diff_rows") > 0)
    assert(Api.listTenants(spark, sf).count() === 4)
    assert(Api.tenantGetUserInfo(spark, sf, "clerk1").count() >= 1)
  }

  test("tenant assign: the validation ladder fires in reference order") {
    val got = graft.operators.Tenants.assignAccessIdDecisions(
      graft.core.Tables.assignRequests(spark, sf),
      graft.core.Tables.tenantState(spark, sf),
      graft.core.Tables.tenantAccessIds(spark, sf))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(3)).toMap
    assert(got(("tenant1", "newuser")) === "INVALID_ACCESS_ID")
    assert(got(("tenant1", "bad$user")) === "INVALID_TENANT_USERNAME")
    assert(got(("ten$ant1", "user1")) === "INVALID_TENANT_ID")
    assert(got(("tenant9", "user2")) === "TENANT_NOT_FOUND")
    // delimiter check precedes tenant existence
    assert(got(("tenant9", "bad$u")) === "INVALID_TENANT_USERNAME")
    // tenant existence precedes the duplicate-accessId check
    assert(got(("tenant9", "clerk1")) === "TENANT_NOT_FOUND")
    assert(got(("tenant1", "freshuser"))
      === "TENANT_USER_ACCESS_ID_ALREADY_EXISTS")
    assert(got(("tenant2", "clerk3"))
      === "TENANT_USER_ACCESS_ID_ALREADY_EXISTS")
    assert(got(("tenant3", "alice")) === "ASSIGNED")
  }

  test("API facade: reclaim candidates and exclusive sizes") {
    val rec = Api.listReclaimableKeys(spark, sf)
    assert(rec.count() > 0)
    assert(rec.filter(!rec("reclaimable")).isEmpty)
    val excl = Api.snapshotExclusiveSizes(spark, sf).collect()
    assert(excl.map(_.getString(0)).toSeq === Seq("s1", "s2"))
    assert(excl.forall(_.getAs[Long]("exclusive_bytes") > 0))
  }
}
