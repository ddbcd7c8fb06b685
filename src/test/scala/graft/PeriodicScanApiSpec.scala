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
}
