package graft

import graft.operators.S3Ops

/** CopyObject / MultiDelete decision semantics on a hand-built state. */
class S3OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val objects = Seq(
    // key with two committed versions: copy must carry the LATEST etag/size
    ("v1", "b1", "a/k1", 1L, 100L, "etag-old"),
    ("v1", "b1", "a/k1", 2L, 222L, "etag-new"),
    ("v1", "b1", "a/k2", 1L, 50L, "etag-k2"))
    .toDF("volume", "bucket", "key", "version", "data_size", "etag")

  test("copyObjects walks every ObjectEndpoint.copyObject branch") {
    val reqs = Seq(
      ("v1", "b1", "a/k1", "a/k1.copy", None),            // normal copy
      ("v1", "b1", "a/none", "a/none.copy", None),        // missing source
      ("v1", "b1", "a/k2", "a/k2", None),                 // self, no metadata
      ("v1", "b1", "a/k2", "a/k2", Some("REDUCED_REDUNDANCY"))) // self + storage
      .toDF("volume", "bucket", "src_key", "dst_key", "storage_class")
    val got = S3Ops.copyObjects(objects, reqs)
      .as[(String, String, String, String, String, String, Long)]
      .collect().map(r => (r._3, r._4, r._5, r._6, r._7)).toSet
    assert(got === Set(
      ("a/k1", "a/k1.copy", "COPIED", "etag-new", 222L),
      ("a/none", "a/none.copy", "ERR_NO_SUCH_KEY", "", -1L),
      ("a/k2", "a/k2", "ERR_INVALID_REQUEST", "", -1L),
      ("a/k2", "a/k2", "COPIED_SELF", "etag-k2", 50L)))
  }

  test("multiDelete: idempotent missing keys, owner precondition") {
    val vols = Seq(("v1", "admin1")).toDF("volume", "owner")
    val reqs = Seq(
      ("v1", "b1", "a/k1", "admin1"),    // exists, owner ok -> DELETED
      ("v1", "b1", "a/ghost", "admin1"), // missing -> still DELETED
      ("v1", "b1", "a/k2", "intruder"))  // wrong owner -> ACCESS_DENIED
      .toDF("volume", "bucket", "key", "expected_owner")
    val got = S3Ops.multiDelete(objects, reqs, vols)
      .as[(String, String, String, String, Boolean, String)]
      .collect().map(r => (r._3, r._5, r._6)).toSet
    assert(got === Set(
      ("a/k1", true, "DELETED"),
      ("a/ghost", false, "DELETED"),
      ("a/k2", true, "ACCESS_DENIED")))
  }

  test("putBucketAcl: probe order, first-failing grant, translations") {
    val T = graft.core.Tables
    val sf = "/root/testdata/sf0.001"
    val rows = S3Ops.putBucketAcl(T.putBucketAclRequests(spark, sf),
      T.putBucketAclGrants(spark, sf), T.buckets(spark, sf),
      T.volumes(spark, sf)).collect()
    val byReq = rows.groupBy(_.getLong(0))
    def dec(r: Long) = byReq(r).head.getString(3)
    assert(dec(3L) === "NO_SUCH_BUCKET")
    assert(dec(4L) === "ACCESS_DENIED")  // expected-owner mismatch
    assert(dec(5L) === "APPLIED")        // matching expected owner
    assert(dec(6L) === "INVALID_ARGUMENT")
    assert(dec(7L) === "NOT_IMPLEMENTED")
    // first failing grant decides: malformed pos2 beats emailAddress pos3
    assert(dec(8L) === "INVALID_ARGUMENT")
    // bucket lookup precedes grant parsing: malformed grants on a
    // missing bucket still report NO_SUCH_BUCKET
    assert(dec(9L) === "NO_SUCH_BUCKET")
    // an APPLIED grant explodes to exactly 3 rows (bucket DEFAULT +
    // ACCESS, volume ACCESS) with the FULL_CONTROL translations
    val g1 = byReq(1L).filter(_.getString(5) == "clerk1")
      .map(r => (r.getString(6), r.getString(7), r.getString(8))).toSet
    assert(g1 === Set(
      ("BUCKET", "DEFAULT", "ALL"), ("BUCKET", "ACCESS", "ALL"),
      ("VOLUME", "ACCESS", "READ,READ_ACL,WRITE,WRITE_ACL")))
    // least-privilege volume mapping for WRITE
    val g2 = byReq(2L).filter(r => r.getString(5) == "u2" &&
      r.getString(6) == "VOLUME").map(_.getString(8)).toSet
    assert(g2 === Set("READ,WRITE"))
  }

  test("getBucketAcl: precedence chain, GROUP and bare READ dropped") {
    val acls = Seq(
      ("v", "b", "alice", "USER", "ALL"),
      ("v", "b", "bob", "USER", "READ,WRITE_ACL"),   // WRITE_ACP wins
      ("v", "b", "carol", "USER", "CREATE,DELETE,WRITE"),
      ("v", "b", "dan", "USER", "LIST,READ"),
      ("v", "b", "eve", "USER", "READ"),             // unmappable: drop
      ("v", "b", "world", "GROUP", "LIST,READ"))     // non-USER: drop
      .toDF("volume", "bucket", "name", "type", "rights")
    val got = S3Ops.getBucketAcl(acls)
      .as[(String, String, String, String)].collect()
      .map(r => r._3 -> r._4).toMap
    assert(got === Map("alice" -> "FULL_CONTROL", "bob" -> "WRITE_ACP",
      "carol" -> "WRITE", "dan" -> "READ"))
  }

  test("uploadPartCopy: header parse, range, preconditions, probe order") {
    val d = "/root/testdata/sf0.001"
    val T = graft.core.Tables
    val got = graft.operators.S3Ops.uploadPartCopy(
      T.copyPartRequests(spark, d), T.copyPartSources(spark, d),
      T.mpuCompleteStore(spark, d), T.buckets(spark, d))
      .select("req_id", "decision", "copied_length")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("COPIED", 1000L)))   // full source size
    assert(got(2L) === (("COPIED", 100L)))    // ranged
    assert(got(3L)._1 === "INVALID_ARGUMENT") // no bucket/key split
    assert(got(4L) === (("COPIED", 1000L)))   // leading slash stripped
    assert(got(5L) === (("COPIED", 500L)))    // %20 decodes
    assert(got(6L)._1 === "NO_SUCH_BUCKET")
    assert(got(7L)._1 === "NO_SUCH_KEY")
    assert(got(8L)._1 === "INVALID_ARGUMENT") // open-ended range
    assert(got(9L)._1 === "INVALID_RANGE")    // start > end
    assert(got(10L)._1 === "INVALID_RANGE")   // end == size
    assert(got(11L)._1 === "PRECOND_FAILED")  // modified-since after mtime
    assert(got(12L)._1 === "PRECOND_FAILED")  // unmodified-since before
    assert(got(13L)._1 === "COPIED")          // future date ignored
    // the unknown upload fails only AFTER source validation
    assert(got(14L)._1 === "NO_SUCH_UPLOAD")
    // the target bucket probe beats the malformed header
    assert(got(15L)._1 === "NO_SUCH_BUCKET")
    assert(got(16L) === (("COPIED", 1000L)))  // end == size-1 boundary
  }

  test("iceberg rewritePathCopyPlan: incremental scope + staging split") {
    val d = "/root/testdata/sf0.001"
    val T = graft.core.Tables
    def plan(start: Long, end: Long) =
      graft.operators.IcebergOps.rewritePathCopyPlan(
        T.icebergVersions(spark, d), T.icebergSnapshots(spark, d),
        T.icebergManifests(spark, d), T.icebergDataFiles(spark, d),
        T.icebergStats(spark, d), start, end, T.IcebergSrc,
        "o3://vol9/backup/wh/", "o3://vol0/bucket0/staging/")
    val inc = plan(2L, 4L)
      .select("file_type", "path", "copy_src", "dst_path")
      .as[(String, String, String, String)].collect()
    val byType = inc.groupBy(_._1).view.mapValues(_.length).toMap
    // versions 3,4; stats v4; snapshots 104..107 → 4 lists, 8 manifests
    assert(byType("VERSION_FILE") === 2 && byType("STATS_FILE") === 1)
    assert(byType("MANIFEST_LIST") === 4 && byType("MANIFEST") === 8)
    // half the inventory (snapshots 104..107 of 100..107)
    val nData = T.icebergDataFiles(spark, d).count()
    assert(math.abs(byType("DATA_FILE") - nData / 2) < nData / 5)
    // metadata-bearing types copy FROM staging; data/stats verbatim
    inc.foreach { case (t, p, src, dst) =>
      assert(dst.startsWith("o3://vol9/backup/wh/"))
      if (t == "DATA_FILE" || t == "STATS_FILE") assert(src === p)
      else assert(src.startsWith("o3://vol0/bucket0/staging/"))
    }
    // the full rewrite (no start) covers the whole inventory
    assert(plan(0L, 5L).filter(
      org.apache.spark.sql.functions.col("file_type") === "DATA_FILE")
      .count() === nData)
    // prefix equality refused, as in validateInputs
    intercept[IllegalArgumentException] {
      graft.operators.IcebergOps.rewritePathCopyPlan(
        T.icebergVersions(spark, d), T.icebergSnapshots(spark, d),
        T.icebergManifests(spark, d), T.icebergDataFiles(spark, d),
        T.icebergStats(spark, d), 0L, 5L, T.IcebergSrc, T.IcebergSrc,
        "o3://vol0/bucket0/staging/")
    }
  }

  test("signedChunksVerify: graft_hmac chain matches the javax signer") {
    val d = "/root/testdata/sf0.001"
    val T = graft.core.Tables
    val got = graft.operators.S3Ops.signedChunksVerify(
      T.chunkedUploads(spark, d))
      .collect().map(r => r.getAs[Long]("upload_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("bad_index"))).toMap
    // classes cycle with doc_id % 4 over the %23 sample
    assert(got(0L) === (("VALID", -1L)))
    assert(got(23L) === (("MISSING_FINAL_CHUNK", -1L)))
    assert(got(46L) === (("SIZE_MISMATCH", 0L)))
    assert(got(69L)._1 === "BAD_CHUNK_SIG")
    // every corruption class present, and nothing leaks into VALID:
    // the chain must reproduce the independent signer bit-for-bit
    assert(got.values.map(_._1).toSet === Set("VALID",
      "MISSING_FINAL_CHUNK", "SIZE_MISMATCH", "BAD_CHUNK_SIG"))
  }
}
