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
}
