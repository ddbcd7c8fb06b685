package graft

import org.apache.spark.sql.functions._
import graft.operators.{Conditional, FilterDsl}
import graft.operators.Conditional.ReadConds

/** RFC 7232 precedence matrix + filter-DSL compilation. */
class ConditionalFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val obj = Seq(("v", "b", "k1", "etag1", 100L))
    .toDF("volume", "bucket", "key", "etag", "modification_time")

  private def statusOf(conds: ReadConds): String =
    Conditional.conditionalRead(obj, conds)
      .select("status").as[String].head()

  test("no conditions → 200") {
    assert(statusOf(ReadConds()) === "200")
  }
  test("If-Match mismatch → 412; match → falls through") {
    assert(statusOf(ReadConds(ifMatch = Some("other"))) === "412")
    assert(statusOf(ReadConds(ifMatch = Some("etag1"))) === "200")
  }
  test("If-Unmodified-Since: modified later → 412") {
    assert(statusOf(ReadConds(ifUnmodifiedSince = Some(50L))) === "412")
    assert(statusOf(ReadConds(ifUnmodifiedSince = Some(100L))) === "200")
  }
  test("If-None-Match match → 304") {
    assert(statusOf(ReadConds(ifNoneMatch = Some("etag1"))) === "304")
    assert(statusOf(ReadConds(ifNoneMatch = Some("x"))) === "200")
  }
  test("If-Modified-Since: not modified since → 304") {
    assert(statusOf(ReadConds(ifModifiedSince = Some(100L))) === "304")
    assert(statusOf(ReadConds(ifModifiedSince = Some(99L))) === "200")
  }
  test("precedence: failing If-Match beats matching If-None-Match") {
    assert(statusOf(ReadConds(ifMatch = Some("other"),
      ifNoneMatch = Some("etag1"))) === "412")
  }
  test("RFC ignore rule: If-Unmodified-Since is ignored when If-Match present") {
    // IUS alone would 412 (modified at 100 > 50); passing If-Match masks it
    assert(statusOf(ReadConds(ifMatch = Some("etag1"),
      ifUnmodifiedSince = Some(50L))) === "200")
  }
  test("RFC ignore rule: If-Modified-Since is ignored when If-None-Match present") {
    // IMS alone would 304 (not modified since 100); non-matching INM → 200
    assert(statusOf(ReadConds(ifNoneMatch = Some("x"),
      ifModifiedSince = Some(100L))) === "200")
  }

  private lazy val rows4 = Seq(
    ("a", 10L, "x/1"), ("b", 20L, "x/2"), ("c", 30L, "y/1"))
    .toDF("tag", "size", "path")

  test("filter DSL compiles equals/lesser/greater/regex conjunctions") {
    assert(FilterDsl.scan(rows4, "tag:equals:a").count() === 1)
    assert(FilterDsl.scan(rows4, "size:greater:15").count() === 2)
    assert(FilterDsl.scan(rows4, "size:lesser:30,path:regex:^x/").count() === 2)
    assert(FilterDsl.scan(rows4, "size:greater:15,path:regex:^x/").count() === 1)
  }

  test("filter DSL values containing colons survive the 3-way split") {
    val df = Seq(("k", "a:b:c")).toDF("k", "v")
    assert(FilterDsl.scan(df, "v:equals:a:b:c").count() === 1)
  }

  test("filter DSL regex values containing commas are not torn apart") {
    assert(FilterDsl.scan(rows4, "path:regex:^x/[0-9]{1,2}$").count() === 2)
    assert(FilterDsl.scan(rows4, "path:regex:^(x|y)/[0-9]{1,2}$,tag:equals:a")
      .count() === 1)
  }

  test("filter DSL rejects unknown ops") {
    intercept[IllegalArgumentException] {
      FilterDsl.compile("a:like:b")
    }
  }

  test("lease recovery: force overrides the soft limit, precedence holds") {
    val sf = "/root/testdata/sf0.001"
    val objects = graft.core.Tables.objects(spark, sf)
    val out = graft.operators.Lifecycle.recoverLeases(objects)
    val byKey = out.collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    // derive per-request expectations from first principles over the raw
    // object rows (version 5 = hsync-open; f = orderkey drives the flags)
    val raw = objects.filter(col("version") === 5)
      .select("key", "object_id", "data_size").distinct().collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val f = r.getAs[Long]("object_id") / 10
      val expect =
        if (f % 4 == 0) "OPEN_KEY_DELETED"
        else if (f % 4 == 1) "ALREADY_UNDER_RECOVERY"
        else if (f % 4 == 2 && f % 16 != 2 && f % 7200000 < 3600000)
          "UNDER_SOFT_LIMIT"
        else "RECOVERED"
      val got = byKey(r.getAs[String]("key"))
      assert(got.getAs[String]("decision") === expect, r.getAs[String]("key"))
      // only recovered leases finalize blocks
      assert((got.getAs[Long]("n_blocks") > 0) === (expect == "RECOVERED"))
    }
    // ghost and closed request classes are present and decided correctly
    val decisions = out.collect().map(_.getAs[String]("decision")).toSet
    assert(decisions.contains("KEY_NOT_FOUND"))
    assert(decisions.contains("KEY_ALREADY_CLOSED"))
  }

  test("conditionalWrites: parse errors first, create-if-absent, IM lists") {
    val d = "/root/testdata/sf0.001"
    val T = graft.core.Tables
    val got = graft.operators.Conditional.conditionalWrites(
      T.conditionalWriteRequests(spark, d), T.objects(spark, d))
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) === "INVALID_EMPTY_INM")
    assert(got(2L) === "INVALID_EMPTY_IM")
    assert(got(3L) === "INVALID_BOTH")
    // only If-None-Match: * is supported for conditional put
    assert(got(4L) === "INVALID_INM_NOT_STAR")
    // create-if-absent: existing target refuses, ghost target writes
    assert(got(5L) === "PRECONDITION_FAILED")
    assert(got(6L) === "WRITTEN")
    // quoted / comma-list / star candidates all match the current ETag
    assert(got(7L) === "WRITTEN" && got(8L) === "WRITTEN" &&
      got(9L) === "WRITTEN")
    assert(got(10L) === "PRECONDITION_FAILED")
    // If-Match against a MISSING key matches nothing — 412, not created
    assert(got(11L) === "PRECONDITION_FAILED")
    assert(got(12L) === "WRITTEN")
    assert(got(13L) === "DELETED" && got(16L) === "DELETED")
    assert(got(14L) === "PRECONDITION_FAILED")
    assert(got(15L) === "INVALID_EMPTY_IM")
    // parseDeleteCondition reads only If-Match: a DELETE carrying
    // If-None-Match (star or blank) silently ignores it
    assert(got(17L) === "DELETED")
    assert(got(18L) === "DELETED")
  }
}
