package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.CompactionDag

/** Compaction-DAG SST diff walk (rocksdb-checkpoint-differ semantics):
  * every terminal branch of the reference's internalGetSSTDiffList must
  * fire on the synthesized history — membership SAME, multi-level expand
  * to SAME, never-compacted DIFFERENT, generation-cutoff DIFFERENT,
  * no-successor DIFFERENT — and interior (fully decomposed) nodes must
  * not be emitted at all. */
class CompactionDagSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val cls: Map[String, String] = CompactionDag.sstDiff(
      Tables.sstLive(spark, sf, 6300), Tables.sstLive(spark, sf, 3500),
      Tables.sstEdges(spark, sf), destGen = 3500,
      lo = "000600", hi = "001200")
    .as[(String, String)].collect().toMap

  test("walk emits the expected SAME / DIFFERENT partition sizes") {
    // SAME: l1-150 (only L1 surviving the range prune in dest) + reached
    // L0 f604..f999 + direct-membership f1000..f1166 + s-same = 565;
    // DIFFERENT: boundary l1-148/149 (gen cutoff), f1167..f1199 (never
    // compacted, newer than dest), s-old-in (cutoff), s-mid (no successor).
    assert(cls.count(_._2 == "SAME") === 565)
    assert(cls.count(_._2 == "DIFFERENT") === 37)
  }

  test("membership and expansion reach SAME files") {
    assert(cls("l1-150") === "SAME")   // direct membership in dest
    assert(cls("f604") === "SAME")     // reached via l2 -> l1-151 -> f604
    assert(cls("f999") === "SAME")     // reached via src-live l1-249
    assert(cls("f1000") === "SAME")    // src ∩ dest membership
    assert(cls("s-same") === "SAME")
  }

  test("terminal branches classify DIFFERENT") {
    assert(cls("f1167") === "DIFFERENT")  // never in the compaction log
    assert(cls("f1199") === "DIFFERENT")
    // node generation 3480/3490 predates destGen 3500 and the range-pruned
    // dest map cannot claim them — the reference's cutoff branch
    assert(cls("l1-148") === "DIFFERENT")
    assert(cls("l1-149") === "DIFFERENT")
    assert(cls("s-old-in") === "DIFFERENT") // gen 100 < 3500
    assert(cls("s-mid") === "DIFFERENT")    // in log, never an output
  }

  test("interior and unreached files are not emitted") {
    // fully decomposed into inputs -> not in either result map
    for (f <- Seq("l2-40", "l1-151", "l1-200", "s-tip", "s-old-out"))
      assert(!cls.contains(f), f)
    // dest-only / range-pruned / consumed files never reached
    for (f <- Seq("f600", "f100", "l2-0", "s-ancient"))
      assert(!cls.contains(f), f)
  }

  test("a cyclic/over-deep log fails the traversal guard, not spins") {
    // 40-node chain exceeds MaxWalkDepth=32 distinct levels
    val chain = (0 until 40).map(i => (s"n$i", s"n${i + 1}", 100L))
      .toDF("output_file", "input_file", "seq")
    val src = Seq(("n0", "a", "a")).toDF("file", "start_key", "end_key")
    val dest = src.filter(lit(false))
    val e = intercept[IllegalStateException] {
      CompactionDag.sstDiff(src, dest, chain, 50, "a", "z").count()
    }
    assert(e.getMessage.contains("compaction-DAG"))
  }

  test("visited guard terminates on a 2-cycle without the depth guard") {
    val cyc = Seq(("a", "b", 100L), ("b", "a", 100L))
      .toDF("output_file", "input_file", "seq")
    val src = Seq(("a", "a", "a")).toDF("file", "start_key", "end_key")
    val dest = src.filter(lit(false))
    val out = CompactionDag.sstDiff(src, dest, cyc, 50, "a", "z")
      .as[(String, String)].collect().toMap
    // both nodes expand into each other; neither is terminal -> empty
    assert(out.isEmpty)
  }

  test("sst bucket prune: prefix window + last-level rule per decision") {
    val files = Seq(
      // inside bucket b1 only
      ("f-in", 3, "/v/b1/a", "/v/b1/z", 10L),
      // straddles b1|b2 boundary: kept for both
      ("f-span", 3, "/v/b1/x", "/v/b2/c", 10L),
      // inside b2, level 0: out-of-range for b1 but never pruned
      ("f-l0", 0, "/v/b2/d", "/v/b2/m", 10L))
      .toDF("file", "level", "smallest_key", "largest_key", "n_keys")
    val buckets = Seq(("v", "b1"), ("v", "b2")).toDF("volume", "bucket")
    val got = CompactionDag.sstBucketPrune(files, buckets).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    // b1: f-in + f-span in range, f-l0 saved by level; nothing pruned
    // b2: f-span + f-l0 in range, f-in prunable (10 keys shed)
    assert(got === Seq(
      ("b1", 3L, 0L, 2L, 1L, 0L),
      ("b2", 3L, 1L, 2L, 0L, 10L)))
  }

  test("declared sst filter: every bucket sheds most of the namespace") {
    val got = CompactionDag.sstBucketPrune(
      Tables.sstNamespaceFiles(spark, sf), Tables.buckets(spark, sf))
      .cache()
    try {
      val n = Tables.sstNamespaceFiles(spark, sf).count()
      assert(got.count() === 40)
      // per bucket the decision classes partition the file set
      assert(got.filter(
        col("n_pruned") + col("n_kept_range") + col("n_kept_level")
          =!= col("n_files")).isEmpty)
      assert(got.filter(col("n_files") =!= n).isEmpty)
      // a bucket holds ~1/40 of the namespace: pruning must dominate
      val worstKept = got.select(
        max(col("n_kept_range") + col("n_kept_level"))).head.getLong(0)
      assert(worstKept < n / 2, s"pruning too weak: kept $worstKept of $n")
    } finally got.unpersist()
  }

  test("snapdiffSourceSelect: gates pick the source; sizes tie to the" +
    " sstDiff walk") {
    val diffN = CompactionDag.sstDiff(
      Tables.sstLive(spark, sf, 6300), Tables.sstLive(spark, sf, 3500),
      Tables.sstEdges(spark, sf), 3500, "000600", "001200")
      .filter(col("cls") === "DIFFERENT").count()
    val fullN = CompactionDag.pruneByRange(
      Tables.sstLive(spark, sf, 6300), "000600", "001200").count()
    val fromN = CompactionDag.pruneByRange(
      Tables.sstLive(spark, sf, 3500), "000600", "001200").count()
    val got = CompactionDag.snapdiffSourceSelect(
      Tables.sstLive(spark, sf, 6300), Tables.sstLive(spark, sf, 3500),
      Tables.sstEdges(spark, sf), 3500, "000600", "001200")
      .collect().map(r => r.getAs[Long]("job_id") ->
        ((r.getAs[String]("delta_source"), r.getAs[String]("read_mode"),
          r.getAs[Long]("n_delta_files"),
          r.getAs[Long]("n_from_files_added")))).toMap
    // default flags: DAG walk, tombstone-aware stream, no extra files
    assert(got(1L) ===
      (("SST_FILE_DELTA_DAG_WALK", "KEY_STREAM_WITH_TOMBSTONE", diffN, 0L)))
    // request/config force-full-diff read the full TO set
    assert(got(2L)._1 === "SST_FILE_DELTA_FULL_DIFF" && got(2L)._3 === fullN)
    assert(got(3L)._1 === "SST_FILE_DELTA_FULL_DIFF")
    // native libs absent: DAG walk still runs, but plain key stream +
    // the FROM snapshot's files are added (tombstone workaround)
    assert(got(4L) ===
      (("SST_FILE_DELTA_DAG_WALK", "KEY_STREAM", diffN, fromN)))
    assert(got(5L)._2 === "KEY_STREAM" && got(5L)._4 === fromN)
    // differ failure falls back to full diff, read mode unaffected
    assert(got(6L) ===
      (("SST_FILE_DELTA_FULL_DIFF", "KEY_STREAM_WITH_TOMBSTONE", fullN, 0L)))
    assert(got(7L)._1 === "SST_FILE_DELTA_FULL_DIFF" && got(7L)._2 === "KEY_STREAM")
    assert(got(8L) ===
      (("SST_FILE_DELTA_FULL_DIFF", "KEY_STREAM", fullN, fromN)))
  }
}
