package graft

import graft.core.Tables
import graft.operators.{CommitLog, Reclaim}
import org.apache.spark.sql.DataFrame

/** ReclaimableKeyFilter semantics: a deleted key is reclaimable iff absent
  * from the previous snapshot in the chain (objectID + location identity);
  * retained keys absent from the prev-prev snapshot charge the previous
  * snapshot's exclusive size. */
class ReclaimSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def state(rows: (String, String, String, Long, Long)*): DataFrame =
    rows.toDF("volume", "bucket", "key", "object_id", "data_size")

  test("decision branches: absent / shared / exclusive / chain-head") {
    val deleted = state(
      ("v", "b", "gone", 1L, 10L),      // in neither prev state
      ("v", "b", "shared", 2L, 20L),    // in prev AND prev-prev
      ("v", "b", "only-prev", 3L, 30L), // in prev only → exclusive
      ("v", "b", "moved", 4L, 40L),     // in prev under same name, new size
      ("v", "b", "stolen", 5L, 50L))    // name in prev, different object
    val prev = state(
      ("v", "b", "shared", 2L, 20L),
      ("v", "b", "only-prev", 3L, 30L),
      ("v", "b", "moved", 4L, 41L),
      ("v", "b", "stolen", 99L, 50L))
    val prevPrev = state(
      ("v", "b", "shared", 2L, 20L),
      // same name but an older generation: must NOT count as shared
      ("v", "b", "only-prev", 3L, 31L))
    val got = Reclaim
      .reclaimDecisions(deleted, Some(prev), "sPrev", Some(prevPrev))
      .orderBy("key")
      .select("key", "reclaimable", "exclusive_to")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("gone", true, null),
      ("moved", true, null),   // size change = block reallocation
      ("only-prev", false, "sPrev"),
      ("shared", false, null),
      ("stolen", true, null))) // objectID mismatch = different key
    // chain head: no previous snapshot → everything reclaimable
    val head = Reclaim.reclaimDecisions(deleted, None, "none", None)
    assert(head.filter(!head("reclaimable")).isEmpty)
  }

  test("declared query agrees with first-principles recompute") {
    val o = Tables.objects(spark, sf)
    val got = Reclaim.snapshotReclaim(spark, o, sf)
    // recompute chain states directly from the log (no warehouse)
    val log = CommitLog.synthesizeLog(o)
    val s1 = CommitLog.applyAt(log, 1L)
    val s2 = CommitLog.applyAt(log, 4L)
    val expSnap = Reclaim.reclaimDecisions(
      log.filter($"op" === "DELETE")
        .select("volume", "bucket", "key", "object_id", "data_size"),
      Some(s1), "s1", None)
    val expAos = Reclaim.reclaimDecisions(
      Reclaim.aosDeletedEntries(o), Some(s2), "s2", Some(s1))
    assert(got.count() === expSnap.count() + expAos.count())
    assert(rows(got.filter($"owner" === "s2")
      .drop("owner").orderBy("volume", "bucket", "key", "data_size")) ===
      rows(expSnap.orderBy("volume", "bucket", "key", "data_size")))
    assert(rows(got.filter($"owner" === "AOS")
      .drop("owner").orderBy("volume", "bucket", "key", "data_size")) ===
      rows(expAos.orderBy("volume", "bucket", "key", "data_size")))
  }

  test("AOS band decisions follow the version structure") {
    val o = Tables.objects(spark, sf)
    val aos = Reclaim.snapshotReclaim(spark, o, sf)
      .filter($"owner" === "AOS").cache()
    try {
      // v=4 keys were deleted before s2 → reclaimable; v=1 shared with
      // both snapshots → retained free; v=3 overwritten → exclusive to s2
      val byDecision = aos
        .groupBy("reclaimable", "exclusive_to").count()
        .collect().map(r => (r.getBoolean(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(byDecision.keySet === Set(
        (true, null), (false, null), (false, "s2")))
      // the three version classes are near-equal population slices
      val n = byDecision.values.sum
      byDecision.values.foreach(v =>
        assert(v > n / 5, s"unbalanced decision classes: $byDecision"))
    } finally aos.unpersist()
  }

  test("dir reclaim: referenced iff a cut-alive key sits under the dir") {
    val deleted = Seq(
      ("v", "b", "a/b", 1L), ("v", "b", "a", 2L), ("v", "b", "z", 3L))
      .toDF("volume", "bucket", "dir", "deleted_ms")
    val prevObjects = Seq(
      ("v", "b", "a/b/f.dat"), // references a AND a/b
      ("v", "b", "top.dat"))   // roots reference nothing
      .toDF("volume", "bucket", "key")
    val got = Reclaim.reclaimDirs(deleted, prevObjects)
      .select("dir", "reclaimable").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(got === Seq("a" -> false, "a/b" -> false, "z" -> true))
    // chain head: no previous snapshot → every deleted dir reclaimable
    assert(Reclaim.dirReclaimDecisions(deleted, None)
      .filter(!$"reclaimable").isEmpty)
  }

  test("declared dir reclaim splits the deleted set both ways") {
    val dd = Tables.deletedDirs(spark, sf)
    val got = Reclaim.reclaimDirs(dd,
      Tables.objectsMixed(spark, sf)
        .filter($"creation_time" <= Tables.SnapCut1Ms)).cache()
    try {
      assert(got.count() === dd.count())
      val n = got.filter($"reclaimable").count()
      assert(n > 0 && n < dd.count(),
        s"expected both outcomes, got $n/${dd.count()} reclaimable")
    } finally got.unpersist()
  }

  test("rename entries: retained in the snapshot owner, reclaimable in AOS") {
    val o = Tables.objects(spark, sf)
    val got = Reclaim.renameEntryReclaim(spark, o, sf).cache()
    try {
      assert(got.count() > 0)
      // s2's frozen table probes s1 where every pre-rename name still
      // resolves; the active store probes s2 where the rename applied
      assert(got.filter($"owner" === "s2" && $"reclaimable").isEmpty)
      assert(got.filter($"owner" === "AOS" && !$"reclaimable").isEmpty)
      val halves = got.groupBy("owner").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(halves("s2") === halves("AOS"))
    } finally got.unpersist()
  }

  test("purge plan: key-ordered cap, per-bucket sums match the slice") {
    val o = Tables.objects(spark, sf)
    val recl = Reclaim.snapshotReclaim(spark, o, sf)
      .filter($"reclaimable")
    val total = recl.count()
    // uncapped: every reclaimable key is purged
    val full = Reclaim.purgePlan(spark, o, sf, keyLimit = total.toInt + 10)
    assert(full.agg(org.apache.spark.sql.functions.sum("purged_namespace"))
      .head.getLong(0) === total)
    // capped at 7: exactly the first 7 keys in (owner, v, b, key, size)
    // order contribute
    val sliceBytes = recl
      .orderBy("owner", "volume", "bucket", "key", "data_size")
      .limit(7).agg(org.apache.spark.sql.functions.sum("data_size"))
      .head.getLong(0)
    val capped = Reclaim.purgePlan(spark, o, sf, keyLimit = 7)
    assert(capped.agg(org.apache.spark.sql.functions.sum("purged_namespace"))
      .head.getLong(0) === 7L)
    assert(capped.agg(org.apache.spark.sql.functions.sum("purged_bytes"))
      .head.getLong(0) === sliceBytes)
  }

  test("exclusive rollup sums exactly the exclusive_to rows") {
    val o = Tables.objects(spark, sf)
    val dec = Reclaim.snapshotReclaim(spark, o, sf)
    val viaQuery = rows(Reclaim.snapshotExclusive(spark, o, sf))
    val direct = rows(dec.filter($"exclusive_to".isNotNull)
      .groupBy($"exclusive_to".as("snapshot"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_exclusive"),
        org.apache.spark.sql.functions.sum("data_size").cast("long")
          .as("exclusive_bytes"))
      .orderBy("snapshot"))
    assert(viaQuery === direct)
    assert(viaQuery.map(_.head) === Seq("s1", "s2"))
  }

  test("trashCheckpointRotation: expiry cutoff, Current rename, strays") {
    val got = graft.operators.Reclaim.trashCheckpointRotation(
      graft.core.Tables.trashEntries(spark, sf),
      nowMs = 1755172800000L, deletionIntervalMs = 2592000000L)
      .as[(String, String, String, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val r1 = "/vol0/bucket0/.Trash/clerk1"
    // Current rotates into the now-stamped checkpoint name
    assert(got((r1, "Current")) === (("CHECKPOINTED", "250814120000")))
    assert(got((r1, "240101120000"))._1 === "DELETED")
    // inside the 30-day window → kept
    assert(got((r1, "250801120000"))._1 === "KEPT")
    // a collision-suffixed checkpoint parses through the -N suffix
    assert(got((r1, "240615063000-1"))._1 === "DELETED")
    assert(got((r1, "stray-dir"))._1 === "IGNORED_UNPARSEABLE")
    // a root with no Current still expires its checkpoints
    assert(got(("/vol1/bucket3/.Trash/clerk2", "250601000000"))._1 ===
      "DELETED")
    assert(got(("/vol2/bucket5/.Trash/clerk3", "Current"))._1 ===
      "CHECKPOINTED")
  }

  test("snapshotDefragPlan: budget walk, modes, versions, cleanup") {
    val chain = graft.core.Tables.defragChain(spark, sf)
    val got = graft.operators.Reclaim.snapshotDefragPlan(chain)
      .collect().map(r => r.getAs[String]("name") ->
        ((r.getAs[String]("action"), r.getAs[String]("checkpoint_source"),
          r.getAs[Long]("tables_compacted"), r.getAs[Long]("new_version"),
          r.getAs[Long]("cleanup_below")))).toMap
    // first in its path chain: FULL defrag checkpoints ITSELF,
    // compacts the 3 tracked column families, bumps to version 1
    assert(got("d1") === (("FULL_DEFRAG", "d1", 3L, 1L, -1L)))
    // already defragged, version 2: stale checkpoint dirs <= 1 cleaned,
    // budget untouched
    assert(got("d2") === (("SKIP_DEFRAGGED", "", 0L, 2L, 1L)))
    // already defragged at version 0: nothing to clean
    assert(got("d3") === (("SKIP_DEFRAGGED", "", 0L, 0L, -1L)))
    // second budget slot: INCREMENTAL against the path predecessor
    assert(got("d4") === (("INCREMENTAL_DEFRAG", "d2", 0L, 2L, 0L)))
    // budget spent: the walk stops, later entries untouched
    assert(got("d5")._1 === "NOT_REACHED")
    assert(got("d6")._1 === "NOT_REACHED")
    // native lib missing: the whole run refuses
    val off = graft.operators.Reclaim
      .snapshotDefragPlan(chain, nativeAvailable = false)
      .select("action").distinct().collect().map(_.getString(0)).toSeq
    assert(off === Seq("SKIPPED_NATIVE"))
  }
}
