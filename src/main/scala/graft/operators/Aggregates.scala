package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Recon-style analytics aggregations (apache/ozone recon module):
 * log₂-binned histograms (FileSizeCountTaskHelper.java:51-77,
 * ReconConstants.java:82-99), du / NSSummary hierarchical rollups
 * (NSSummaryTaskDbEventHandler.java:128-459, BucketEntityHandler.java:91-145),
 * global table counts (OmTableInsightTask.java), quota usage
 * (NSSummaryEndpoint.java:141-169), heatmap (HeatMapUtil.java:60-130).
 *
 * Scale design: all are single-shuffle groupBy aggregates with map-side
 * partial aggregation; the NSSummary rollup replaces the reference's
 * driver-side recursive `propagateSizeUpwards` with an explode over the
 * (bounded-depth) prefix array — one shuffle, no driver loops, no iteration.
 * Normalization uses integer scaling (x*10000 div range) — deterministic
 * across engines, no float rounding.
 */
object Aggregates {

  /** Log₂ size bin upper bound: 41 bins, 1 KB → 1 PB
    * (ref ReconUtils.getFileSizeUpperBound, ReconConstants.java:82-89).
    * Pure integer arithmetic: ceil(log2 x) = bit-length of (x-1), taken as
    * length(bin(x-1)) — float log2 is an ln-ratio whose rounding lands
    * fractionally above the integer for some exact powers of two (JVM
    * log2(2^29) = 29.000000000000004), so a float path is off-by-one-bin
    * on exactly the bin boundaries. */
  def pow2Bin(sizeCol: String, minBin: Long): Column =
    expr(s"greatest(shiftleft(CAST(1 AS BIGINT), " +
      s"CASE WHEN $sizeCol <= 1 THEN 0 ELSE length(bin($sizeCol - 1)) END), ${minBin}L)")

  /** Keys deeper than this are assumed hostile/corrupt (the reference caps
    * path depth via ozone.om.max.path.depth far below it); the cap only
    * bounds the per-row explode, it is never what decides rollup depth —
    * and the oracle SQL mirrors the SAME cap, so a beyond-cap input would
    * fail loudly at the gate rather than silently diverge. */
  val MaxAncestorDepth = 64

  /** Immediate parent directory of a slash-delimited path (empty for a
    * 1-segment path) — shared by the rollups and the FSO table builds so
    * the batch/streamed/namespace derivations can never drift. */
  def parentDirOf(pathCol: String): Column =
    expr(s"substring($pathCol, 1, length($pathCol) - " +
      s"length(element_at(split($pathCol, '/'), -1)) - 1)")

  /** Every prefix of a DIRECTORY path INCLUDING the path itself — the
    * ancestor set a leaf-dir aggregate propagates to. Depth derives
    * per-row from the path (capped at [[MaxAncestorDepth]]), so a
    * namespace deeper than any fixture never silently loses ancestors —
    * the dual of the reference's propagate-to-every-ancestor
    * (NSSummaryTaskDbEventHandler.propagateSizeUpwards:426-459). */
  def dirAndAncestors(dirCol: String): Column =
    expr(s"""transform(
      sequence(1, least(size(split($dirCol, '/')), $MaxAncestorDepth)),
      d -> array_join(slice(split($dirCol, '/'), 1, d), '/'))""")

  /** File-size histogram per (volume, bucket, bin) — ref
    * FileSizeCountTaskHelper.java:51-77. */
  def fileSizeHistogram(objects: DataFrame): DataFrame =
    objects
      .withColumn("size_bin", pow2Bin("data_size", 1024L))
      .groupBy("volume", "bucket", "size_bin")
      .agg(count(lit(1)).as("file_count"))
      .orderBy("volume", "bucket", "size_bin")

  /** Container-size histogram (14 bins from 512 MB — ref
    * ReconConstants.java:91-99; synthetic containers are smaller so the
    * min bin is 1 MB here). */
  def containerSizeHistogram(containersScm: DataFrame): DataFrame =
    containersScm
      .withColumn("size_bin", pow2Bin("used_bytes", 1048576L))
      .groupBy("size_bin")
      .agg(count(lit(1)).as("container_count"))
      .orderBy("size_bin")

  /**
   * NSSummary hierarchical rollup: per-directory (at every ancestor level)
   * file count, total size, replicated size — batch equivalent of the
   * reference's incremental upward propagation
   * (NSSummaryTaskDbEventHandler.propagateSizeUpwards:426-459).
   * Keys are `a/b/c/file` paths; each file contributes to ancestors
   * `a`, `a/b`, `a/b/c` — depth comes from each key, never a config.
   *
   * TWO-STAGE shape: files first aggregate to their immediate parent dir
   * (one shuffle over |files| NARROW rows), then only the (far fewer)
   * distinct leaf dirs explode their ancestor chains and re-aggregate.
   * Exploding per FILE would shuffle |files| × avg-depth rows keyed by
   * path strings — at 100 TB that explode is the dominant shuffle; per-dir
   * it is ~|dirs| × depth, orders of magnitude smaller.
   */
  def nsSummary(objects: DataFrame): DataFrame = {
    objects
      // one split per key (parentDirOf+dirAndAncestors would re-split 3×)
      .withColumn("segs",
        expr("slice(split(key, '/'), 1, size(split(key, '/')) - 1)"))
      .filter(size(col("segs")) >= 1) // 1-segment keys have no ancestor dirs
      .groupBy(col("volume"), col("bucket"),
        array_join(col("segs"), "/").as("leaf"))
      .agg(
        count(lit(1)).as("nf"),
        sum("data_size").as("sz"),
        sum("replicated_size").as("rs"))
      .withColumn("dir", explode(dirAndAncestors("leaf")))
      .groupBy("volume", "bucket", "dir")
      .agg(
        sum("nf").as("num_files"),
        sum("sz").as("size_of_files"),
        sum("rs").as("replicated_size"))
      .orderBy("volume", "bucket", "dir")
  }

  /** One per-run-boundary-or-interior rollup row of [[nsSummarySorted]]'s
    * fold; `boundary` rows may continue in another partition and re-combine
    * in a tiny follow-up aggregate, non-boundary rows are final. */
  case class NsFoldRow(volume: String, bucket: String, dir: String,
                       nf: Long, sz: Long, rs: Long, boundary: Boolean)

  /**
   * NSSummary over KEY-SORTED input (the [[graft.core.Tables.objectsSorted]]
   * warehouse layout: partitioned by (volume, bucket), sorted by `key`
   * within each file) — the scale path. Because keys under a directory are
   * exactly the keys with that prefix, they form a CONTIGUOUS range in key
   * order; a single streaming stack fold per partition therefore computes
   * every directory's (count, size, replicated) rollup with ZERO shuffles
   * and ZERO hash maps — the Spark dual of the reference's sorted RocksDB
   * walk (NSSummaryTaskDbEventHandler.java:128-459). Only directories whose
   * range touches a partition/run boundary emit as partials (≤ 2×depth per
   * run) and re-combine in an aggregate over that tiny remainder; interior
   * directories — at 100 TB, virtually all of them — never leave their
   * scan task. vs the declarative [[nsSummary]] (two shuffles + a hash
   * aggregate keyed by millions of long path strings when leaf dirs are
   * near-unique): ~10× at the 10× scale probe, and at cluster scale it
   * turns the dominant shuffle into a map-only pass.
   *
   * Contract: rows of one (volume, bucket) must arrive key-sorted within
   * each partition (the warehouse write guarantees it — see
   * [[graft.core.Tables.objectsSorted]]). A key-order regression THROWS:
   * unsorted input would let one directory masquerade as "interior" to two
   * different runs and emit duplicate finals, so the fold fails loudly
   * rather than returning plausible wrong sums. Use [[nsSummary]] for
   * unsorted input. (volume,bucket) changes mid-partition are fine — the
   * scan packs many small files into one partition; each file switch just
   * closes the run with boundary-marked partials.
   */
  def nsSummarySorted(sortedObjects: DataFrame): DataFrame = {
    val spark = sortedObjects.sparkSession
    import spark.implicits._
    val folded = sortedObjects
      .select(col("volume").cast("string"), col("bucket").cast("string"),
        col("key"), col("data_size"), col("replicated_size"))
      .as[(String, String, String, Long, Long)]
      .mapPartitions { rows =>
        new Iterator[NsFoldRow] {
          private val out = scala.collection.mutable.Queue.empty[NsFoldRow]
          private var curV: String = null
          private var curB: String = null
          private var prevKey: String = null
          private var firstRowOfRun = true
          // parallel stacks: open dir chain of the current key
          private val paths = scala.collection.mutable.ArrayBuffer.empty[String]
          private val starts = scala.collection.mutable.ArrayBuffer.empty[Boolean]
          private val nfs = scala.collection.mutable.ArrayBuffer.empty[Long]
          private val szs = scala.collection.mutable.ArrayBuffer.empty[Long]
          private val rss = scala.collection.mutable.ArrayBuffer.empty[Long]

          private def pop(atRunEnd: Boolean): Unit = {
            val i = paths.length - 1
            out.enqueue(NsFoldRow(curV, curB, paths(i), nfs(i), szs(i), rss(i),
              boundary = starts(i) || atRunEnd))
            if (i > 0) { // a dir's totals include its subdirs'
              nfs(i - 1) += nfs(i); szs(i - 1) += szs(i); rss(i - 1) += rss(i)
            }
            paths.remove(i); starts.remove(i)
            nfs.remove(i); szs.remove(i); rss.remove(i)
          }

          private def flushRun(): Unit = {
            while (paths.nonEmpty) pop(atRunEnd = true)
            prevKey = null; firstRowOfRun = true
          }

          private def process(v: String, b: String, key: String,
                              ds: Long, rs: Long): Unit = {
            if (v != curV || b != curB) { flushRun(); curV = v; curB = b }
            else if (prevKey != null && key < prevKey)
              throw new IllegalStateException(
                s"nsSummarySorted requires key-sorted input: '$key' follows " +
                  s"'$prevKey' in ($v, $b) — use nsSummary for unsorted input")
            prevKey = key
            val segs = key.split('/')
            if (segs.length < 2) { firstRowOfRun = false; return }
            // ancestor chain paths: segs(0), segs(0)/segs(1), ... (dirs only)
            var keep = 0
            var prefixEnd = 0
            while (keep < paths.length && keep < segs.length - 1 && {
              val p = if (keep == 0) segs(0).length
                      else prefixEnd + 1 + segs(keep).length
              val same = paths(keep).length == p &&
                key.regionMatches(0, paths(keep), 0, p)
              if (same) prefixEnd = p
              same
            }) keep += 1
            while (paths.length > keep) pop(atRunEnd = false)
            var d = keep
            var path = if (keep == 0) "" else paths(keep - 1)
            while (d < segs.length - 1) {
              path = if (d == 0) segs(0) else path + "/" + segs(d)
              paths += path; starts += firstRowOfRun
              nfs += 0L; szs += 0L; rss += 0L
              d += 1
            }
            val top = paths.length - 1
            nfs(top) += 1L; szs(top) += ds; rss(top) += rs
            firstRowOfRun = false
          }

          private def advance(): Unit = {
            while (out.isEmpty && rows.hasNext) {
              val r = rows.next()
              process(r._1, r._2, r._3, r._4, r._5)
            }
            if (out.isEmpty && !rows.hasNext && paths.nonEmpty) flushRun()
          }

          def hasNext: Boolean = { if (out.isEmpty) advance(); out.nonEmpty }
          def next(): NsFoldRow = { if (!hasNext) throw new NoSuchElementException; out.dequeue() }
        }
      }.toDF()
    val finals = folded.filter(!col("boundary"))
      .select(col("volume"), col("bucket"), col("dir"),
        col("nf").as("num_files"), col("sz").as("size_of_files"),
        col("rs").as("replicated_size"))
    val combined = folded.filter(col("boundary"))
      .groupBy("volume", "bucket", "dir")
      .agg(sum("nf").as("num_files"), sum("sz").as("size_of_files"),
        sum("rs").as("replicated_size"))
    finals.unionByName(combined).orderBy("volume", "bucket", "dir")
  }

  /** du top-N: largest level-2 directories — ref BucketEntityHandler.java:91-145
    * + ReconUtils.java:534-540 (top-k). */
  def duTopN(objects: DataFrame, volume: String, n: Int): DataFrame =
    objects
      .filter(col("volume") === volume)
      .withColumn("dir", concat_ws("/", slice(split(col("key"), "/"), 1, 2)))
      .groupBy("bucket", "dir")
      .agg(sum("data_size").as("dir_size"), count(lit(1)).as("num_files"))
      .orderBy(col("dir_size").desc, col("bucket"), col("dir"))
      .limit(n)

  /** Global per-entity counts — ref OmTableInsightTask.java /
    * ClusterStateEndpoint.java:96,170-186. */
  def globalCounts(objects: DataFrame, buckets: DataFrame, volumes: DataFrame,
                   openKeys: DataFrame, containersScm: DataFrame): DataFrame = {
    def one(df: DataFrame, entity: String, sizeCol: Option[String]) =
      df.agg(
        count(lit(1)).as("cnt"),
        coalesce(sum(sizeCol.map(col).getOrElse(lit(0L))), lit(0L)).as("total_bytes"))
        .select(lit(entity).as("entity"), col("cnt"), col("total_bytes"))
    one(objects, "keys", Some("data_size"))
      .unionByName(one(buckets, "buckets", Some("used_bytes")))
      .unionByName(one(volumes, "volumes", Some("used_bytes")))
      .unionByName(one(openKeys, "open_keys", Some("data_size")))
      .unionByName(one(containersScm, "containers", Some("used_bytes")))
      .orderBy("entity")
  }

  /** Quota usage + violation flag — ref NSSummaryEndpoint.java:141-169,
    * OMKeyRequest.java:876-906 (quota check). */
  def quotaUsage(buckets: DataFrame): DataFrame =
    buckets
      .withColumn("over_quota",
        col("quota_bytes") =!= -1L && col("used_bytes") > col("quota_bytes"))
      .withColumn("usage_pct_x100",
        when(col("quota_bytes") > 0,
          expr("used_bytes * 10000 DIV quota_bytes"))
          .otherwise(lit(-1L)))
      .select("volume", "bucket", "used_bytes", "quota_bytes",
        "used_namespace", "over_quota", "usage_pct_x100")
      .orderBy("volume", "bucket")

  /**
   * Write-admission quota check — OMKeyCreateRequest.java:317-319 calling
   * OMKeyRequest.java:876-907: a create is admitted against the target
   * bucket's CURRENT usage snapshot, bytes first (rejected when
   * quota_bytes - used_bytes < allocation; the allocation is the
   * REPLICATED size, the pre-allocated space of the reference), then
   * namespace (quota_namespace < used_namespace + 1); a quota of -1
   * (QUOTA_RESET) disables its check. Request-time admission only — the
   * serial reserve-at-commit bookkeeping is the streaming counter
   * family's job, not this batch check.
   *
   * Scale shape: the bucket usage catalog broadcasts into the request
   * batch — pure per-row decision, no shuffle beyond the output sort.
   */
  def quotaEnforce(requests: DataFrame, buckets: DataFrame): DataFrame =
    requests
      .join(broadcast(buckets.select("volume", "bucket", "used_bytes",
        "used_namespace", "quota_bytes", "quota_namespace")),
        Seq("volume", "bucket"))
      .withColumn("decision",
        when(col("quota_bytes") > -1L &&
          col("quota_bytes") - col("used_bytes") < col("allocate_bytes"),
          lit("QUOTA_BYTES_EXCEEDED"))
          .when(col("quota_namespace") > -1L &&
            col("quota_namespace") < col("used_namespace") + 1,
            lit("QUOTA_NAMESPACE_EXCEEDED"))
          .otherwise(lit("ALLOWED")))
      .select("volume", "bucket", "key", "allocate_bytes", "decision")
      .orderBy("volume", "bucket", "key", "allocate_bytes")

  /**
   * Heatmap: access counts per (volume, bucket, top-level prefix) from audit
   * events, min/max-normalized at the root — ref HeatMapUtil.java:60-130
   * (tree build) and :102-111 (min/max normalization). Normalization is
   * integer-scaled: (cnt-min)*10000 div (max-min).
   */
  def heatmap(audit: DataFrame): DataFrame = {
    val counts = audit
      .filter(col("op") === "READ_KEY")
      .withColumn("prefix", concat_ws("/", slice(split(col("key"), "/"), 1, 2)))
      .groupBy("volume", "bucket", "prefix")
      .agg(count(lit(1)).as("access_count"))
    val stats = counts.agg(
      min("access_count").as("min_c"), max("access_count").as("max_c"))
    counts.crossJoin(stats)
      .withColumn("heat_x10000",
        when(col("max_c") > col("min_c"),
          expr("(access_count - min_c) * 10000 DIV (max_c - min_c)"))
          .otherwise(lit(0L)))
      .select("volume", "bucket", "prefix", "access_count", "heat_x10000")
      .orderBy("volume", "bucket", "prefix")
  }

  /**
   * Heatmap ENTITY TREE: one row per tree node across the
   * volume → volume/bucket → volume/bucket/prefix levels, each level
   * min/max-normalized among its own siblings — ref HeatMapUtil.java:60-130
   * (nested EntityMetaData tree with per-level rollups and :102-111
   * normalization). One `rollup()` pass computes every level in a single
   * shuffle; the per-level normalization is a window over the (tiny) node
   * table, never over raw events.
   */
  def heatmapTree(audit: DataFrame): DataFrame = {
    val base = audit
      .filter(col("op") === "READ_KEY")
      .withColumn("prefix", concat_ws("/", slice(split(col("key"), "/"), 1, 2)))
    // grouping_id bits (volume=4, bucket=2, prefix=1): 0 = leaf level,
    // 1 = bucket level, 3 = volume level, 7 = grand total (dropped)
    val nodes = base.rollup("volume", "bucket", "prefix")
      .agg(count(lit(1)).as("access_count"), grouping_id().as("gid"))
      .filter(col("gid") =!= 7)
      .withColumn("level",
        when(col("gid") === 0, 3).when(col("gid") === 1, 2).otherwise(1))
      .withColumn("path",
        when(col("level") === 1, col("volume"))
          .when(col("level") === 2, concat_ws("/", col("volume"), col("bucket")))
          .otherwise(concat_ws("/", col("volume"), col("bucket"), col("prefix"))))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("level")
    nodes
      .withColumn("min_c", min("access_count").over(w))
      .withColumn("max_c", max("access_count").over(w))
      .withColumn("heat_x10000",
        when(col("max_c") > col("min_c"),
          expr("(access_count - min_c) * 10000 DIV (max_c - min_c)"))
          .otherwise(lit(0L)))
      .select("level", "path", "access_count", "heat_x10000")
      .orderBy("level", "path")
  }

  /**
   * Skew-safe two-stage aggregation (salting): stage 1 groups on
   * (keys, salt) so a heavy-hitter key's rows split across `numSalts`
   * reducers; stage 2 combines the partials. Use when ONE key dominates a
   * reduce partition (hash partial aggregation alone doesn't help if the
   * final reduce of a single key exceeds one executor). Salt derives from
   * the physical partition id — correctness never depends on its value.
   */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     numSalts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(numSalts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"total_$valueCol"), sum("__pcnt").as("cnt"))

  /** Pluggable heatmap source — ref recon/.../heatmap/IHeatMapProvider.java
    * (providers feed access events from different backends; here any
    * implementation yields the DataFrame [[heatmap]] consumes). */
  trait HeatmapProvider {
    def accessEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame
  }

  /** Default provider: the audit-log synthesis (HeatMapUtil's audit source). */
  object AuditHeatmapProvider extends HeatmapProvider {
    def accessEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
      graft.core.Tables.auditAccess(spark, dir)
  }

  /** Cluster-growth-style daily time series from the events table — ref
    * UtilizationSchemaDefinition.java:75-88 (cluster_growth_daily). Value
    * sums use integer cents (floor(value*100)) for cross-engine parity;
    * `ts_ms` comes pre-derived from the INT64-nanos column (Tables.events). */
  def dailyGrowth(events: DataFrame): DataFrame =
    events
      .withColumn("day", expr("ts_ms DIV 86400000"))
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .groupBy("day", "event_type")
      .agg(
        count(lit(1)).as("event_count"),
        sum("cents").as("value_cents"),
        countDistinct("user_id").as("active_users"))
      .orderBy("day", "event_type")
}
