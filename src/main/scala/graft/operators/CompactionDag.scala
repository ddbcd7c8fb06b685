package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot-diff SST pruning over the compaction DAG — the reference's
 * `rocksdb-checkpoint-differ` subsystem. Given two snapshots' live SST-file
 * sets and the compaction log (which compactions consumed which input files
 * into which outputs), compute the minimal set of SSTs whose content differs
 * between the snapshots, so a snapshot diff reads only those files instead
 * of both full checkpoints.
 *
 * Reference semantics
 * (hadoop-hdds/rocksdb-checkpoint-differ/src/main/java/org/apache/ozone/rocksdiff/):
 *   - CompactionDag.java:66-81 — DAG edges run output → input: the
 *     "successors" of a file are the inputs of the compaction that produced
 *     it, i.e. walking successors walks BACK toward older content.
 *   - RocksDBCheckpointDiffer.internalGetSSTDiffList — BFS from the newer
 *     (src) snapshot's files: a file present in the older (dest) snapshot is
 *     SAME; a file the compaction log never mentions is DIFFERENT; a file
 *     whose node generation predates the dest snapshot is DIFFERENT (its
 *     content diverged before dest's horizon, cannot be matched further); a
 *     file with no successors (never an output of a tracked compaction) is
 *     DIFFERENT; otherwise expand into its compaction inputs and continue.
 *   - CompactionDag.java:42-47 / 66-74 — a node's generation is the seq of
 *     the first compaction-log entry mentioning it (entries arrive in seq
 *     order, so first-seen == min seq).
 *   - RocksDiffUtils.java:58-100 — both snapshots' file maps are pruned to
 *     the requested key range BEFORE the walk (an SST whose [start_key,
 *     end_key] doesn't overlap the diff's bucket prefix is irrelevant).
 *
 * Scale shape: the two snapshot file maps are checkpoint METADATA (one row
 * per live SST — broadcastable at any realistic deployment), so the dest
 * membership probes are broadcast joins. The unbounded table is the
 * compaction LOG (years of history); it is scanned once for the node-gen
 * map and then joined per BFS level against a frontier no larger than the
 * src file set plus one compaction fan-in — the log itself never drives a
 * shuffle wider than the frontier. Loop depth is the DAG level count
 * (single digits in practice), each level cut with localCheckpoint; a depth
 * guard mirrors the reference's traversal-level cap (a cycle in a corrupt
 * log must fail loudly, not spin — RocksDBCheckpointDiffer traversal guard).
 */
object CompactionDag {

  /** DAG levels are bounded by compaction depth (L0→L6 in practice); far
    * past this the log is cyclic/corrupt — fail like the reference does. */
  val MaxWalkDepth = 32

  /** Node generations: min compaction seq mentioning the file on either
    * side (CompactionDag.java:66-74 computeIfAbsent at entry seq). One
    * projection + one agg over the log, computed once and reused by every
    * BFS level. */
  def nodeGens(edges: DataFrame): DataFrame =
    edges.select(col("output_file").as("file"), col("seq"))
      .unionByName(edges.select(col("input_file").as("file"), col("seq")))
      .groupBy("file").agg(min("seq").as("gen"))

  /** Key-range pruning of a snapshot file map (RocksDiffUtils.java:58-76):
    * keep SSTs whose [start_key, end_key] overlaps [lo, hi]. */
  def pruneByRange(files: DataFrame, lo: String, hi: String): DataFrame =
    files.filter(col("end_key") >= lo && col("start_key") <= hi)

  /**
   * SstFilteringService per-bucket prune census — SstFilteringService
   * .java:219-243 walks every snapshot, asks RocksDatabase
   * .deleteFilesNotMatchingPrefix:872-907 to drop the SSTs whose key range
   * cannot contain the snapshot's bucket prefix: a LAST-LEVEL file is
   * prunable iff NOT `firstNChars(smallestKey, L) <= prefix <=
   * firstNChars(largestKey, L)` (RocksDiffUtils.java:42-49
   * isKeyWithPrefixPresent); files off the last level are never deleted.
   * One decision per (bucket, file), rolled up per bucket:
   *   - n_pruned     — last-level files outside the prefix range,
   *   - n_kept_range — files whose range admits the prefix,
   *   - n_kept_level — out-of-range files saved only by the level rule,
   *   - pruned_keys  — key entries the filtered snapshot DB sheds.
   *
   * Scale shape: the bucket catalog is a broadcast-sized dim crossed into
   * the file-metadata scan (files × buckets decisions, exactly the
   * reference's per-snapshot loop), then one shuffle on (volume, bucket)
   * for the rollup. The SST metadata table is ~|namespace|/500 rows —
   * control-plane-sized at any SF.
   */
  def sstBucketPrune(files: DataFrame, buckets: DataFrame): DataFrame = {
    val dim = buckets.select(col("volume"), col("bucket"))
      .withColumn("__prefix",
        concat(lit("/"), col("volume"), lit("/"), col("bucket"), lit("/")))
    files.crossJoin(broadcast(dim))
      .withColumn("__overlap", expr(
        "substr(smallest_key, 1, length(__prefix)) <= __prefix AND " +
          "__prefix <= substr(largest_key, 1, length(__prefix))"))
      .groupBy("volume", "bucket")
      .agg(
        count(lit(1)).as("n_files"),
        sum(when(col("level") === 3 && !col("__overlap"), 1L)
          .otherwise(0L)).as("n_pruned"),
        sum(when(col("__overlap"), 1L).otherwise(0L)).as("n_kept_range"),
        sum(when(col("level") =!= 3 && !col("__overlap"), 1L)
          .otherwise(0L)).as("n_kept_level"),
        sum(when(col("level") === 3 && !col("__overlap"), col("n_keys"))
          .otherwise(0L)).cast("long").as("pruned_keys"))
      .orderBy("volume", "bucket")
  }

  /**
   * The SST diff walk. `srcLive`/`destLive` carry (file, start_key,
   * end_key) for the newer/older snapshot respectively; `edges` is the
   * compaction log (output_file, input_file, seq); `destGen` is the older
   * snapshot's generation. Returns (file, cls) with cls ∈ {SAME,
   * DIFFERENT}: DIFFERENT is the pruned read set for the diff job, SAME is
   * content already covered by the dest checkpoint. Interior nodes (files
   * fully decomposed into their compaction inputs) are not emitted, exactly
   * like the reference's result maps.
   */
  def sstDiff(srcLive: DataFrame, destLive: DataFrame, edges: DataFrame,
              destGen: Long, lo: String, hi: String): DataFrame = {
    val src = pruneByRange(srcLive, lo, hi).select("file")
    val dest = broadcast(pruneByRange(destLive, lo, hi).select("file"))

    // frontier/visited are metadata-sized (≤ |src files| + one fan-in);
    // keep them on a few partitions so the per-level jobs don't pay 32-way
    // task scheduling for kilobyte frames
    def pin(df: DataFrame): DataFrame = df.coalesce(4).localCheckpoint()

    // materialize the node-gen map ONCE — joining it lazily would re-run
    // its aggregation (a full pass over the log) on every BFS level. NOT
    // pinned to few partitions: it is log-sized (one row per SST ever
    // mentioned), unlike the frontier frames below.
    val gens = nodeGens(edges).localCheckpoint()

    var sameBatches = List(src.join(dest, Seq("file"), "left_semi"))
    var diffBatches = List.empty[DataFrame]
    var frontier = pin(src.join(dest, Seq("file"), "left_anti"))
    var visited = pin(src)
    var depth = 0
    while (!frontier.isEmpty) {
      depth += 1
      if (depth > MaxWalkDepth)
        throw new IllegalStateException(
          s"compaction-DAG walk exceeded $MaxWalkDepth levels — cyclic or " +
            "corrupt compaction log (reference traversal guard)")
      val f = frontier.join(gens, Seq("file"), "left")
      // terminal: never compacted (no node) or predates the dest horizon
      val cut = f.filter(col("gen").isNull || col("gen") < destGen)
        .select("file")
      val expandable = f
        .filter(col("gen").isNotNull && col("gen") >= destGen)
        .select("file")
      val expanded = expandable
        .join(edges, expandable("file") === edges("output_file"), "left")
        .select(expandable("file"), col("input_file"))
      // in the log but never an output: no further decomposition possible
      val noSucc = expanded.filter(col("input_file").isNull).select("file")
      diffBatches ::= pin(cut.unionByName(noSucc))
      val nexts = pin(expanded.filter(col("input_file").isNotNull)
        .select(col("input_file").as("file")).distinct()
        .join(visited, Seq("file"), "left_anti"))
      sameBatches ::= nexts.join(dest, Seq("file"), "left_semi")
      frontier = pin(nexts.join(dest, Seq("file"), "left_anti"))
      visited = pin(visited.unionByName(nexts))
    }
    val same = sameBatches.reduce(_ unionByName _)
      .withColumn("cls", lit("SAME"))
    val diff = diffBatches.foldLeft(same.filter(lit(false)).drop("cls"))(
        _ unionByName _)
      .withColumn("cls", lit("DIFFERENT"))
    same.unionByName(diff).orderBy("cls", "file")
  }
}
