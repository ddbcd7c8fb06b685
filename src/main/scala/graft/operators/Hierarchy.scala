package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * FSO (file-system-optimized) namespace: parent-pointer hierarchy over
 * `directories(dir_id, parent_id, name)` + `files(parent_id, name, ...)` —
 * the reference's directoryTable/fileTable model (apache/ozone
 * OMDBDefinition.java:246-265) with path resolution mirroring
 * ReconUtils.java:780-803 (gatherSubPaths) and
 * SnapshotDiffManager.java:1116-1130 (full-path construction).
 *
 * Scale design: resolution is a BOUNDED-DEPTH loop of equi-joins on
 * (volume, bucket, parent_id) — depth is a namespace config (the reference
 * caps path depth), so this is k co-partitioned shuffles, never driver-side
 * recursion or an unbounded iterative fixpoint; the directory table is
 * orders of magnitude smaller than the file table and broadcast-joins when
 * it fits.
 */
object Hierarchy {

  /** Deterministic 60-bit id of a (volume, bucket, path) node — md5-prefix
    * based so the DuckDB oracle derives identical ids (engine side runs
    * the native graft_hash60, spec-pinned bit-identical to the hex-prefix
    * form). Root parent id = 0. */
  def pathId(volume: Column, bucket: Column, path: Column): Column =
    graft.functions.TextFns.tokenHash60(
      concat(volume, lit(":"), bucket, lit(":"), path))

  /** Same id computed driver-side (for resolving a literal query path). */
  def pathIdOf(volume: String, bucket: String, path: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$volume:$bucket:$path".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16)
  }

  /** Trees deeper than this are assumed cyclic/corrupt and left partially
    * resolved rather than looping forever (the reference caps path depth
    * far below this). */
  val MaxResolveDepth = 64

  /**
   * Resolve every directory to its full path via batches of parent joins:
   * each pass prepends the parent's name and hops one level up; rows
   * already at the root pass through unchanged. After `maxDepth` hops a
   * COMPLETENESS CHECK (one tiny action on the dir-sized frame) extends
   * the climb in further batches until every row is rooted — a namespace
   * deeper than the hint degrades to one extra round-trip, never to
   * silently truncated paths.
   *
   * Construction is EAGER (ADVICE r15): the completeness check is an
   * action, and the ladder is pinned before it so the check and every
   * caller share ONE evaluation — building this frame launches Spark
   * jobs at construction time, so don't build it speculatively.
   */
  def resolveDirs(dirs: DataFrame, maxDepth: Int = 8): DataFrame = {
    val parents = dirs.select(
      col("volume").as("pv"), col("bucket").as("pb"),
      col("dir_id").as("p_id"), col("parent_id").as("p_parent"),
      col("name").as("p_name"))
    var cur = dirs.select(col("volume"), col("bucket"), col("dir_id"),
      col("parent_id"), col("name").as("path"))
    def hop(): Unit =
      cur = cur.join(parents,
          cur("volume") === parents("pv") && cur("bucket") === parents("pb") &&
            cur("parent_id") === parents("p_id"), "left")
        .select(cur("volume"), cur("bucket"), cur("dir_id"),
          coalesce(col("p_parent"), lit(0L)).as("parent_id"),
          when(col("p_name").isNotNull,
            concat(col("p_name"), lit("/"), col("path")))
            .otherwise(col("path")).as("path"))
    var hops = 0
    var batch = math.max(1, maxDepth - 1)
    var unresolved = true
    while (unresolved && hops < MaxResolveDepth) {
      for (_ <- 1 to batch) hop()
      hops += batch
      // Pin THIS evaluation before the completeness check: the check is an
      // action over the whole join ladder, and without the pin the caller's
      // own evaluation re-ran the ladder a SECOND time (r15 measured the
      // fso listing family at ~2× its join cost for exactly this reason).
      // The pinned blocks are dir-table-sized (orders of magnitude below
      // the file table) and freed by the ContextCleaner once unreachable —
      // the same lifecycle the deeper-than-hint extension path already had.
      cur = cur.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cur.count() // full fill: isEmpty alone short-circuits the cache
      unresolved = !cur.filter(col("parent_id") =!= 0).isEmpty
      batch = 8
    }
    cur.select("volume", "bucket", "dir_id", "path")
  }

  /** Full path of every file: resolved parent dir path + '/' + file name —
    * the FSO→flat round trip (must reproduce the original OBS keys). */
  def resolveFiles(dirs: DataFrame, files: DataFrame,
                   maxDepth: Int = 8): DataFrame = {
    val rd = resolveDirs(dirs, maxDepth)
      .select(col("volume"), col("bucket"),
        col("dir_id").as("parent_id"), col("path").as("dir_path"))
    files.join(rd, Seq("volume", "bucket", "parent_id"))
      .select(col("volume"), col("bucket"),
        concat(col("dir_path"), lit("/"), col("name")).as("path"),
        col("data_size"))
      .orderBy("volume", "bucket", "path", "data_size")
  }

  /** Reachability / orphan scan (ref FSORepairTool.java:88-89): files whose
    * parent directory no longer exists — a LEFT ANTI join on the parent
    * pointer (one co-partitioned shuffle; the dir side is the small one). */
  def orphanFiles(dirs: DataFrame, files: DataFrame): DataFrame =
    files.join(
        dirs.select(col("volume"), col("bucket"), col("dir_id").as("parent_id")),
        Seq("volume", "bucket", "parent_id"), "left_anti")
      .select("volume", "bucket", "parent_id", "name", "object_id", "data_size")
      .orderBy("volume", "bucket", "name", "object_id", "data_size")

  /**
   * FSO listStatus: immediate children of `parentPath`, where each child
   * directory's rollup covers its WHOLE subtree (recursive, matching the
   * reference: KeyManagerImpl.java:1979-2100 returns the children and Recon
   * computes their sizes recursively — and matching what the OBS
   * [[Listing.listStatus]] prefix grouping counts). The subtree rollup goes
   * through the resolved directory paths (the same k bounded parent-joins
   * as [[resolveDirs]] — never driver recursion): every file joins to its
   * parent dir's path once, and the child is the first path segment under
   * `parentPath` — one co-partitioned join + one aggregation.
   */
  def listStatusFso(dirs: DataFrame, files: DataFrame,
                    volume: String, bucket: String, parentPath: String,
                    maxDepth: Int = 8,
                    startChild: String = "",
                    numEntries: Option[Int] = None,
                    resolvedDirs: Option[DataFrame] = None): DataFrame = {
    val pid = if (parentPath.isEmpty) 0L else pathIdOf(volume, bucket, parentPath)
    val rd = resolvedDirs.getOrElse(resolveDirs(
      dirs.filter(col("volume") === volume && col("bucket") === bucket),
      maxDepth))
    val prefix = if (parentPath.isEmpty) "" else parentPath + "/"
    // child segment directly under parentPath, for any path inside the subtree
    def childOf(path: Column): Column =
      element_at(split(substring(path, prefix.length + 1, Int.MaxValue), "/"), 1)
    // keyset resume (startChild EXCLUSIVE, the reference's startKey —
    // KeyManagerImpl.java:1979-2100): applied while SCOPING the subtree, so
    // already-paged children's subtrees are pruned before any join/agg work
    val subDirs = rd
      .filter(col("path").startsWith(prefix) && col("path") =!= lit(parentPath))
      .select(col("dir_id"), childOf(col("path")).as("child"))
      .filter(col("child") > startChild)
    // every file in the subtree, attributed to its child-of-parentPath
    val subFiles = files
      .filter(col("volume") === volume && col("bucket") === bucket)
      .join(subDirs.select(col("dir_id").as("parent_id"), col("child")),
        Seq("parent_id"))
      .groupBy("child")
      .agg(count(lit(1)).as("num_files"), sum("data_size").as("total_size"))
    val dirRollup = subDirs.select("child").distinct()
      .join(subFiles, Seq("child"), "left")
      .select(col("child"),
        coalesce(col("num_files"), lit(0L)).as("num_files"),
        coalesce(col("total_size"), lit(0L)).as("total_size"))
      .withColumn("is_dir", lit(true))
    val childFiles = files
      .filter(col("volume") === volume && col("bucket") === bucket &&
        col("parent_id") === pid && col("name") > startChild)
      .groupBy(col("name").as("child"))
      .agg(count(lit(1)).as("num_files"), sum("data_size").as("total_size"))
      .withColumn("is_dir", lit(false))
    val out = dirRollup.unionByName(childFiles)
      .select("child", "is_dir", "num_files", "total_size")
      .orderBy("child")
    // numEntries+1 rows so the caller derives truncation, like listKeys
    numEntries.map(n => out.limit(n + 1)).getOrElse(out)
  }

  /**
   * Paged FSO listStatus walk (the client pagination loop): independent
   * pages chained by `child > lastChild` keyset tokens; concatenation must
   * equal the unpaged listing. The resolved-dir paths are computed ONCE and
   * shared across pages (they are an index artifact, the dual of the
   * reference's persisted directoryTable the iterator seeks into) — each
   * page then costs one join + agg over the REMAINING subtree only.
   */
  /**
   * Missing-parent materialization for a CreateFile/CreateDirectory batch
   * — the reference's OMDirectoryCreateRequest walks a request's path from
   * the bucket root and collects every ancestor absent from the directory
   * table ("missing parents"), each minted with a fresh objectID, before
   * the key itself can land (OMDirectoryCreateRequest.java
   * getAllMissingParentDirInfos). Here the whole batch resolves in one
   * pass: explode each request's strict ancestors, dedup ACROSS requests
   * (two requests sharing a new subtree mint each dir once), and anti-join
   * the existing directory set; ids are the deterministic path ids the FSO
   * tables already use, so a minted dir's id equals what
   * [[graft.core.Tables.directoriesFso]] would derive for it.
   *
   * Scale shape: the existing-dir side is pre-pruned to the REQUESTS'
   * buckets (a broadcast semi-join pushed into the key scan) before its
   * ancestor explode; both sides then meet in one co-partitioned anti-join
   * on the dir path.
   */
  def mkdirMissingParents(requests: DataFrame,
                          objects: DataFrame): DataFrame = {
    def ancestors(df: DataFrame): DataFrame = df
      .select(col("volume"), col("bucket"),
        Aggregates.parentDirOf("key").as("pdir"))
      .filter(col("pdir") =!= "")
      .select(col("volume"), col("bucket"),
        explode(Aggregates.dirAndAncestors("pdir")).as("path"))
      .distinct()
    val reqBuckets = requests.select("volume", "bucket").distinct()
    val existing = ancestors(
      objects.join(broadcast(reqBuckets), Seq("volume", "bucket"),
        "left_semi"))
    val parentPath = expr("CASE WHEN instr(path, '/') > 0 THEN " +
      "substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)) - 1) " +
      "ELSE '' END")
    ancestors(requests)
      .join(existing, Seq("volume", "bucket", "path"), "left_anti")
      .withColumn("dir_id", pathId(col("volume"), col("bucket"), col("path")))
      .withColumn("parent_path", parentPath)
      .withColumn("parent_id",
        when(col("parent_path") === "", lit(0L))
          .otherwise(pathId(col("volume"), col("bucket"),
            col("parent_path"))))
      .select("volume", "bucket", "path", "dir_id", "parent_id")
      .orderBy("volume", "bucket", "path")
  }

  /**
   * CreateDirectory ladder (OMDirectoryCreateRequest
   * .validateAndUpdateCache:141-205 + OMFileRequest.verifyFilesInPath):
   *   1. empty/normalized-to-root path → CANNOT_CREATE_DIRECTORY_AT_ROOT
   *      (:148-150)
   *   2. validateBucketAndVolume → BUCKET_NOT_FOUND
   *   3. the path itself or any ANCESTOR exists as a FILE →
   *      FILE_ALREADY_EXISTS (:172-174, FILE_EXISTS /
   *      FILE_EXISTS_IN_GIVENPATH; blocked_by says which)
   *   4. the full path already a dir → DIR_EXISTS (Result
   *      .DIRECTORY_ALREADY_EXISTS — an idempotent no-op, NOT an error)
   *   5. CREATED — with dirs_minted counting the missing prefixes the
   *      request materializes (the [[mkdirMissingParents]] walk per
   *      request).
   *
   * Scale shape: the request batch's prefix explode is request-sized;
   * file/dir existence are broadcast semi-probes into the namespace scan
   * keyed by those prefixes. The namespace never shuffles.
   */
  def mkdirDecisions(requests: DataFrame, objects: DataFrame,
                     buckets: DataFrame, dirs: DataFrame): DataFrame = {
    val prefixes = requests
      .filter(col("path") =!= "")
      .select(col("req_id"), col("volume"), col("bucket"), col("path"),
        explode(Aggregates.dirAndAncestors("path")).as("pfx"))
    val pfxKeys = prefixes.select(col("volume"), col("bucket"),
      col("pfx").as("key")).distinct()
    val fileProbe = objects
      .join(broadcast(pfxKeys), Seq("volume", "bucket", "key"), "left_semi")
      .select(col("volume"), col("bucket"), col("key").as("pfx"))
      .distinct()
      .withColumn("is_file", lit(true))
    val dirProbe = dirs
      .select(col("volume"), col("bucket"), col("path").as("pfx"))
      .join(broadcast(pfxKeys.withColumnRenamed("key", "pfx")),
        Seq("volume", "bucket", "pfx"), "left_semi")
      .distinct()
      .withColumn("is_dir", lit(true))
    val flags = prefixes
      .join(broadcast(fileProbe), Seq("volume", "bucket", "pfx"), "left")
      .join(broadcast(dirProbe), Seq("volume", "bucket", "pfx"), "left")
      .groupBy("req_id")
      .agg(
        max(coalesce(col("is_file"), lit(false)) &&
          col("pfx") === col("path")).as("self_file"),
        max(coalesce(col("is_file"), lit(false)) &&
          col("pfx") =!= col("path")).as("anc_file"),
        max(coalesce(col("is_dir"), lit(false)) &&
          col("pfx") === col("path")).as("self_dir"),
        sum(when(col("is_dir").isNull, 1L).otherwise(0L))
          .as("missing_prefixes"))
    val bktProbe = buckets.select("volume", "bucket").distinct()
      .withColumn("bkt_exists", lit(true))
    requests
      .join(broadcast(bktProbe), Seq("volume", "bucket"), "left")
      .join(broadcast(flags), Seq("req_id"), "left")
      .withColumn("decision",
        when(col("path") === "", lit("CANNOT_CREATE_DIRECTORY_AT_ROOT"))
          .when(col("bkt_exists").isNull, lit("BUCKET_NOT_FOUND"))
          .when(col("self_file") || col("anc_file"),
            lit("FILE_ALREADY_EXISTS"))
          .when(col("self_dir"), lit("DIR_EXISTS"))
          .otherwise(lit("CREATED")))
      .select(col("req_id"), col("volume"), col("bucket"), col("path"),
        col("decision"),
        when(col("decision") === "FILE_ALREADY_EXISTS",
          when(col("self_file"), lit("SELF")).otherwise(lit("ANCESTOR")))
          .otherwise(lit("")).as("blocked_by"),
        when(col("decision") === "CREATED", col("missing_prefixes"))
          .otherwise(lit(0L)).as("dirs_minted"))
      .orderBy("req_id")
  }

  /**
   * CreateFile ladder (OMFileCreateRequest.checkDirectoryResult:342-357 +
   * checkAllParentsExist:366-377) — mkdir's dual with the overwrite and
   * recursive client flags:
   *   1. validateBucketAndVolume → BUCKET_NOT_FOUND
   *   2. verifyFilesInPath outcome (the three results are mutually
   *      exclusive): path IS a dir → NOT_A_FILE; an ancestor is a file →
   *      NOT_A_FILE (FILE_EXISTS_IN_GIVENPATH); path is a file and
   *      overwrite unset → FILE_ALREADY_EXISTS
   *   3. non-recursive create requires the IMMEDIATE parent dir
   *      (higher levels assumed, checkAllParentsExist) →
   *      DIRECTORY_NOT_FOUND
   *   4. OVERWRITTEN (path was a file, overwrite set) or CREATED, with
   *      dirs_minted = missing parent-chain prefixes the recursive create
   *      materializes.
   */
  def createFileDecisions(requests: DataFrame, objects: DataFrame,
                          buckets: DataFrame, dirs: DataFrame): DataFrame = {
    val withParent = requests
      .withColumn("parent", Aggregates.parentDirOf("path"))
    val prefixes = withParent
      .filter(col("parent") =!= "")
      .select(col("req_id"), col("volume"), col("bucket"), col("path"),
        explode(Aggregates.dirAndAncestors("parent")).as("pfx"))
    val pathKeys = withParent.select(col("volume"), col("bucket"),
      col("path").as("key"))
      .unionByName(prefixes.select(col("volume"), col("bucket"),
        col("pfx").as("key")))
      .distinct()
    val fileProbe = objects
      .join(broadcast(pathKeys), Seq("volume", "bucket", "key"),
        "left_semi")
      .select(col("volume"), col("bucket"), col("key")).distinct()
      .withColumn("is_file", lit(true))
    val dirProbe = dirs
      .select(col("volume"), col("bucket"), col("path").as("key"))
      .join(broadcast(pathKeys), Seq("volume", "bucket", "key"),
        "left_semi")
      .distinct()
      .withColumn("is_dir", lit(true))
    val parentFlags = prefixes
      .join(broadcast(fileProbe.withColumnRenamed("key", "pfx")),
        Seq("volume", "bucket", "pfx"), "left")
      .join(broadcast(dirProbe.withColumnRenamed("key", "pfx")),
        Seq("volume", "bucket", "pfx"), "left")
      .groupBy("req_id")
      .agg(
        max(coalesce(col("is_file"), lit(false))).as("anc_file"),
        sum(when(col("is_dir").isNull, 1L).otherwise(0L))
          .as("missing_parents"))
    val selfFile = fileProbe.select(col("volume"), col("bucket"),
      col("key").as("path"), col("is_file").as("self_file"))
    val selfDir = dirProbe.select(col("volume"), col("bucket"),
      col("key").as("path"), col("is_dir").as("self_dir"))
    val parentDirP = dirProbe.select(col("volume"), col("bucket"),
      col("key").as("parent"), col("is_dir").as("parent_is_dir"))
    val bktProbe = buckets.select("volume", "bucket").distinct()
      .withColumn("bkt_exists", lit(true))
    withParent
      .join(broadcast(bktProbe), Seq("volume", "bucket"), "left")
      .join(broadcast(selfFile), Seq("volume", "bucket", "path"), "left")
      .join(broadcast(selfDir), Seq("volume", "bucket", "path"), "left")
      .join(broadcast(parentDirP), Seq("volume", "bucket", "parent"),
        "left")
      .join(broadcast(parentFlags), Seq("req_id"), "left")
      .withColumn("decision",
        when(col("bkt_exists").isNull, lit("BUCKET_NOT_FOUND"))
          .when(coalesce(col("self_dir"), lit(false)), lit("NOT_A_FILE"))
          .when(coalesce(col("anc_file"), lit(false)), lit("NOT_A_FILE"))
          .when(coalesce(col("self_file"), lit(false)) &&
            !col("overwrite"), lit("FILE_ALREADY_EXISTS"))
          .when(!col("recursive") && col("parent") =!= "" &&
            col("parent_is_dir").isNull, lit("DIRECTORY_NOT_FOUND"))
          .when(coalesce(col("self_file"), lit(false)),
            lit("OVERWRITTEN"))
          .otherwise(lit("CREATED")))
      .select(col("req_id"), col("volume"), col("bucket"), col("path"),
        col("decision"),
        when(col("decision") === "CREATED",
          coalesce(col("missing_parents"), lit(0L))).otherwise(lit(0L))
          .as("dirs_minted"))
      .orderBy("req_id")
  }

  def listStatusFsoWalk(dirs: DataFrame, files: DataFrame,
                        volume: String, bucket: String, parentPath: String,
                        pageSize: Int, maxDepth: Int = 8,
                        maxPages: Int = 100000): DataFrame = {
    val spark = dirs.sparkSession
    // The walk reads the WHOLE listing page by page, so the subtree rollup
    // is materialized once (child-level rows = output-sized, tiny next to
    // the file table) and every page is a keyset slice `child > token` of
    // that snapshot — one join+agg total instead of one per page. The
    // per-page subtree PRUNING path (listStatusFso's startChild) stays the
    // shape for single-page API calls, where computing the full listing
    // would waste the whole point of resuming.
    val full = listStatusFso(dirs, files, volume, bucket, parentPath,
      maxDepth).localCheckpoint()
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var start = ""
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val pg = full.filter(col("child") > start).orderBy("child")
        .limit(pageSize + 1).collect().toSeq
      buf ++= pg.take(pageSize)
      done = pg.size <= pageSize
      if (!done) start = pg(pageSize - 1).getString(0)
      pages += 1
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(buf.toSeq, 1),
        org.apache.spark.sql.types.StructType.fromDDL(
          "child STRING, is_dir BOOLEAN, num_files BIGINT, total_size BIGINT"))
      .orderBy("child")
  }
}
