package graft

import org.apache.spark.sql.functions.col

/** Benchmark main: one timed pass over every declared query after a warmup
  * that absorbs session/codegen startup cost. A query that throws FAILS the
  * whole bench (exit 1) — a broken query must never be recorded as a fast
  * success. The JSON line goes to stdout AND `bench_out.json` (file first,
  * so a truncated stdout capture can never lose the per-query map). */
object Bench {
  private[graft] def cloneDir(src: String): String = {
    import java.nio.file._
    val dst = java.nio.file.Paths.get(graft.core.TempDirs.create("graft_steady_"))
    val s = Files.walk(Paths.get(src))
    try s.forEach { p =>
      val t = dst.resolve(Paths.get(src).relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    } finally s.close()
    // manifests/pointers carry absolute paths into the source dir; rewrite
    val w = Files.walk(dst)
    try w.filter(p => {
      val n = p.getFileName.toString
      n == "current" || n.startsWith("manifest-v")
    }).forEach { p =>
      Files.writeString(p, Files.readString(p).replace(src, dst.toString))
    } finally w.close()
    dst.toString
  }

  /** Thrown when a scale probe's ANSWER fails an invariant (rep-count
    * drift, canon-dual mismatch, or a conservation identity) — escapes
    * every degrade-to-JSON catch so the bench exits non-zero: a
    * wrong-at-scale answer must never ship as a fast success
    * (VERDICT r12 #1). */
  private final class InvariantViolation(msg: String)
    extends RuntimeException(msg)

  /** Order-insensitive distributed canon signature of a result:
    * "rows:sum64:xor64" over xxhash64 of the \u0001-joined name-sorted
    * columns (cast to string, NULL → \u0000 sentinel). Both sides of a
    * dual comparison render identically, so equality ⇔ same row multiset
    * (up to 64-bit collisions). No collect — safe at 100×. */
  private[graft] def canonSig(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.{functions => F}
    val cols = df.columns.sorted.map(c =>
      F.coalesce(F.col(c).cast("string"), F.lit("\u0000")))
    val r = df
      .select(F.xxhash64(F.concat_ws("\u0001", cols.toIndexedSeq: _*)).as("h"))
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("h").cast("decimal(38,0)")).as("s"),
        F.expr("bit_xor(h)").as("x"))
      .head()
    val s = if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString(16)
    val x = if (r.isNullAt(2)) 0L else r.getLong(2)
    s"${r.getLong(0)}:$s:${java.lang.Long.toHexString(x)}"
  }

  /** Machine-readable host-noise indicator (VERDICT r12 #2): fixed,
    * constant work — a CPU-bound codegen fold + an 8-file parquet
    * round-trip — timed ONCE per block (deliberately not min-of-N: the
    * point is to MEASURE the window's noise, not absorb it). Quiet-host
    * cost is documented in SURVEY §scale-matrix; a reader classifies any
    * block as quiet/loaded from its calibration key alone. Call
    * [[calibrationWarm]] once per JVM first so the timed run measures
    * the host, not codegen compilation. */
  private def calibration(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.{functions => F}
    val t0 = System.nanoTime()
    spark.range(400000000L)
      .select(F.expr("bit_xor(xxhash64(id))").as("x")).head()
    val dir = graft.core.TempDirs.create("graft_calib_")
    spark.range(2000000L)
      .select(F.col("id"), F.expr("xxhash64(id)").as("h"))
      .repartition(8).write.mode("overwrite").parquet(dir)
    // decimal sum: a long sum of 2M xxhash64 draws overflows under ANSI
    spark.read.parquet(dir).agg(F.sum(F.col("h").cast("decimal(38,0)"))).head()
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(dir))
    (System.nanoTime() - t0) / 1e9
  }

  private def calibrationWarm(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    calibration(spark); ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    // ---- 10× scale probe FIRST, in a pristine JVM: probing at the END
    // of the long base pass proved unreproducible (the base session's
    // heap debris swung the fold-kernel probes 2.9 s ↔ 58 s between runs
    // even with a fresh SparkSession — the JVM keeps its expanded heap).
    // Probe-first gives the probes the same environment every run.
    val (sf1Json, sf1Min) =
      if (sys.env.get("SPARK_GRAFT_SCALE_PROBE").contains("0"))
        ("", Map.empty[String, Double])
      else {
        val probeSession = graft.core.GraftSession.local(cpus)
        val frag = scaleProbe(probeSession, sfDir)
        System.gc()
        frag
      }
    // dev switch: probe-only run (skips streaming + the full query sweep)
    // for iterating on the scale blocks without paying the base pass
    if (sys.env.get("SPARK_GRAFT_BASE").contains("0")) {
      val json = s"""{"metric":"probe-only","value":0,"unit":"sec",""" +
        s""""queries":{}$sf1Json,"sf":"$sfDir"}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_out.json"), json)
      println(json)
      return
    }
    // crash hedge: the full run takes ~25-30 min (the 100× ingest builds
    // dominate); snapshot the finished probe phase NOW so an external
    // kill mid-sweep still leaves the scale evidence on disk — the final
    // write below replaces this with the complete record
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"),
      s"""{"metric":"partial-probe-phase","value":0,"unit":"sec",""" +
        s""""queries":{}$sf1Json,"sf":"$sfDir"}""")
    val spark = graft.core.GraftSession.local(cpus)
    // Warmup: touch every input table + pay codegen/session startup once,
    // so the first measured query isn't charged ~5 s of JVM warmup; also
    // build the one-time key-sorted warehouse (the engine's "DB ingest" —
    // setup cost, not per-query cost).
    SparkEntry.entry(spark).count()
    graft.core.Tables.objectsSorted(spark, sfDir).count()
    graft.core.Tables.objectsMixedSorted(spark, sfDir).count()
    graft.core.Tables.directoriesFso(spark, sfDir).count()
    graft.core.Tables.dirPaths(spark, sfDir).count()
    graft.core.Tables.filesFso(spark, sfDir).count()
    graft.core.Tables.directoriesFsoDeep(spark, sfDir).count()
    graft.core.Tables.filesFsoDeep(spark, sfDir).count()
    graft.core.Tables.deletedDirs(spark, sfDir).count()
    graft.core.Tables.sstNamespaceFiles(spark, sfDir).count()
    graft.core.Tables.snapshotV1(spark, sfDir).count()
    graft.core.Tables.snapshotV2(spark, sfDir).count()
    SparkEntry.queries.get("q_global_counts").foreach(_(spark, sfDir).count())
    // index/verification artifacts (minhash bands, verified pairs, IVF
    // centroids, PQ codebooks, embedding pairs) are ingest-time builds
    // exactly like the warehouse — prebuild so queries measure probes
    SparkEntry.prebuildArtifacts(spark, sfDir)
    // snapshot checkpoints are ingest-time artifacts too (the reference's
    // RocksDB checkpoints exist before any diff is asked for)
    graft.operators.CommitLog.snapshotWarehouse(spark,
      graft.core.Tables.objects(spark, sfDir), sfDir)
    // Streaming bootstrap (CDC log synthesis + full stream drain) measured
    // as ITS OWN metric instead of smearing into the first q_stream_* query.
    // Source = the mixed-depth namespace, matching the q_stream_* queries'
    // replayedWorkDir source (the memoized state is built once per sfDir).
    val objects = graft.core.Tables.objectsMixed(spark, sfDir)
    // the CDC log is the durable INPUT of the streaming plane — its
    // synthesis is fixture creation (like the testdata parquet itself),
    // warmed here so bootstrap measures state REBUILD from an existing
    // log: the actual availability gap after a checkpoint loss
    val cdcLog = graft.streaming.ChangeStream.cdcLogDir(spark, objects, sfDir)
    // Warm-numbers rule (same as every other metric here — the steady
    // metric below is a 5-rep median): one throwaway bootstrap compiles
    // the three fold plans' codegen, then the timed reps measure the
    // actual recovery work. Cold r8 measured 4.97 s of which ~2.8 s was
    // one-off whole-stage-codegen compilation, not per-recovery cost.
    // 3 timed reps, min + rep array (the probes' discipline): a single
    // shot drew 2.3↔3.6 s between identical-code runs — a GC landing
    // inside the one rep owned the headline and faked a 4× bootstrap
    // ratio against the 5-rep-median steady metric.
    graft.streaming.ChangeStream.bootstrapViews(spark, cdcLog,
      graft.core.TempDirs.create("graft_bswarm_"))
    val bootstrapReps = (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      graft.streaming.ChangeStream.bootstrapViews(spark, cdcLog,
        graft.core.TempDirs.create("graft_bsrep_"))
      secs(t0)
    }
    val bootstrapSec = bootstrapReps.min
    // the canonical memoized state the q_stream_* queries read (same
    // bootstrapViews work, untimed here — the reps above already
    // measured the rebuild)
    val work = graft.streaming.ChangeStream.replayedWorkDir(spark, objects, sfDir)
    // Steady-state incremental cost: ONE post-bootstrap delta batch driven
    // straight through the merge path (the same merges the stream's
    // foreachBatch runs) against a CLONE of the bootstrap state — the
    // memoized state the timed q_stream_* queries read stays exactly the
    // canonical replay, and the metric isolates the state-merge cost a
    // long-running incremental view pays per batch (only touched
    // (volume,bucket) partitions rewrite).
    val steadyWork = cloneDir(work)
    // hand the clone over from streaming to batch-driven maintenance:
    // applyDeltaBatch refuses dirs holding a (dead, path-bound) streaming
    // checkpoint, so the batch watermarks can never collide with a resume
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(steadyWork, "ckpt"))
    val delta = objects
      .orderBy("volume", "bucket", "key", "version", "data_size").limit(1000)
    // steady state means REPEATED batches: apply five and report the
    // median — the first batch's one-off codegen/plan warmup AND the
    // occasional GC-landing batch (a 3× spike in isolated SteadyProbe
    // runs) both fall out of a 5-rep median where a 3-rep one could
    // report the spike
    val steadyTimes = (0 until 5).map { i =>
      val deltaBatch = graft.streaming.ChangeLog.events(delta)
        .withColumn("seq", col("seq") + 10000000L * (i + 1))
        .persist()
      deltaBatch.count()
      val tS = System.nanoTime()
      graft.streaming.ChangeStream.applyDeltaBatch(spark, steadyWork, deltaBatch)
      val t = secs(tS)
      deltaBatch.unpersist()
      t
    }
    val steadySec = steadyTimes.sorted.apply(1)
    // host-noise indicator for the sweep window (VERDICT r12 #2): warm
    // once (codegen), then ONE timed run — published so a reader can
    // classify the sweep window as quiet/loaded without SURVEY prose
    calibrationWarm(spark)
    val sweepCalib = calibration(spark)
    def timeQuery(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        spark.stop(); sys.exit(1)
      }
      secs(t0)
    }
    val names = SparkEntry.queries.keys.toSeq
    // min-of-2 for EVERY query (VERDICT r11 #1): across ~300 queries in
    // one session a handful land on a GC pause / storage-eviction
    // recompute / first-touch read and publish 3-6 s for plans whose warm
    // cost is 0.1-0.8 s — WHICH queries differs every run, and the old
    // max(3 s, 5×median) re-pass left the 0.5-3 s contamination band
    // un-retimed. The second pass is fully warm (~median × N extra wall),
    // and the min is the steady-state cost the sf1/sf10 probes already
    // report (same warm-numbers rule as everywhere else in this file).
    val firstPass = names.map(n => n -> timeQuery(n)).toMap
    val secondPass = names.map(n => n -> timeQuery(n)).toMap
    val best = scala.collection.mutable.Map.empty[String, Double] ++
      names.map(n => n -> math.min(firstPass(n), secondPass(n)))
    // Outlier re-pass on the MINS: a draw can land slow twice (r11's
    // q_om_scm_mismatch kept 3.36 s through its one re-time yet read
    // 0.63 s in a fresh session). Anything over max(1 s, 3× median) gets
    // up to 2 further gc'd re-times; threshold dropped from the old
    // max(3 s, 5×median) exactly to reach the 0.5-3 s band.
    val med = best.values.toSeq.sorted.apply(best.size / 2)
    val threshold = math.max(1.0, 3 * med)
    // shared by the outlier pass and the sf1 gate below — only the bar
    // differs (a genuinely-slow query can draw both, bounded at 4+3
    // runs); the sf1 gate gets a third re-time because its flags are a
    // published verdict and a marginal survivor (observed: 0.82 vs a
    // 0.80 bar for a 0.23-0.37 s warm plan, all four draws landing on
    // the same noisy window) needs evidence, not a looser bar
    def retimeAbove(n: String, bar: Double, label: String,
                    maxTries: Int = 2): Unit = {
      var tries = 0
      while (best(n) > bar && tries < maxTries) {
        System.gc()
        val t2 = timeQuery(n)
        System.err.println(f"[bench] $label $n: ${best(n)}%.2f -> $t2%.2f")
        best(n) = math.min(best(n), t2)
        tries += 1
      }
    }
    for (n <- names if best(n) > threshold)
      retimeAbove(n, threshold, "re-timed outlier")
    // Sweep-vs-probe consistency gate (VERDICT r11 #6): 1× data cannot
    // honestly cost more than 2× the warmed 10× probe of the SAME
    // operator. Anything over gets gc'd re-times too; a survivor is
    // published in "sweep_flags" instead of silently shipping a
    // contaminated headline (0.8 s floor so sub-second probe minima
    // don't flag honest sub-second sweep readings).
    val flags = scala.collection.mutable.ListBuffer.empty[String]
    for ((n, p) <- sf1Min if best.contains(n)) {
      val bar = math.max(2 * p, 0.8)
      retimeAbove(n, bar, "sweep>2×sf1, re-timed", maxTries = 3)
      if (best(n) > bar) flags += n
    }
    val results = names.map(n => n -> best(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val flagsJson = flags.map("\"" + _ + "\"").mkString("[", ",", "]")

    // the steady-state clone served its three batches — reclaim it
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(steadyWork))

    // NOTE (ADVICE r11): stream_bootstrap_sec became a MIN-of-3 in r11
    // (was a single shot through r10) — cross-round comparisons against
    // r10-and-earlier files compare different statistics. The key keeps
    // its name for continuity; stream_bootstrap_reps carries the raw
    // draws and SURVEY §9 documents the break.
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sweep_flags":$flagsJson,""" +
        s""""sweep_calibration_sec":$sweepCalib,""" +
        s""""stream_bootstrap_sec":$bootstrapSec,""" +
        s""""stream_bootstrap_reps":${
          bootstrapReps.mkString("[", ",", "]")},""" +
        s""""stream_steady_batch_sec":$steadySec$sf1Json,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json)
    println(json)
    if (!spark.sparkContext.isStopped) spark.stop()
  }

  /** The 10×/100× scale-probe body, run FIRST in a pristine JVM (own
    * session, stopped here before the base pass starts — see main's
    * sf1Json comment). Returns the `,"sf1":{...},...` JSON fragment AND
    * the per-query sf1 minima the base sweep's consistency guard
    * compares against (VERDICT r11 #6). */
  private def scaleProbe(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String): (String, Map[String, Double]) = {
      import org.apache.spark.sql.{functions => F}
      val T = graft.core.Tables
      def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
      // compile the calibration plans once per JVM — every later
      // calibration() call then measures the host window, not codegen
      calibrationWarm(spark)
      // ONE shared scale-up definition (Tables.namespaceScaled10) for the
      // bench and every A/B tool — the r13 churn-digit bug lived in six
      // copy-pasted copies at once (see the helper's scaladoc)
      def scale10(df: org.apache.spark.sql.DataFrame) =
        T.namespaceScaled10(df)
      val obj10 = scale10(T.objectsView(spark, sfDir))
      val wh10 = graft.core.TempDirs.create("graft_sf1_")
      // warm the synthesis + parquet-write JIT on the 1× table first
      // (untimed): the timed ingest below then measures the write plan,
      // not first-touch compilation (observed 23 s vs 115 s for the SAME
      // ingest depending on JIT state)
      T.objectsView(spark, sfDir)
        .repartition(F.col("volume"), F.col("bucket"))
        .sortWithinPartitions(F.col("volume"), F.col("bucket"), F.col("key"))
        .write.partitionBy("volume", "bucket").mode("overwrite")
        .parquet(wh10 + "/warm")
      // the key-sorted warehouse is INGEST cost (reported separately).
      def ingestOnce(): Double = {
        val tI = System.nanoTime()
        obj10.repartition(F.col("volume"), F.col("bucket"))
          .sortWithinPartitions(F.col("volume"), F.col("bucket"), F.col("key"))
          .write.partitionBy("volume", "bucket").mode("overwrite")
          .parquet(wh10 + "/objects")
        // the snapshot pair materializes like the namespace (a cluster
        // diffs STORED checkpoints; the lazy 10× crossJoin re-synthesis
        // made the diff probe synthesis-bound: 17 s stable vs 2 s stored)
        scale10(T.snapshotV1(spark, sfDir)).write.mode("overwrite")
          .parquet(wh10 + "/snap1")
        scale10(T.snapshotV2(spark, sfDir)).write.mode("overwrite")
          .parquet(wh10 + "/snap2")
        secs(tI)
      }
      // ONE untimed materialize here — the probes need the stored 10×
      // warehouse, but the TIMED 5-rep ingest block runs LAST (after all
      // probes): r9 recorded the fold probes 3-4× slower on unchanged
      // code after the ingest went 3→5 reps in front of them — two extra
      // full 10× write passes of heap churn in the same JVM is exactly
      // the contamination the probe-first design exists to avoid
      // (VERDICT r9 #2).
      ingestOnce()
      val sorted10 = spark.read.parquet(wh10 + "/objects")
      val snap1 = spark.read.parquet(wh10 + "/snap1")
      val snap2 = spark.read.parquet(wh10 + "/snap2")
      // The nested key-table attributes (tags/acls/chunk locations) are
      // STORED value fields in the reference (OmKeyInfo) and memoPersisted
      // at 1× (Tables.objectsNested) — but the r11 probe timed
      // `T.nestedFrom(sorted10)`, i.e. re-ran the array/struct SYNTHESIS
      // over 10× rows inside every merkle rep. That synthesis is what
      // moved the whole rep array ([9.75, 9.94, 4.69] s) while the query
      // read 0.64 s warm at 1× (VERDICT r11 #2). Store the 10× nested
      // table like the warehouse; the build cost is reported separately
      // (sf1_nested_build_sec) so the synthesis-vs-fold split is explicit.
      val tN = System.nanoTime()
      T.nestedFrom(sorted10).write.mode("overwrite").parquet(wh10 + "/nested")
      val nestedBuildSec = secs(tN)
      val nested10 = spark.read.parquet(wh10 + "/nested")
      // 10× embedding corpus for the ANN probes (stored, like the
      // namespace; untimed — the ingest metric keeps its r1-comparable
      // namespace-only meaning). Centroids are an ingest-time index
      // artifact, exactly like the base pass's ivfCentroidsCached.
      T.embScaled(T.embeddings(spark, sfDir), 10)
        .write.mode("overwrite").parquet(wh10 + "/emb")
      val emb10 = spark.read.parquet(wh10 + "/emb")
      graft.operators.Similarity.ivfCentroids(
          graft.operators.Similarity.quantized(emb10))
        .write.mode("overwrite").parquet(wh10 + "/cents")
      val cents10 = spark.read.parquet(wh10 + "/cents")
      // probes read the MATERIALIZED 10× warehouse (sorted10), never the
      // lazy obj10 synthesis: re-deriving the crossJoin per probe made the
      // probe time synthesis-bound and heap-sensitive (observed 2.9s vs
      // 29s for the same histogram plan between runs) — a cluster reads
      // stored parquet, so that is the honest shape to measure
      val probes: Seq[(String, () => Long)] = Seq(
        "q_list_keys" -> (() => graft.operators.Listing.listKeys(sorted10,
          "vol1", "bucket3", "warehouse/N/", "warehouse/N/2", 100).count()),
        "q_filesize_histogram" -> (() =>
          graft.operators.Aggregates.fileSizeHistogram(sorted10).count()),
        // the declared query's own path: the shuffle-free sorted fold over
        // the (10×) key-sorted warehouse
        "q_ns_summary" -> (() =>
          graft.operators.Aggregates.nsSummarySorted(sorted10).count()),
        "q_snapshot_diff" -> (() => graft.operators.Joins.snapshotDiff(
          snap1, snap2).count()),
        "q_write_apply" -> (() =>
          graft.operators.CommitLog.appliedState(sorted10).count()),
        // the declared query's own path: winner-per-key as a shuffle-free
        // fold over the (10×) key-sorted warehouse
        "q_latest_version" -> (() =>
          graft.operators.Lifecycle.latestVersionWinsSorted(sorted10).count()),
        // data-plane tree build: chunk leaves scale 10× with the
        // namespace; reads the STORED nested table (the 1× query's shape)
        "q_merkle_reconcile" -> (() =>
          graft.operators.ClusterHealth.merkleReconcile(
            nested10, T.replicas(spark, sfDir)).count()),
        // deletion-plane folds: the txn population (the commit log's
        // DELETE branch) scales 10× with the namespace; the replica /
        // container dims stay broadcast
        "q_block_ack_fold" -> (() =>
          graft.operators.ClusterHealth.blockAckFold(sorted10,
            T.replicas(spark, sfDir)).count()),
        "q_blocks_pending_page" -> (() =>
          graft.operators.ClusterHealth.blocksPendingDeletionPage(sorted10,
            T.containersScm(spark, sfDir), 20000L, 40).count()),
        // ANN at 10× corpus: brute-force top-k is the honest LINEAR
        // baseline (O(corpus × queries), broadcast query side); the IVF
        // probe shows the indexed path's constant advantage (per-cell
        // probes over precomputed centroids)
        "q_ann_topk" -> (() =>
          graft.operators.Similarity.annTopK(emb10).count()),
        "q_ann_ivf" -> (() =>
          graft.operators.Similarity.annIvf(emb10,
            precomputedCentroids = Some(cents10)).count()))
      // three reps, report the best: the fresh probe JVM starts with a
      // cold JIT, and the per-row fold kernels (ns-summary, winner fold)
      // run 5-10× slower uncompiled — the warm rep is the plan's real
      // shape (same warm-numbers rule the base pass applies via warmup).
      // A GC between probes keeps a previous probe's garbage from
      // stalling the next one mid-measurement (observed 1.2 s vs 19.5 s
      // for the SAME warm fold when a collection landed inside it).
      // per-probe rep arrays ride into bench_out.json (sf1_reps) so a
      // regressed headline is attributable to code cost vs a GC/JIT
      // landing — the r9 fold-probe regression was undiagnosable from
      // the min alone (VERDICT r9 #2).
      // rows captured per rep and published (sf1_rows): a probe whose
      // row count DRIFTS between reps of the same plan has a
      // nondeterministic answer — that throws InvariantViolation and
      // fails the bench (VERDICT r12 #1). When a rep spread exceeds 3×,
      // up to 2 extra gc'd reps run (VERDICT r12 #2's auto-extension) —
      // the raw arrays still publish every landing.
      def timeAll(ps: Seq[(String, () => Long)],
                  repsOf: String => Int = _ => 3)
          : Seq[(String, Seq[Double], Long)] =
        ps.map { case (name, run) =>
          System.gc()
          val rowsSeen = scala.collection.mutable.ListBuffer.empty[Long]
          def rep(): Double = {
            val t0 = System.nanoTime()
            try rowsSeen += run()
            catch { case e: Throwable =>
              System.err.println(s"[bench] sf1:$name FAILED: ${e.getMessage}")
              spark.stop(); sys.exit(1)
            }
            secs(t0)
          }
          var reps = (1 to repsOf(name)).map(_ => rep()).toVector
          var extra = 0
          while (reps.max / reps.min > 3 && extra < 2) {
            System.gc(); reps :+= rep(); extra += 1
          }
          if (rowsSeen.distinct.size != 1)
            throw new InvariantViolation(
              s"sf1:$name row count drifted across reps: ${rowsSeen.toList}")
          (name, reps, rowsSeen.head)
        }
      // untimed warm pass of the stored 10× warehouse before the probe
      // block (VERDICT r10 #1): after the reorder that moved the timed
      // ingest to the END, the probes read a warehouse whose pages were
      // written once and never re-touched — q_ns_summary, the only probe
      // that folds the FULL warehouse row-by-row, swung 4.9-17 s on
      // unchanged code while every narrower probe sat at r8 levels. One
      // throwaway full-scan fold warms the page cache AND the fold
      // kernel's JIT the way the 5× rewrite loop used to; q_ns_summary
      // additionally runs 5 reps so a stray GC landing stays visible in
      // sf1_reps without owning the min.
      graft.operators.Aggregates.nsSummarySorted(sorted10).count()
      // window-noise indicator for the 10× probe block, timed right
      // before the first probe (codegen was warmed at scaleProbe entry)
      val sf1Calib = calibration(spark)
      val nsTimes = timeAll(probes,
        n => if (n == "q_ns_summary") 5 else 3)
      // 10× near-dup document corpus (T.docsScaled) for the dedup
      // probes, built AFTER the namespace probes so its shingle-heavy
      // synthesis can't dirty the heap the GC-sensitive folds above run
      // in (observed q_ns_summary 0.84 → 2.47 s with the build placed
      // before them); minhash bands are an ingest-time index (untimed,
      // like the IVF centroids).
      T.docsScaled(T.documents(spark, sfDir), 10)
        .write.mode("overwrite").parquet(wh10 + "/docs")
      val docs10 = spark.read.parquet(wh10 + "/docs")
      graft.operators.Dedup.minhashBands(docs10)
        .write.mode("overwrite").parquet(wh10 + "/bands")
      val bands10 = spark.read.parquet(wh10 + "/bands")
      // simhash signatures are an ingest artifact exactly like the bands
      // (stored here so the 10× and 100× probes measure the SAME shape —
      // the pair join over a stored signature table — and the decade
      // ratio is like-for-like)
      graft.operators.Dedup.simhash(docs10)
        .write.mode("overwrite").parquet(wh10 + "/sigs")
      val sigs10 = spark.read.parquet(wh10 + "/sigs")
      // dedup at 10× documents: the banded-LSH candidate join over the
      // prebuilt bands (Σ bucket², never n²), exact dedup's one hash
      // shuffle, and paragraph dedup's id-only global shuffle — the
      // three shapes the 100 TB question asks about
      val times = nsTimes ++ timeAll(Seq(
        "q_dedup_minhash_lsh" -> (() =>
          graft.operators.Dedup.lshPairsFromBands(bands10).count()),
        "q_dedup_exact" -> (() =>
          graft.operators.Dedup.exactDedup(docs10).count()),
        "q_paragraph_dedup" -> (() =>
          graft.operators.Dedup.paragraphDedup(docs10).count()),
        // simhash: the pigeonhole pair join over the stored signature
        // table — the fourth dedup shuffle shape, ingest topology
        "q_dedup_simhash" -> (() =>
          graft.operators.Dedup.simhashPairsFromSigs(sigs10).count())))
      // ---- streaming plane at 10×: bootstrap = full state rebuild from
      // a STORED CDC log (the checkpoint-loss availability gap the base
      // pass measures at 1× as stream_bootstrap_sec) — the last plane
      // without a measured decade. The log synthesis is ingest (the real
      // system RECEIVES the log; same rule as the 1× cdcLogDir fixture);
      // source = the stored 10× flat warehouse (scale10 would truncate
      // objectsMixed's 6-segment keys — state-rebuild cost scales with
      // rows, not key depth). One throwaway warm rebuild, then 3 gc'd
      // reps into fresh work dirs, each reclaimed after timing.
      graft.streaming.ChangeLog.events(sorted10)
        .write.mode("overwrite").parquet(wh10 + "/cdclog10")
      graft.streaming.ChangeStream.bootstrapViews(spark,
        wh10 + "/cdclog10", graft.core.TempDirs.create("graft_bs10w_"))
      val bs10Reps = (1 to 3).map { _ =>
        System.gc()
        val work = graft.core.TempDirs.create("graft_bs10_")
        val t0 = System.nanoTime()
        graft.streaming.ChangeStream.bootstrapViews(spark,
          wh10 + "/cdclog10", work)
        val t = secs(t0)
        graft.streaming.ChangeStream.deleteRecursively(
          java.nio.file.Paths.get(work))
        t
      }
      // ---- steady-state micro-batch at 10× (VERDICT r12 #4): one
      // 1000-event delta batch through applyDeltaBatch — the same merges
      // the stream's foreachBatch runs — against the bootstrapped 10×
      // state. Only touched (volume,bucket) partitions rewrite, so this
      // bounds the incremental-view plane's per-batch cost a decade up
      // (the 1× dual is stream_steady_batch_sec). 5 reps, second-smallest
      // (the 1× metric's exact statistic, so the ratio is honest).
      val steady10Work = graft.core.TempDirs.create("graft_sd10_")
      graft.streaming.ChangeStream.bootstrapViews(spark,
        wh10 + "/cdclog10", steady10Work)
      val delta10 = sorted10
        .orderBy("volume", "bucket", "key", "version", "data_size")
        .limit(1000)
      // the per-rep 10M seq offset must clear the bootstrapped state's
      // max seq, or the timed merges would sort BELOW existing state and
      // silently measure no-op batches
      val maxSeq10 = spark.read.parquet(wh10 + "/cdclog10")
        .agg(F.coalesce(F.max("seq"), F.lit(0L))).head().getLong(0)
      require(maxSeq10 < 10000000L,
        s"steady-batch seq offset (10M) does not clear the 10x log's " +
          s"max seq $maxSeq10")
      val sd10Reps = (0 until 5).map { i =>
        val batch = graft.streaming.ChangeLog.events(delta10)
          .withColumn("seq", F.col("seq") + 10000000L * (i + 1)).persist()
        batch.count()
        val tS = System.nanoTime()
        graft.streaming.ChangeStream.applyDeltaBatch(spark, steady10Work, batch)
        val t = secs(tS)
        batch.unpersist()
        t
      }
      val sd10Sec = sd10Reps.sorted.apply(1)
      graft.streaming.ChangeStream.deleteRecursively(
        java.nio.file.Paths.get(steady10Work))
      // timed ingest LAST: by now every probe has its number, so the
      // write passes' heap churn can no longer contaminate anything.
      // 5 reps (consecutive same-code runs drew 18.6 vs 31.4 s 3-rep
      // medians from page-cache/GC state), median headline, raw reps in
      // the JSON.
      val ingestReps = (1 to 5).map { _ => System.gc(); ingestOnce() }
      val ingestSec = ingestReps.sorted.apply(2)
      // ---- ANSWER invariants at 10× (VERDICT r12 #1): the timed probes
      // verify COST; these verify the RESULT by canon-comparing each
      // flagship fold against an independent dual plan (disjoint
      // execution path — sorted fold vs groupBy, window vs max_by
      // aggregate, full-outer vs anti/inner joins). Untimed, run after
      // every sf1 number is in. A mismatch throws and fails the bench.
      // Warehouse AND snapshot frames re-read FRESH — the ingest reps
      // above just overwrote those dirs, so the earlier sorted10/snap
      // frames hold stale file listings.
      def canonPair(name: String, probePlan: => org.apache.spark.sql.DataFrame,
                    dualPlan: => org.apache.spark.sql.DataFrame,
                    scale: String): (String, String) = {
        val sa = canonSig(probePlan)
        val sb = canonSig(dualPlan)
        if (sa != sb) throw new InvariantViolation(
          s"$scale canon mismatch $name: probe plan $sa vs dual plan $sb")
        name -> sa
      }
      val sorted10f = spark.read.parquet(wh10 + "/objects")
      val snap1f = spark.read.parquet(wh10 + "/snap1")
      val snap2f = spark.read.parquet(wh10 + "/snap2")
      val canon10 = Seq(
        canonPair("q_ns_summary",
          graft.operators.Aggregates.nsSummarySorted(sorted10f),
          graft.operators.Aggregates.nsSummary(sorted10f), "sf1"),
        canonPair("q_latest_version",
          graft.operators.Lifecycle.latestVersionWinsSorted(sorted10f),
          graft.operators.Lifecycle.latestVersionWins(sorted10f), "sf1"),
        canonPair("q_snapshot_diff",
          graft.operators.Joins.snapshotDiff(snap1f, snap2f),
          graft.operators.Joins.snapshotDiffDual(snap1f, snap2f), "sf1"),
        canonPair("q_write_apply",
          graft.operators.CommitLog.appliedState(sorted10f),
          graft.operators.CommitLog.appliedStateAggDual(sorted10f), "sf1"))
      // ---- 100× (sf10) block: one more measured decade, now spanning
      // READ (ns-summary fold, winner-per-key fold), WRITE (commit-log
      // apply, snapshot full-outer diff, merkle tree build) and DEDUP
      // (banded-LSH candidate join, keep-one selection, end-to-end
      // funnel) — VERDICT r11 #3/#5: the write plane and the keep/funnel
      // stages previously had only 10× evidence. Runs LAST so its churn
      // cannot contaminate any earlier number; builds are reported
      // separately (sf10_build_sec keeps its r11 warehouse+bands meaning;
      // the new dedup verification index and nested-attribute store get
      // their own keys), every probe plan gets an untimed warm pass, 3
      // reps with inter-probe GC. Failures degrade to a JSON note —
      // never the bench rc.
      val sf10Json: String = try {
        // the 100× warehouse derives from the STORED 10× one (cheaper
        // input than re-running the 4-scan synthesis) but keeps the
        // ingest's repartition(volume,bucket) + local sort: ONE file
        // per (volume,bucket) dir is what guarantees the read-back
        // partitions hold sorted runs. (A shuffle-free variant was
        // tried and rejected: per-task files of the same dir carry
        // OVERLAPPING key ranges — appending the rep digit to segment
        // 3 is not order-preserving across splits — and Spark's file
        // packing can concatenate two same-dir files out of order in
        // one partition, tripping the folds' sorted-input check.)
        // object_id algebra: applying the replica-above-low-digits map
        // twice stays injective (id%100 is preserved both times; r1 then
        // r2 stack above it), and the tens digit — the commit log's
        // churn key — survives to 100×, so every log branch scales.
        val tB = System.nanoTime()
        scale10(spark.read.parquet(wh10 + "/objects"))
          .repartition(F.col("volume"), F.col("bucket"))
          .sortWithinPartitions(F.col("volume"), F.col("bucket"),
            F.col("key"))
          .write.partitionBy("volume", "bucket").mode("overwrite")
          .parquet(wh10 + "/objects100")
        val sorted100 = spark.read.parquet(wh10 + "/objects100")
        // 100× near-dup document corpus + its ingest-time band index
        T.docsScaled(T.documents(spark, sfDir), 100)
          .write.mode("overwrite").parquet(wh10 + "/docs100")
        graft.operators.Dedup.minhashBands(
            spark.read.parquet(wh10 + "/docs100"))
          .write.mode("overwrite").parquet(wh10 + "/bands100")
        val docs100 = spark.read.parquet(wh10 + "/docs100")
        val bands100 = spark.read.parquet(wh10 + "/bands100")
        val buildSec = secs(tB)
        // write-plane inputs: the snapshot checkpoint PAIR is a stored
        // artifact (a cluster diffs STORED checkpoints — same reasoning
        // as the 10× ingest's snap1/snap2), derived from the stored 10×
        // pair rather than re-running the 1× synthesis ×100. Read the
        // dirs FRESH: the timed ingest reps just overwrote them, so the
        // earlier snap1/snap2 frames hold stale file listings.
        // sf10_aux_build_sec covers the remaining 100× ingest artifacts
        // (snapshot pair + embedding corpus + IVF centroids) so no build
        // goes unreported — a regression in any of them must be visible
        // in the published JSON, not silently absorbed.
        val tAux1 = System.nanoTime()
        scale10(spark.read.parquet(wh10 + "/snap1"))
          .write.mode("overwrite").parquet(wh10 + "/snap1_100")
        scale10(spark.read.parquet(wh10 + "/snap2"))
          .write.mode("overwrite").parquet(wh10 + "/snap2_100")
        var auxBuildSec = secs(tAux1)
        val snap1c = spark.read.parquet(wh10 + "/snap1_100")
        val snap2c = spark.read.parquet(wh10 + "/snap2_100")
        // nested attribute store at 100× (merkle's input; stored for the
        // same reason as the sf1 probe's /nested — the synthesis is
        // ingest, the fold is the query)
        val tN100 = System.nanoTime()
        T.nestedFrom(sorted100).write.mode("overwrite")
          .parquet(wh10 + "/nested100")
        val nested100BuildSec = secs(tN100)
        val nested100 = spark.read.parquet(wh10 + "/nested100")
        // dedup verification index at 100×: LSH candidates → exact
        // n-gram-jaccard verify → cluster assignment, the same two
        // ingest-time artifacts the 1× pipeline memoizes (pairs,
        // clusters). The clique-heavy synthetic corpus (every doc cloned
        // ×100 as near-dups) makes this the family's worst case:
        // candidate pairs grow ~quadratically in clique size, so the
        // verification join and the label-propagation fixpoint both see
        // ~100× the 10× edge volume. Timed as its own build key.
        val tD = System.nanoTime()
        graft.operators.Dedup.ngramJaccardPairs(docs100,
            candidates = Some(
              graft.operators.Dedup.lshPairsFromBands(bands100)))
          .write.mode("overwrite").parquet(wh10 + "/pairs100")
        graft.operators.Dedup.dupClusters(docs100.select("doc_id"),
            spark.read.parquet(wh10 + "/pairs100"))
          .write.mode("overwrite").parquet(wh10 + "/clusters100")
        val dedupBuildSec = secs(tD)
        val clusters100 = spark.read.parquet(wh10 + "/clusters100")
        // simhash signatures at 100× are an ingest artifact exactly like
        // the band index (one pass of the native expression over the
        // stored corpus); the 100× simhash probe moves IN-BAND over this
        // stored table (VERDICT r12 #3) — the one probe that once hit a
        // genuine scale cliff belongs in the published artifact
        val tSh = System.nanoTime()
        graft.operators.Dedup.simhash(docs100)
          .write.mode("overwrite").parquet(wh10 + "/sigs100")
        val simhashBuildSec = secs(tSh)
        val sigs100 = spark.read.parquet(wh10 + "/sigs100")
        // 100× embedding corpus + IVF index (ingest artifacts, mirroring
        // the sf1 block) — one more decade for the ANN pair: brute top-k
        // is the honest linear baseline, IVF shows the indexed path's
        // advantage compounding with corpus size
        val tAux2 = System.nanoTime()
        T.embScaled(T.embeddings(spark, sfDir), 100)
          .write.mode("overwrite").parquet(wh10 + "/emb100")
        val emb100 = spark.read.parquet(wh10 + "/emb100")
        graft.operators.Similarity.ivfCentroids(
            graft.operators.Similarity.quantized(emb100))
          .write.mode("overwrite").parquet(wh10 + "/cents100")
        val cents100 = spark.read.parquet(wh10 + "/cents100")
        // the 100× CDC log is the streaming plane's durable INPUT (same
        // fixture rule as the 1×/10× logs) — stored here so the timed
        // bootstrap reps below measure state REBUILD, not log synthesis
        graft.streaming.ChangeLog.events(sorted100)
          .write.mode("overwrite").parquet(wh10 + "/cdclog100")
        auxBuildSec += secs(tAux2)
        val probes100: Seq[(String, () => Long)] = Seq(
          // the two scan shapes whose 100 TB claim is O(page) / O(one
          // pruned column): both read the stored 100× warehouse, no
          // extra build — completing their measured decades
          "q_list_keys" -> (() => graft.operators.Listing.listKeys(
            sorted100, "vol1", "bucket3", "warehouse/N/", "warehouse/N/2",
            100).count()),
          "q_filesize_histogram" -> (() => graft.operators.Aggregates
            .fileSizeHistogram(sorted100).count()),
          "q_ns_summary" -> (() =>
            graft.operators.Aggregates.nsSummarySorted(sorted100).count()),
          "q_latest_version" -> (() => graft.operators.Lifecycle
            .latestVersionWinsSorted(sorted100).count()),
          "q_write_apply" -> (() =>
            graft.operators.CommitLog.appliedState(sorted100).count()),
          "q_snapshot_diff" -> (() =>
            graft.operators.Joins.snapshotDiff(snap1c, snap2c).count()),
          "q_merkle_reconcile" -> (() =>
            graft.operators.ClusterHealth.merkleReconcile(nested100,
              T.replicas(spark, sfDir)).count()),
          "q_dedup_minhash_lsh" -> (() =>
            graft.operators.Dedup.lshPairsFromBands(bands100).count()),
          // the other two 10×-proven dedup shuffle shapes, re-measured a
          // decade up over the same stored corpus (no extra build): one
          // 16-byte-hash shuffle / one id-only global shuffle
          "q_dedup_exact" -> (() =>
            graft.operators.Dedup.exactDedup(docs100).count()),
          "q_paragraph_dedup" -> (() =>
            graft.operators.Dedup.paragraphDedup(docs100).count()),
          // simhash at 100×, in-band over the STORED signature table
          // (the ingest topology; signature synthesis is
          // sf10_simhash_build_sec): the clique corpus leaves 174k
          // DISTINCT perturbed signatures whose corpus-correlated bits
          // share degenerate chunk buckets — the distinct-SIGNATURE join
          // is output-bound there (~49 s quiet for 22.6M pairs), the
          // corpus's worst case, and exactly the probe that once hit a
          // real cliff, so it stays in the published artifact
          "q_dedup_simhash" -> (() =>
            graft.operators.Dedup.simhashPairsFromSigs(sigs100).count()),
          "q_dedup_keep" -> (() =>
            graft.operators.Dedup.keepOneSelection(clusters100,
              graft.operators.TextAnalysis.qualityScore(docs100)).count()),
          // the declared query's own operator body over the 100× corpus
          "q_dedup_funnel" -> (() => graft.operators.Dedup.dedupFunnel(
            T.docUrlsFrom(docs100), clusters100,
            graft.operators.TextAnalysis.qualityScore(docs100)).count()),
          // the 100 TB ingest topology at 100×: a batch (1/7 of the
          // corpus) probes the PERSISTED band index — hash(batch) +
          // banded probe, never O(corpus)
          "q_dedup_incremental" -> (() =>
            graft.operators.Dedup.incrementalDedup(
              bands100.filter(F.col("doc_id") % 7 === 0),
              bands100.filter(F.col("doc_id") % 7 =!= 0)).count()),
          "q_ann_topk" -> (() =>
            graft.operators.Similarity.annTopK(emb100).count()),
          "q_ann_ivf" -> (() =>
            graft.operators.Similarity.annIvf(emb100,
              precomputedCentroids = Some(cents100)).count()))
        // EVERY probe plan gets an untimed warm pass (not just the
        // first): the ~5 min build leaves 60M-row-inflation garbage in
        // the heap and each fold kernel pays its own JIT — an unwarmed
        // plan's rep-1 read 35 s for a 5 s fold. Two GCs first give the
        // collector a chance to actually reclaim the build debris.
        System.gc(); System.gc()
        probes100.foreach { case (_, run) => run() }
        // window-noise indicator for the 100× probe block, timed after
        // the warm pass so it reads the same window the reps do
        val sf10Calib = calibration(spark)
        // local rep loop (not timeAll): an sf10 ENVIRONMENT failure must
        // degrade, not sys.exit the bench — but rows drift across reps
        // of one plan is an ANSWER failure and throws InvariantViolation
        // (rethrown past the NonFatal catch below). Same 3×-spread
        // auto-extension as the sf1 block.
        val t100 = probes100.map { case (name, run) =>
          System.gc()
          val rowsSeen = scala.collection.mutable.ListBuffer.empty[Long]
          def rep(): Double = {
            val t0 = System.nanoTime(); rowsSeen += run(); secs(t0)
          }
          var reps = (1 to 3).map(_ => rep()).toVector
          var extra = 0
          while (reps.max / reps.min > 3 && extra < 2) {
            System.gc(); reps :+= rep(); extra += 1
          }
          if (rowsSeen.distinct.size != 1)
            throw new InvariantViolation(
              s"sf10:$name row count drifted across reps: ${rowsSeen.toList}")
          (name, reps, rowsSeen.head)
        }
        // ---- streaming bootstrap at 100× (VERDICT r12 #4): full-state
        // rebuild from the stored 100× CDC log — the checkpoint-loss
        // availability gap's second measured decade. Timed AFTER the
        // probe reps so its write churn can't contaminate them.
        val bs100Warm = graft.core.TempDirs.create("graft_bs100w_")
        graft.streaming.ChangeStream.bootstrapViews(spark,
          wh10 + "/cdclog100", bs100Warm)
        // reclaim the warm state immediately — a full 100× state left on
        // disk for the rest of the run competes with the timed passes
        graft.streaming.ChangeStream.deleteRecursively(
          java.nio.file.Paths.get(bs100Warm))
        val bs100Reps = (1 to 3).map { _ =>
          System.gc()
          val work = graft.core.TempDirs.create("graft_bs100_")
          val t0 = System.nanoTime()
          graft.streaming.ChangeStream.bootstrapViews(spark,
            wh10 + "/cdclog100", work)
          val t = secs(t0)
          graft.streaming.ChangeStream.deleteRecursively(
            java.nio.file.Paths.get(work))
          t
        }
        // ---- ANSWER invariants at 100× (VERDICT r12 #1), untimed, last:
        // the same four canon duals as the sf1 block, plus conservation
        // identities over the dedup family — arithmetic the folds must
        // satisfy, derived through independent SQL expressions
        val canon100 = Seq(
          canonPair("q_ns_summary",
            graft.operators.Aggregates.nsSummarySorted(sorted100),
            graft.operators.Aggregates.nsSummary(sorted100), "sf10"),
          canonPair("q_latest_version",
            graft.operators.Lifecycle.latestVersionWinsSorted(sorted100),
            graft.operators.Lifecycle.latestVersionWins(sorted100), "sf10"),
          canonPair("q_snapshot_diff",
            graft.operators.Joins.snapshotDiff(snap1c, snap2c),
            graft.operators.Joins.snapshotDiffDual(snap1c, snap2c), "sf10"),
          canonPair("q_write_apply",
            graft.operators.CommitLog.appliedState(sorted100),
            graft.operators.CommitLog.appliedStateAggDual(sorted100),
            "sf10"))
        val rows100 = t100.map { case (n, _, r) => n -> r }.toMap
        def conserve(name: String, got: Long, want: Long,
                     what: String): Unit =
          if (got != want) throw new InvariantViolation(
            s"sf10 conservation $name: $what — got $got, want $want")
        // every doc carries exactly one cluster label and one keep/drop
        // decision; exactly one KEEP per cluster; every doc gets one
        // funnel verdict
        val docCount100 = docs100.count()
        conserve("q_dedup_keep", rows100("q_dedup_keep"), docCount100,
          "one decision per corpus doc")
        conserve("q_dedup_funnel", rows100("q_dedup_funnel"), docCount100,
          "one verdict per corpus doc")
        val clusterCount100 =
          clusters100.select("cluster_id").distinct().count()
        conserve("q_dedup_keep",
          graft.operators.Dedup.keepOneSelection(clusters100,
              graft.operators.TextAnalysis.qualityScore(docs100))
            .filter(F.col("decision") === "KEEP").count(),
          clusterCount100, "exactly one KEEP per cluster")
        // diff classification arithmetic: CREATE − DELETE must equal the
        // snapshots' cardinality delta (object_id unique per snapshot)
        val byType = graft.operators.Joins.snapshotDiff(snap1c, snap2c)
          .groupBy("diff_type").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        conserve("q_snapshot_diff",
          byType.getOrElse("CREATE", 0L) - byType.getOrElse("DELETE", 0L),
          snap2c.count() - snap1c.count(),
          "CREATE - DELETE == |snap2| - |snap1|")
        // ns-summary top-level rollup: every key with >=1 ancestor dir
        // lands in exactly one top-level dir's recursive num_files
        // coalesce: an EMPTY fold result must fail as a conservation
        // mismatch (0 != want), not as an NPE that NonFatal would
        // misclassify as an environment error
        conserve("q_ns_summary",
          graft.operators.Aggregates.nsSummarySorted(sorted100)
            .filter(!F.col("dir").contains("/"))
            .agg(F.coalesce(F.sum("num_files"), F.lit(0L))).head().getLong(0),
          sorted100.filter(F.size(F.split(F.col("key"), "/")) >= 2).count(),
          "top-level num_files == multi-segment key count")
        // winner fold: one row per distinct (volume, bucket, 3-segment
        // logical key) — the fold's grouping key, re-derived via SQL
        conserve("q_latest_version", rows100("q_latest_version"),
          sorted100.select(F.col("volume"), F.col("bucket"),
              F.expr("concat_ws('/', slice(split(key, '/'), 1, 3))"))
            .distinct().count(),
          "one winner per distinct logical key")
        val m10 = t100.map { case (k, v, _) => s"\"" + k + "\":" + v.min }
          .mkString("{", ",", "}")
        val m10r = t100.map { case (k, v, _) =>
          s"\"" + k + "\":" + v.mkString("[", ",", "]")
        }.mkString("{", ",", "}")
        val m10rows = t100.map { case (k, _, r) => s"\"" + k + "\":" + r }
          .mkString("{", ",", "}")
        val m10canon = canon100.map { case (k, v) =>
          s"\"" + k + "\":\"" + v + "\""
        }.mkString("{", ",", "}")
        s""","sf10":$m10,"sf10_reps":$m10r,"sf10_rows":$m10rows,""" +
          s""""sf10_canon":$m10canon,""" +
          s""""sf10_calibration_sec":$sf10Calib,""" +
          s""""sf10_stream_bootstrap_sec":${bs100Reps.min},""" +
          s""""sf10_stream_bootstrap_reps":${
            bs100Reps.mkString("[", ",", "]")},""" +
          s""""sf10_build_sec":$buildSec,""" +
          s""""sf10_dedup_build_sec":$dedupBuildSec,""" +
          s""""sf10_simhash_build_sec":$simhashBuildSec,""" +
          s""""sf10_nested_build_sec":$nested100BuildSec,""" +
          s""""sf10_aux_build_sec":$auxBuildSec"""
      } catch {
        // an ANSWER invariant failure must fail the bench (non-zero rc),
        // never degrade to a JSON note like environment errors
        case iv: InvariantViolation => throw iv
        // NonFatal only: an OOM/VM error must crash the bench honestly,
        // not emit JSON from a corrupted JVM
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] sf10 block failed: ${e.getMessage}")
          s""","sf10_error":"${e.getClass.getSimpleName}""""
      }
      val m = times.map { case (k, v, _) => s"\"" + k + "\":" + v.min }
        .mkString("{", ",", "}")
      val mReps = times.map { case (k, v, _) =>
        s"\"" + k + "\":" + v.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val mRows = times.map { case (k, _, r) => s"\"" + k + "\":" + r }
        .mkString("{", ",", "}")
      val mCanon = canon10.map { case (k, v) =>
        s"\"" + k + "\":\"" + v + "\""
      }.mkString("{", ",", "}")
      // the 10x warehouse is probe-only — reclaim it before reporting
      graft.streaming.ChangeStream.deleteRecursively(
        java.nio.file.Paths.get(wh10))
      spark.stop()
      // raw doubles like every other number here — an f"%.2f" interpolator
      // renders a decimal COMMA under comma-locales and corrupts the JSON
      val repsJson = ingestReps.mkString("[", ",", "]")
      val frag = s""","sf1":$m,"sf1_reps":$mReps,"sf1_rows":$mRows,""" +
        s""""sf1_canon":$mCanon,""" +
        s""""sf1_calibration_sec":$sf1Calib,""" +
        s""""sf1_ingest_sec":$ingestSec,"sf1_ingest_reps":$repsJson,""" +
        s""""sf1_nested_build_sec":$nestedBuildSec,""" +
        s""""sf1_stream_bootstrap_sec":${bs10Reps.min},""" +
        s""""sf1_stream_bootstrap_reps":${
          bs10Reps.mkString("[", ",", "]")},""" +
        s""""sf1_stream_steady_batch_sec":$sd10Sec,""" +
        s""""sf1_stream_steady_reps":${
          sd10Reps.mkString("[", ",", "]")}""" +
        sf10Json
      (frag, times.map { case (k, v, _) => k -> v.min }.toMap)
  }
}
