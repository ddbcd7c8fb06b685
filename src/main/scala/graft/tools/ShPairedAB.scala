package graft.tools

import org.apache.spark.sql.{functions => F}

/** Dev-only A/B for the simhash degeneracy fallback (VERDICT r14 #2):
  * a synthetic TEMPLATED corpus — every signature shares one
  * boilerplate-forced low 15-bit chunk (the corpus-correlated-bits
  * failure mode simhashDegeneracy's trigger watches for), high 45 bits
  * pseudo-random, plus planted near-dup clones at hamming ≤ 3. The
  * single-chunk (4×15) pigeonhole collapses one bucket toward the whole
  * corpus (raw pairs ~ C(n,2)); the chunk-pair (6×10) keys split it by
  * the co-chunk's entropy. Prints both plans' raw-pair bounds, measured
  * wall, and asserts identical output pair counts. Usage:
  *   runMain graft.tools.ShPairedAB [nSigs] (default 60000). */
object ShPairedAB {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val D = graft.operators.Dedup
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    // templated 60-bit sigs: bits 0-14 constant boilerplate, bits 15-59
    // from xxhash64(id); distinct() drops rare hash collisions
    val template = 0x5AB3L // 15 bits
    val base = spark.range(n).select(F.col("id").as("doc_id"),
      F.expr(s"(shiftleft(xxhash64(id) & ${(1L << 45) - 1}, 15))" +
        s" | $template").as("simhash"))
    // planted near-dups: every 100th doc gets a clone with bits 20/33/47
    // flipped (hamming 3, all in the high region)
    val planted = base.filter(F.col("doc_id") % 100 === 0)
      .select((F.col("doc_id") + 1000000000L).as("doc_id"),
        F.expr("simhash ^ (shiftleft(1L, 20) | shiftleft(1L, 33) |" +
          " shiftleft(1L, 47))").as("simhash"))
    val sh = base.unionByName(planted).localCheckpoint()
    val rawSingle = D.simhashChunkStats(sh)
      .agg(F.sum(F.expr("n_sigs * (n_sigs - 1) DIV 2"))).head().getLong(0)
    val rawPaired = D.simhashPairedChunkStats(sh)
      .agg(F.sum(F.expr("n_sigs * (n_sigs - 1) DIV 2"))).head().getLong(0)
    val deg = D.simhashDegeneracy(sh).head()
    println(s"[ab] sigs=${sh.count()} raw_single=$rawSingle " +
      s"raw_paired=$rawPaired (${rawSingle / math.max(rawPaired, 1)}x) " +
      s"ratio_x1000=${deg.getLong(3)} (trigger 10000)")
    def time(label: String, f: => Long): Long = {
      var rows = 0L
      val reps = (1 to 2).map { _ =>
        System.gc(); val t0 = System.nanoTime(); rows = f; secs(t0)
      }
      println(f"[ab] $label%-12s min=${reps.min}%.2f s " +
        s"reps=${reps.mkString("[", ",", "]")} rows=$rows")
      rows
    }
    val single = time("single-chunk", D.simhashPairsFromSigs(sh).count())
    val paired = time("chunk-pair", D.simhashPairsFromSigsPaired(sh).count())
    require(single == paired,
      s"pair-count mismatch: single=$single paired=$paired")
    println(s"[ab] outputs agree: $single pairs")
    spark.stop()
  }
}
