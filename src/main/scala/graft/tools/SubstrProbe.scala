package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose q_substr_spans (Dedup.duplicateSpans) and A/B the
  * candidate single-pass rewrite (VERDICT r15 #3). The shipped form
  * evaluates the posexplode'd (doc, pos, gram) frame TWICE — a count
  * aggregate to find duplicated grams, then a semi-join of the same
  * frame back against them; the candidate folds both into ONE
  * collect_list aggregation per gram (one corpus scan, one shuffle),
  * trading flat rows for a per-gram occurrence array. Stages timed warm
  * (2 reps each, rows printed so the forms are provably equivalent):
  *   occ     — one posexplode pass alone (the scan cost both forms pay)
  *   dupcnt  — the count-aggregate half of the shipped form
  *   current — full shipped duplicateSpans
  *   onepass — full single-pass variant (collect_list + explode back)
  *   pinned  — shipped form over a persisted occ (re-scan vs pin)
  * Usage: runMain graft.tools.SubstrProbe <sfDir> [mult] [k]
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 1
    val k = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val T = graft.core.Tables
    val D = graft.operators.Dedup
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val wh = graft.core.TempDirs.create("graft_substr_")
    try {
      val src =
        if (mult == 1) T.documents(spark, sfDir)
        else T.docsScaled(T.documents(spark, sfDir), mult)
      src.write.mode("overwrite").parquet(wh + "/docs")
      val docs = spark.read.parquet(wh + "/docs")
      println(s"[substr] docs=${docs.count()} mult=$mult k=$k")
      def time2(label: String)(body: => Long): Unit = {
        val r = (1 to 2).map { _ =>
          System.gc()
          val t = System.nanoTime(); val n = body; (secs(t), n)
        }
        println(f"[substr] $label%-8s ${r(0)._1}%.2f ${r(1)._1}%.2f s " +
          s"(rows ${r(0)._2})")
      }
      def occ = D.wordGramOccurrences(docs, k)
      time2("occ") { occ.count() }
      time2("dupcnt") {
        occ.groupBy("gram").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).count()
      }
      time2("current") { D.duplicateSpans(docs, k).count() }
      time2("onepass") { D.duplicateSpansOnePass(docs, k).count() }
      time2("pinned") {
        val p = occ.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val dupGrams = p.groupBy("gram")
            .agg(count(lit(1)).as("occurrences"))
            .filter(col("occurrences") > 1).select("gram")
          p.join(dupGrams, Seq("gram"), "left_semi").count()
        } finally { p.unpersist(); () }
      }
      // equivalence: full output parity between the two forms
      val a = D.duplicateSpans(docs, k)
      val b = D.duplicateSpansOnePass(docs, k)
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"[substr] parity exceptAll diff=$diff (want 0)")
    } finally {
      graft.streaming.ChangeStream.deleteRecursively(
        java.nio.file.Paths.get(wh))
      spark.stop()
    }
  }
}
