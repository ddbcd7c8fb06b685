package graft.tools

import org.apache.spark.sql.functions.col

/** Dev-only: decompose the 100× verified-incremental-jaccard probe
  * (sf10_* q_dedup_incremental_verify) into its stages so optimization
  * effort lands on the dominant one. Builds the same stored artifacts
  * BenchCache does (corpus dict + encoded sets over the doc_id % 7 != 0
  * slice), then times, warm (2 reps each, both printed):
  *   cands  — batch minhash bands × stored band index (candidate pairs)
  *   ext    — monotone dictionary extension (anti-join on term strings)
  *   enc    — batch set encode against the extended dictionary
  *   verify — the full incrementalJaccardVerify (all of the above plus
  *            the two set-attach joins and the jaccard filter)
  * Usage: runMain graft.tools.IncVerifyProbe <sfDir> [mult] */
object IncVerifyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val T = graft.core.Tables
    val D = graft.operators.Dedup
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val wh = graft.core.TempDirs.create("graft_incv_")
    T.docsScaled(T.documents(spark, sfDir), mult)
      .write.mode("overwrite").parquet(wh + "/docs")
    val docs = spark.read.parquet(wh + "/docs")
    D.minhashBands(docs).write.mode("overwrite").parquet(wh + "/bands")
    val bands = spark.read.parquet(wh + "/bands")
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val t0 = System.nanoTime()
    D.ngramDictionary(corpus).write.mode("overwrite").parquet(wh + "/dict")
    val dict = spark.read.parquet(wh + "/dict")
    D.ngramSets(corpus, dict).write.mode("overwrite").parquet(wh + "/sets")
    val sets = spark.read.parquet(wh + "/sets")
    println(f"[incv] corpus dict+sets build ${secs(t0)}%.2f s " +
      s"(dict ${dict.count()} terms, sets ${sets.count()} docs)")
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val corpusBands = bands.filter(col("doc_id") % 7 =!= 0)
    def time2(label: String)(body: => Long): Unit = {
      val r = (1 to 2).map { _ =>
        val t = System.nanoTime(); val n = body; (secs(t), n)
      }
      println(f"[incv] $label%-8s ${r(0)._1}%.2f ${r(1)._1}%.2f s " +
        s"(rows ${r(0)._2})")
    }
    time2("cands") {
      val nb = D.minhashBands(batch)
      nb.as("n").join(corpusBands.as("c"),
          col("n.band") === col("c.band") && col("n.sig") === col("c.sig"))
        .select(col("n.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"))
        .distinct().count()
    }
    time2("ext") { D.ngramDictExtended(dict, batch).count() }
    time2("enc") {
      D.ngramSets(batch, D.ngramDictExtended(dict, batch)).count()
    }
    time2("verify") {
      D.incrementalJaccardVerify(batch, corpusBands, sets, dict).count()
    }
    spark.stop()
  }
}
