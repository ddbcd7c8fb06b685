package graft.tools

import org.apache.spark.sql.{functions => F}

/** Dev-only: A/B the native one-pass graft_minhash16 signature against
  * the explode + 16 min() aggregate form it replaced, on the 100× scaled
  * document corpus (the band-index ingest's input — ~75M bigram shingles
  * across 500k docs at sf0.1×100). Both forms share the docsScaled
  * synthesis read from parquet; min-of-3 warm per form. */
object MhBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 100
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val T = graft.core.Tables
    val wh = graft.core.TempDirs.create("graft_mhb_")
    T.docsScaled(T.documents(spark, sfDir), mult)
      .write.mode("overwrite").parquet(wh + "/docs")
    val docs = spark.read.parquet(wh + "/docs")
      .withColumn("norm",
        F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")))
      .withColumn("ws", F.split(F.col("norm"), " "))
      .filter(F.size(F.col("ws")) >= 2)
      .select("doc_id", "ws")
    import graft.functions.TextFns.{P, permA, permB}
    val sqlMins = (0 until 16).map(i =>
      F.min(F.expr(s"(${permA(i)} * hmod + ${permB(i)}) % $P")).as(s"mh$i"))
    def viaExplode() = docs
      .withColumn("s", F.explode(F.expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> array_join(slice(ws, i + 1, 2), ' '))")))
      .withColumn("hmod", F.expr(s"graft_hash60(s) % $P"))
      .groupBy("doc_id").agg(sqlMins.head, sqlMins.tail: _*)
      .agg(F.sum("mh0")).head
    def viaNative() = docs
      .withColumn("mh", F.call_function("graft_minhash16", F.col("ws")))
      .select(F.element_at(F.col("mh"), 1).as("mh0"))
      .agg(F.sum("mh0")).head
    def time(label: String, run: () => Any): Unit = {
      run() // warm
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); secs(t0)
      }
      println(f"[mh] $label ${reps.min}%.2f s (reps ${
        reps.map(r => f"$r%.2f").mkString(", ")})")
    }
    time("native graft_minhash16   ", () => viaNative())
    time("explode + 16 min() aggs  ", () => viaExplode())
    time("native graft_minhash16   ", () => viaNative())
    graft.streaming.ChangeStream.deleteRecursively(
      java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
