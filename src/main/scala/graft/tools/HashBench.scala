package graft.tools

import org.apache.spark.sql.{functions => F}

/** Dev-only: A/B the native graft_hash60 expression against the
  * hex-prefix SQL chain it replaced (20M synthetic shingles, min-of-3
  * warm). r12 reading on this host: native 0.44 s vs chain 1.05 s —
  * 2.4× on the kernel; the win lands in the ingest-time band builds
  * (hash per shingle), not the join-dominated sweep queries. */
object HashBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    val df = spark.range(20000000L)
      .select(F.concat(F.lit("shingle token "),
        F.col("id").cast("string")).as("s"))
    def time(label: String, c: String): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(F.expr(c).as("h")).agg(F.expr("bit_xor(h)")).head
        secs(t0)
      }
      println(f"[hb] $label ${reps.min}%.2f s (reps ${
        reps.map(r => f"$r%.2f").mkString(", ")})")
    }
    time("native graft_hash60", "graft_hash60(s)")
    time("sql md5/conv chain ",
      "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)")
    time("native graft_hash60", "graft_hash60(s)")
    spark.stop()
  }
}
