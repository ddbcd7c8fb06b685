package graft.tools

/** Dev-only: time a named subset of declared queries (warm, 2 passes) to
  * decide where a perf pass pays. Usage: runMain graft.tools.HotProbe
  * [sfDir] [q1,q2,...] — defaults to the round-4 bench's slowest set. */
object HotProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
    else Seq("q_write_apply", "q_locations_explode", "q_fso_resolve",
      "q_latest_version", "q_ann_ivf", "q_ann_pq", "q_prefix_acl",
      "q_snapshot_diff_summary", "q_fso_list_status_deep",
      "q_list_objects_pages", "q_typed_filesize", "q_layout_union",
      "q_fso_list_status", "q_snapshot_diff")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    graft.SparkEntry.entry(spark).count()  // session warmup
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      sys.error(s"unknown queries: ${unknown.mkString(", ")}")
    for (name <- names; fn <- graft.SparkEntry.queries.get(name)) {
      val t0 = System.nanoTime(); val n = fn(spark, sfDir).count()
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      println(f"[hot] $name%-28s cold=${secs(t0) - secs(t1)}%.2f warm=${secs(t1)}%.2f s rows=$n")
    }
    spark.stop()
  }
}
