package graft

/** Scratch timing harness: `sbt "Test/runMain graft.TimeQ q1 q2 ..."`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_list_keys")
    for (q <- names; i <- 1 to 2) {
      val t0 = System.nanoTime
      SparkEntry.queries(q)(spark, d).count()
      println(f"TIMING $q run$i ${(System.nanoTime - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
