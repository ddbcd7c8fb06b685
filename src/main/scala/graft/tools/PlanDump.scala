package graft.tools

/** Dev-only: print the executed plan of named declared queries (after one
  * run, so AQE's final plan is shown) with a one-line summary of the join
  * and exchange operators. Usage:
  * runMain graft.tools.PlanDump [sfDir] q1,q2[,...] [full] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = args(1).split(",").toSeq
    val full = args.length > 2 && args(2) == "full"
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    for (name <- names; fn <- graft.SparkEntry.queries.get(name)) {
      val df = fn(spark, sfDir)
      df.count() // materialize so AQE finalizes
      val plan = df.queryExecution.executedPlan.toString
      val ops = plan.linesIterator.map(_.trim.stripPrefix("+- ")
          .stripPrefix("*(").dropWhile(_.isDigit).stripPrefix(") "))
        .filter(l => l.startsWith("BroadcastHashJoin") ||
          l.startsWith("SortMergeJoin") || l.startsWith("ShuffledHashJoin") ||
          l.startsWith("CartesianProduct") ||
          l.startsWith("BroadcastNestedLoopJoin") || l.startsWith("Exchange"))
        .map(_.takeWhile(_ != '[')).toSeq
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      println(s"[plan] $name :: ${ops.mkString(", ")}")
      if (full) println(plan)
    }
    spark.stop()
  }
}
