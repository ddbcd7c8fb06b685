package graft

/**
 * Global physical-plan invariant over EVERY declared query: no
 * CartesianProduct anywhere. Every cross join in the engine is against a
 * broadcast singleton/aggregate (BroadcastNestedLoopJoin with a one-row
 * build side) — an unhinted CartesianProduct is the one operator that is
 * always a scale bug at 100 TB, so a regression anywhere in the declared
 * query surface (every SparkEntry.queries entry, whatever its current
 * count) fails here. Plan-only (no execution): the initial physical plan
 * already shows the join strategy.
 */
class ScalePlanSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("no declared query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
      if (plan.contains("CartesianProduct") ||
        plan.startsWith("PLANNING FAILED")) Some(name -> plan.take(120))
      else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct / planning failure in: ${offenders.keys.toSeq.sorted}")
  }
}
