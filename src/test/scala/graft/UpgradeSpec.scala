package graft

import graft.core.Tables
import graft.operators.Upgrade

/** Finalization checkpoint totality + the initFinalize refusal rungs. */
class UpgradeSpec extends SparkSpecBase {

  test("finalizationWalk: checkpoint totality, refusals, feature walk") {
    val got = Upgrade
      .finalizationWalk(Tables.finalizationComponents(spark, ""),
        Tables.layoutFeatures(spark, ""))
      .collect().map(r => r.getAs[Long]("comp_id") ->
        ((r.getAs[String]("checkpoint"), r.getAs[String]("init_verdict"),
          r.getAs[Long]("n_features"), r.getAs[Long]("target_mlv")))).toMap
    // every checkpoint appears exactly once per its (mark, mlv<slv) combo
    assert(got(1L)._1 === "FINALIZATION_REQUIRED")
    assert(got(2L)._1 === "FINALIZATION_STARTED")
    assert(got(3L)._1 === "MLV_EQUALS_SLV")
    assert(got(4L)._1 === "FINALIZATION_COMPLETE")
    // the two inconsistent-state refusals and the startup guard
    assert(got(5L)._2 === "ERR_INCONSISTENT_DONE")
    assert(got(6L)._2 === "ERR_INCONSISTENT_REQUIRED")
    assert(got(7L) === (("INVALID_MLV_AHEAD", "ERR_MLV_AHEAD", 0L, 11L)))
    // a PROCEED component walks exactly the features in (mlv, slv]
    assert(got(1L) ===
      (("FINALIZATION_REQUIRED", "PROCEED", 7L, 10L)))
    // zero-pending already-finalized component: no walk, clean FINALIZED
    assert(got(10L) === (("FINALIZATION_COMPLETE", "FINALIZED", 0L, 0L)))
  }
}
