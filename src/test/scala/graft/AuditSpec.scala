package graft

import graft.operators.Audit

/** Audit parser templates on a hand log: counts, tie-breaks, the
  * millis-comma strip. */
class AuditSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val log = Seq(
    ("2024-01-01 10:00:00,001", "alice", "READ_KEY"),
    ("2024-01-01 10:00:00,950", "alice", "COMMIT_KEY"),
    ("2024-01-01 10:00:01,000", "bob", "READ_KEY"),
    ("2024-01-01 10:00:01,500", "carol", "DELETE_KEY"))
    .toDF("datetime", "user", "op")

  test("templates: counts, DESC-total ASC-key ties, millis stripped") {
    assert(Audit.topUsers(log).as[(String, Long)].collect().toSeq ===
      Seq(("alice", 2L), ("bob", 1L), ("carol", 1L)))
    assert(Audit.topCmds(log).as[(String, Long)].collect().toSeq ===
      Seq(("READ_KEY", 2L), ("COMMIT_KEY", 1L), ("DELETE_KEY", 1L)))
    // both 10:00:00 entries collapse to one second despite distinct millis
    assert(Audit.topActiveTimes(log).as[(String, Long)].collect().toSeq ===
      Seq(("2024-01-01 10:00:00", 2L), ("2024-01-01 10:00:01", 2L)))
  }
}
