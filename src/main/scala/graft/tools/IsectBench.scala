package graft.tools

import org.apache.spark.sql.{functions => F}

/** Dev-only: A/B the native graft_isect_sorted merge-count against the
  * size(array_intersect) chain it replaced, on pair shapes mirroring the
  * jaccard verification stage (5M pairs × two ~120-entry sorted distinct
  * arrays with ~50% overlap, min-of-3 warm). r12 readings on this host:
  * string form native 2.7 s vs builtin 4.9 s (1.8×); the PRODUCTION
  * shape — dictionary-encoded ARRAY<BIGINT> term-id sets — merges in
  * 0.25 s where builtin array_intersect on the same long arrays reads
  * 7.4 s (~30×: the builtin boxes every element into its per-row hash
  * set). End to end the encoding took the 100× verification-index
  * build 348 → 194 s (JaccProbe, same session type, identical 27.1M
  * pairs) — payload shrink through the pair joins + the primitive
  * merge together. */
object IsectBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    // per pair id: set A = tokens [id%97 .. id%97+119], set B shifted by
    // 60 → ~60 common elements; transform(sequence(...)) then array_sort
    // puts both in Spark's binary string order like production sets
    val df = spark.range(5000000L).select(
      F.expr("array_sort(transform(sequence(id % 97, id % 97 + 119), " +
        "x -> concat('tok ', x)))").as("a"),
      F.expr("array_sort(transform(sequence(id % 97 + 60, id % 97 + 179)," +
        " x -> concat('tok ', x)))").as("b"))
      .localCheckpoint() // materialize: time the kernels, not the synthesis
    def time(in: org.apache.spark.sql.DataFrame, label: String,
             c: String): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        in.select(F.expr(c).as("n")).agg(F.sum("n")).head
        secs(t0)
      }
      println(f"[ib] $label ${reps.min}%.2f s (reps ${
        reps.map(r => f"$r%.2f").mkString(", ")})")
    }
    time(df, "native graft_isect_sorted   ", "graft_isect_sorted(a, b)")
    time(df, "sql size(array_intersect)   ",
      "CAST(size(array_intersect(a, b)) AS BIGINT)")
    time(df, "native graft_isect_sorted   ", "graft_isect_sorted(a, b)")
    // the production shape: dictionary term-id long arrays
    val dfL = spark.range(5000000L).select(
      F.expr("array_sort(transform(sequence(id % 97, id % 97 + 119), " +
        "x -> x * 2654435761))").as("a"),
      F.expr("array_sort(transform(sequence(id % 97 + 60, id % 97 + 179)," +
        " x -> x * 2654435761))").as("b"))
      .localCheckpoint()
    time(dfL, "native long-array merge     ", "graft_isect_sorted(a, b)")
    time(dfL, "sql size(array_intersect) L ",
      "CAST(size(array_intersect(a, b)) AS BIGINT)")
    spark.stop()
  }
}
