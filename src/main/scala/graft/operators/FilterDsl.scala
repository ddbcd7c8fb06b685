package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generic field-filter DSL → Catalyst compiler — the debug-tool filter
 * grammar of the reference (apache/ozone cli-debug DBScanner.java:146-151
 * `--filter "<field>:<operator>:<value>"`, ops at :437-448: EQUALS,
 * LESSER, GREATER, REGEX), with dotted paths descending into nested
 * structs exactly like the reference's field navigation.
 *
 * Scale design: the spec compiles to ordinary Catalyst predicates, so the
 * optimizer gets full pushdown/pruning — a filter on a scan column reaches
 * the parquet reader like any hand-written one; REGEX stays a codegen'd
 * RLike. Comparisons inherit Spark's literal coercion to the column type
 * (numeric columns compare numerically, strings lexically — the same rule
 * the reference applies per field type).
 */
object FilterDsl {

  /** Compile one `field:op:value` atom. Dotted field paths resolve nested
    * struct members (col("a.b.c")). */
  def atom(spec: String): Column = {
    val parts = spec.split(":", 3)
    require(parts.length == 3, s"filter atom must be field:op:value — got '$spec'")
    val (field, op, value) = (parts(0), parts(1), parts(2))
    val c = col(field)
    op.toLowerCase match {
      case "equals"  => c === value
      case "lesser"  => c < value
      case "greater" => c > value
      case "regex"   => c.rlike(value)
      case other     => throw new IllegalArgumentException(
        s"unknown filter op '$other' (want equals|lesser|greater|regex)")
    }
  }

  /** Atom boundary: a comma only splits conjuncts when followed by a new
    * `field:op:` head — commas INSIDE a value (regex quantifiers `a{1,3}`,
    * alternations, character classes) stay part of the value. */
  private val AtomBoundary =
    ",(?=[A-Za-z_][A-Za-z0-9_.]*:(?i:equals|lesser|greater|regex):)"

  /** Compile a comma-separated conjunction (the reference ANDs its atoms). */
  def compile(spec: String): Column =
    spec.split(AtomBoundary).map(atom).reduce(_ && _)

  /** Filtered scan under a DSL spec. */
  def scan(df: DataFrame, spec: String): DataFrame = df.filter(compile(spec))
}
