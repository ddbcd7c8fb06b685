package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Optimizer rule: make `key.startsWith(p)` sargable by conjoining the exact
 * range `p <= key < succ(p)` (succ increments the last char; every
 * extension of p sorts strictly below it) — the SURVEY §4 prefix→range
 * rewrite as a real Catalyst `Rule[LogicalPlan]`, so ANY user-written
 * startsWith filter gets parquet min/max row-group skipping without
 * calling [[graft.operators.Listing.prefixPred]] explicitly. The engine's
 * dual of the reference's RocksDB prefix iterator seek
 * (apache/ozone OmMetadataManagerImpl.java:1144-1172).
 *
 * Idempotent under the optimizer's fixpoint batches: a StartsWith whose
 * Filter already carries the matching lower bound is left untouched.
 */
object PrefixRangeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      // bounds already present for (attribute, prefix) — suppress re-adding
      val existing: Set[(ExprId, String)] = cond.collect {
        case GreaterThanOrEqual(a: Attribute, Literal(s: UTF8String, StringType)) =>
          (a.exprId, s.toString)
      }.toSet
      val newCond = cond.transformUp {
        // last char must increment WITHOUT entering the surrogate block
        // (U+D800–U+DFFF): a lone surrogate re-encodes as '?' and breaks
        // UTF-8 binary order — leave such prefixes as plain startsWith.
        case sw @ StartsWith(a: Attribute, Literal(p: UTF8String, StringType))
            if p.numChars() > 0 && p.toString.last < 0xD7FF.toChar &&
              !existing.contains((a.exprId, p.toString)) =>
          val prefix = p.toString
          val upper = prefix.init + (prefix.last + 1).toChar
          And(And(
            GreaterThanOrEqual(a, Literal(prefix)),
            LessThan(a, Literal(upper))), sw)
      }
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
  }
}

/** SparkSessionExtensions hook: `.withExtensions(GraftExtensions)` —
  * the optimizer rule above plus the engine's native SQL functions
  * (graft_dot_long, [[graft.functions.ArrayDotLong]]). */
object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PrefixRangeRule)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.ArrayDotLong].getName, "graft_dot_long"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot_long takes 2 arguments, got ${children.length}")
        graft.functions.ArrayDotLong(children(0), children(1))
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.Hash60].getName, "graft_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_hash60 takes 1 argument, got ${children.length}")
        graft.functions.Hash60(children.head)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SimHash60].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_simhash takes 1 argument, got ${children.length}")
        graft.functions.SimHash60(children.head)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash16"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.MinHash16].getName, "graft_minhash16"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_minhash16 takes 1 argument, got ${children.length}")
        graft.functions.MinHash16(children.head)
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_isect_sorted"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.IntersectCountSorted].getName,
        "graft_isect_sorted"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_isect_sorted takes 2 arguments, got ${children.length}")
        graft.functions.IntersectCountSorted(children(0), children(1))
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hmac"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.HmacSha256].getName, "graft_hmac"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_hmac takes 2 arguments, got ${children.length}")
        graft.functions.HmacSha256(children(0), children(1))
      }))
  }
}
