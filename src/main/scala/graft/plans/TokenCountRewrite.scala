package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{AsciiTokenCount, AsciiTokens}

/** Optimizer rule: `size(graft_tokens(x))` → `ascii_token_count(x)`.
  *
  * Queries declare token counts the natural way — tokenize, then
  * size() — and this rule fuses the pair into one allocation-free
  * byte pass (no per-token UTF8String, no array header, no copy),
  * exactly how Catalyst's own ReplaceExpressions rewrites run. It is
  * the (b)+(c) rungs of the extension ladder working together: a
  * custom codegen expression produced by a custom `Rule[LogicalPlan]`,
  * injected via SparkSessionExtensions (GraftExtensions), so EVERY
  * query — including ad-hoc SQL — gets the fusion without asking.
  *
  * Scope guards:
  * - only the non-legacy size semantics (legacySizeOfNull=false, the
  *   Spark 3+/4 default) — both sides then agree that NULL text
  *   yields NULL count; the legacy -1-for-null form is left unfused
  *   rather than silently changing its null contract;
  * - only when the SAME plan node does not also materialize
  *   graft_tokens of the same input elsewhere: codegen subexpression
  *   elimination evaluates the shared AsciiTokens once for both
  *   consumers, and fusing the count would un-share it — tokenizing
  *   the row for the array AND byte-scanning it again for the count
  *   (a net regression on exactly the hot path this rule targets).
  *   The guard is deliberately PER NODE, not whole-plan: Catalyst's
  *   subexpression elimination is per-operator, and by the time
  *   extension rules run, CollapseProject has already co-located
  *   same-row consumers into one node — so a graft_tokens(x)
  *   materialized in a DIFFERENT node never shares evaluation with
  *   this node's size() anyway (each operator evaluates its own
  *   expressions), and fusing the count there is still a strict win
  *   (byte scan < tokenize + size). A whole-plan guard would only
  *   un-fuse those independent consumers. */
object TokenCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    // transformDownWithSubqueries: count-only consumers inside
    // subquery expressions (IN/EXISTS/scalar) get the fusion too —
    // plain transform never descends into subquery plans
    plan.transformDownWithSubqueries { case node =>
      // inputs whose token ARRAY survives this node outside the
      // fusable size() pattern — those stay shared, not fused
      val shared = scala.collection.mutable.HashSet.empty[Expression]
      def scan(e: Expression): Unit = e match {
        case Size(t: AsciiTokens, false) => scan(t.child)
        case t: AsciiTokens =>
          shared += t.child.canonicalized
          t.children.foreach(scan)
        case other => other.children.foreach(scan)
      }
      node.expressions.foreach(scan)
      node.transformExpressions {
        case Size(t: AsciiTokens, false)
            if !shared.contains(t.child.canonicalized) =>
          AsciiTokenCount(t.child)
      }
    }
}
