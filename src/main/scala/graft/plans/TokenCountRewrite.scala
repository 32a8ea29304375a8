package graft.plans

import org.apache.spark.sql.catalyst.expressions.Size
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
  * Scope: only the non-legacy size semantics (legacySizeOfNull=false,
  * the Spark 3+/4 default) — both sides then agree that NULL text
  * yields NULL count. The legacy -1-for-null form is left unfused
  * rather than silently changing its null contract. */
object TokenCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(t: AsciiTokens, false) => AsciiTokenCount(t.child)
    }
}
