package graft

import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit, StringTrim}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: `size(split(trim(x), '\s+'))` — the
  * token-count idiom used across the text-quality / funnel / vocab
  * operators — rewrites to the native one-pass
  * [[graft.ext.TokenCountExpr.TokenCount]] kernel, eliminating the
  * per-row split-array allocation (pure GC pressure at corpus scale).
  * Bit-identical by construction for every input, including the
  * leading/trailing-empty split artifacts (see the kernel's scaladoc);
  * `TokenCountRuleSpec` pins equality property-style and the rewrite's
  * presence in the optimized plan.
  *
  * Registered via `spark.sql.extensions=graft.GraftExtensions` (or
  * `Graft.registerFunctions` + `spark.experimental.extraOptimizations`);
  * the Verify correctness gate deliberately runs WITHOUT extensions, so
  * the oracle compares the un-rewritten plans.
  */
object RewriteTokenCount extends Rule[LogicalPlan] {

  private val wsPattern = UTF8String.fromString("\\s+")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // match ONLY the non-legacy Size form (legacySizeOfNull = false):
      // under spark.sql.legacy.sizeOfNull=true, size(split(trim(null),
      // '\s+')) returns -1 while TokenCount returns null — rewriting
      // there would silently change results under that config
      case Size(StringSplit(StringTrim(src, None),
          Literal(pat: UTF8String, StringType), Literal(-1, _)), false)
          if pat == wsPattern && src.dataType == StringType =>
        ext.TokenCountExpr.TokenCount(src)
    }
}
