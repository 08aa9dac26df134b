package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.NativeExpressions.ApproxHint

/** Whole-plan optimizer rule (brief tier (c): custom `Rule[LogicalPlan]`
  * registered via `SparkSessionExtensions`): rewrite exact
  * `count(DISTINCT x)` into the HyperLogLog++ sketch aggregate.
  *
  * Why a RULE and not just calling `approx_count_distinct`: at 100 TB the
  * exact distinct keeps a per-group hash set (the OOM documented in
  * [[graft.operators.Sketches]]), but the queries that hit it are often
  * authored generically (BI layers, notebook `df.agg(countDistinct(..))`
  * over whatever column a user picks). An engine-level rewrite changes the
  * execution strategy without touching query text — the same lever as
  * Catalyst's own `RewriteDistinctAggregates`, applied one step further.
  *
  * Two triggers, both off by default so exact semantics are never silently
  * lost:
  *  - per-expression: `count(DISTINCT approx_hint(x))` — the hint is a
  *    codegen'd identity wrapper, so on a session WITHOUT this rule the
  *    query still runs and is simply exact (graceful degradation);
  *  - per-session: `SET spark.graft.approxDistinct=true` rewrites every
  *    single-child `count(DISTINCT x)` in the session.
  *
  * relativeSD = 0.01 matches the 2% within-tolerance contract the sketch
  * family gates (Sketches.approxDistinct). Multi-child counts
  * (`count(DISTINCT a, b)`) are left alone: HLL++ is single-input.
  *
  * Placement: injected via `injectOptimizerRule` the rule lands in the
  * operator-optimization batches — BEFORE `RewriteDistinctAggregates`
  * expands multi-distinct aggregates, so the pattern below still sees the
  * logical `AggregateExpression(Count, isDistinct=true)`. Installed via
  * `spark.experimental.extraOptimizations` instead (the "User Provided
  * Optimizers" batch, which runs last), it must see aggregates that
  * `RewriteDistinctAggregates` skipped — i.e. plans whose Aggregate holds
  * a single distinct group, which is exactly the shape the gated query
  * uses (one hinted distinct per Aggregate node).
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def hll(child: Expression): HyperLogLogPlusPlus =
    HyperLogLogPlusPlus(child, relativeSD = 0.01)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewriteAll =
      conf.getConfString("spark.graft.approxDistinct", "false").toBoolean
    plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(ApproxHint(child))), _, true, _, _) =>
        ae.copy(aggregateFunction = hll(child), isDistinct = false)
      case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) if rewriteAll =>
        ae.copy(aggregateFunction = hll(child), isDistinct = false)
    }
  }
}
