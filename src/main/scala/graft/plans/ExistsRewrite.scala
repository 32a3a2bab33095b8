package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayExists, ArrayFilter, GreaterThan, LambdaFunction, LessThan, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `size(filter(arr, λ)) > 0` → `exists(arr, λ)`.
  *
  * The left form materializes the whole filtered array and then counts
  * it; `exists` short-circuits on the first match. The pattern is the
  * natural way analysts write "any element matches" (the reference's
  * techno flag — 002_views_techno.sql:57 `length(matched_genres) > 0` —
  * and this engine's genre pipeline), so rewriting it centrally beats
  * asking every query author to know the trick.
  *
  * Null semantics are preserved exactly: with legacySizeOfNull off
  * (Spark 4 default), `size(null) > 0` is null and `exists(null, λ)`
  * is null; and ArrayExists is constructed with three-valued logic
  * OFF, so a λ returning null for every element yields `false` — the
  * same as `filter` (which drops null-result elements) followed by
  * `size > 0`. The default 3VL ArrayExists would yield null there,
  * which is why the rewrite must pin the flag rather than use the
  * conf-dependent constructor.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) on clusters, and
  * `spark.experimental.extraOptimizations` for locally-built sessions.
  */
object ExistsRewrite extends Rule[LogicalPlan] {
  // ArrayFilter also accepts a two-argument (element, index) lambda, but
  // ArrayExists destructures exactly one binder — rewriting the indexed
  // form would MatchError at execution, so only single-binder lambdas
  // are eligible.
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayFilter(arg, fn @ LambdaFunction(_, Seq(_), _)), false),
          Literal(0, IntegerType)) =>
        ArrayExists(arg, fn, followThreeValuedLogic = false)
      case LessThan(Literal(0, IntegerType),
          Size(ArrayFilter(arg, fn @ LambdaFunction(_, Seq(_), _)), false)) =>
        ArrayExists(arg, fn, followThreeValuedLogic = false)
    }
}
