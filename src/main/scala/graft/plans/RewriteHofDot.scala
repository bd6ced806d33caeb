package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}
import graft.functions.DotProduct

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product —
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0D, (acc, v) -> acc + v)`
  * — into the codegen'd [[graft.functions.DotProduct]] kernel.
  *
  * This closes the engine's documented HOF performance trap at the
  * PLAN level instead of the call-site level: interpreted lambdas pay
  * one closure frame per element AND get re-inlined per downstream
  * reference by CollapseProject (measured 294s → 29s on the similarity
  * sweep when fixed by hand) — with this rule, a user writing the
  * natural Spark spelling gets the kernel automatically, and because
  * the rule runs AFTER the main optimizer batches, every inlined copy
  * of the pattern is rewritten too.
  *
  * The rewrite is bit-exact, not approximate: [[DotProduct]] is
  * DEFINED as semantically identical to this exact HOF tree (same
  * left-to-right accumulation, same null poisoning on null
  * arrays/elements/length mismatch — see its scaladoc), and the match
  * is deliberately narrow so near-miss trees keep their own
  * semantics:
  *  - the fold seed must be literal `0.0D` with POSITIVE zero bits
  *    (a `-0.0` seed yields `-0.0` on empty arrays; the kernel yields
  *    `0.0`);
  *  - the zip lambda must be a multiply of the two zip variables,
  *    each either already double or cast to double (multiply and add
  *    are IEEE-commutative, so either operand order matches);
  *  - the merge lambda must be a bare add of the two merge variables,
  *    and the finish lambda the identity;
  *  - both inputs must be arrays of float/double/int/bigint (the
  *    kernel's type domain; the widening casts it applies internally
  *    are the same casts the lambda spells out).
  *
  * Registered by [[graft.GraftExtensions]] (extensions config) and
  * [[graft.GraftFunctions.register]] (imperative sessions, via
  * `spark.experimental.extraOptimizations`) — both inject into the
  * post-main user-rule batch, and the rewrite is idempotent (the
  * output tree no longer matches the pattern).
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def supportedArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** The zip-lambda operand: the variable itself (already double) or
    * its widening cast to double. */
  private def doubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case _ => false
  }

  private def isPositiveZero(v: Any): Boolean = v match {
    case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
        if isPositiveZero(zero) &&
          ((doubleOf(m.left, x) && doubleOf(m.right, y)) ||
            (doubleOf(m.left, y) && doubleOf(m.right, x))) &&
          ((sameVar(a.left, acc) && sameVar(a.right, v)) ||
            (sameVar(a.left, v) && sameVar(a.right, acc))) &&
          sameVar(fin, facc) &&
          supportedArray(left) && supportedArray(right) =>
      DotProduct(left, right)
  }
}
