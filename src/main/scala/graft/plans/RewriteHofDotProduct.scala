package graft.plans

import graft.functions.VecDot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: rewrite the portable higher-order-function
  * dot-product spelling
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * into the native codegen [[VecDot]] — same left-fold bit-semantics
  * (proved in VectorFunctionsSpec), ~10x faster. Users keep writing the
  * engine-portable form; plans run the fast one. Installed either via
  * `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]) or imperatively with
  * [[GraftOptimizations.install]] (`experimental.extraOptimizations`).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(zx, zy), _)),
        zero @ Literal(_, DoubleType),
        LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), Seq(ma, mv), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fa), _))
      if zero.value == 0.0 &&
        isDoubleArray(a) && isDoubleArray(b) &&
        x.exprId == zx.asInstanceOf[NamedLambdaVariable].exprId &&
        y.exprId == zy.asInstanceOf[NamedLambdaVariable].exprId &&
        acc.exprId == ma.asInstanceOf[NamedLambdaVariable].exprId &&
        v.exprId == mv.asInstanceOf[NamedLambdaVariable].exprId &&
        fin.exprId == fa.asInstanceOf[NamedLambdaVariable].exprId =>
      VecDot(a, b)
  }
}

object GraftOptimizations {
  /** Idempotent imperative install for sessions built without
    * `spark.sql.extensions`.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
  }
}
