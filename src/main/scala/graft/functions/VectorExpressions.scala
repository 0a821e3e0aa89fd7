package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native (whole-stage-codegen) dot product over two ArrayType(Double)
  * columns.
  *
  * Semantics are EXACTLY the sequential left fold
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)` —
  * 0-init, left-to-right, one IEEE add per element — so results are
  * bit-identical to the interpreted higher-order-function spelling (and
  * to the DuckDB `list_reduce` oracle in [[graft.operators.Ns]]), while
  * running inside WholeStageCodegen instead of per-element lambda
  * interpretation (~10x on the all-pairs similarity queries).
  *
  * Null semantics match the HOF spelling too: unequal lengths (zip_with
  * null-pads, and any null product nulls the fold) or a null element
  * yield NULL — so [[graft.plans.RewriteHofDotProduct]] is a pure
  * speedup, never a semantics change, even on malformed inputs.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged/null-element inputs -> NULL
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = $a.numElements();
        double $acc = 0.0;
        ${ev.isNull} = ($n != $b.numElements());
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
          else { $acc += $a.getDouble($i) * $b.getDouble($i); }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance with the same sequential-fold bit-semantics as
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, (acc,x) -> acc+x)`.
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged/null-element inputs -> NULL
  override def prettyName: String = "vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val dv = x.getDouble(i) - y.getDouble(i)
      acc += dv * dv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      s"""
        final int $n = $a.numElements();
        double $acc = 0.0;
        ${ev.isNull} = ($n != $b.numElements());
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
          else {
            final double $dv = $a.getDouble($i) - $b.getDouble($i);
            $acc += $dv * $dv;
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { exprs => VecDot(exprs(0), exprs(1)) },
    "vec_l2sq" -> { exprs => VecL2Sq(exprs(0), exprs(1)) },
    "char_hist16" -> { exprs => CharHist16(exprs(0)) },
    "topk_structs" -> { exprs => TopKStructAgg(exprs(0), exprs(1)).toAggregateExpression() },
    "vec_moments" -> { exprs => DecimalMomentsAgg(exprs(0)).toAggregateExpression() },
    // Spark's runtime-filter bloom machinery (InjectRuntimeFilter's
    // BloomFilterAggregate / BloomFilterMightContain) exposed as
    // user-facing functions: build ONCE over xxhash64 keys, persist the
    // ~KB binary sketch, probe any table against it. Not in the public
    // FunctionRegistry as of Spark 4.1 — this surfaces the existing,
    // deterministic (fixed-seed) implementation, no re-implementation.
    "graft_bloom_agg" -> { exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2)).toAggregateExpression() },
    "graft_bloom_might_contain" -> { exprs =>
      BloomFilterMightContain(exprs(0), exprs(1)) },
    "word_ngrams" -> { exprs => WordNGrams(exprs(0), exprs(1)) },
    "graft_normalize" -> { exprs => NormalizeText(exprs(0), exprs(1)) }
  )

  /** Imperative registration for sessions created without extensions
    * (the driver harness builds plain SparkSessions). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // the full graft fast path: rank-limit queries also get the
    // sort-free per-key top-k operator
    graft.plans.GraftStrategies.install(spark)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` registration
  * path for clusters configured declaratively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (exprs: Seq[Expression]) => VecL2Sq(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("char_hist16"),
      new ExpressionInfo(classOf[CharHist16].getName, "char_hist16"),
      (exprs: Seq[Expression]) => CharHist16(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_moments"),
      new ExpressionInfo(classOf[DecimalMomentsAgg].getName, "vec_moments"),
      (exprs: Seq[Expression]) => DecimalMomentsAgg(exprs(0)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNGrams(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize"),
      (exprs: Seq[Expression]) => NormalizeText(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
