package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` — a custom Catalyst GENERATOR emitting one
  * (pos, ngram) row per word n-gram of `text` (single-space tokenization,
  * matching the repo-wide `split(text, ' ')` convention).
  *
  * Why a Generator and not `transform(sequence(...), ...)` + `explode`:
  * the built-in composition materializes the full gram ARRAY per row
  * before exploding — for a 100k-word document at n=3 that is a ~3x-text
  * transient allocation per row, and at 100 TB the array builder is the
  * hot path. A Generator streams grams one at a time into the consuming
  * operator (`GenerateExec` pulls from this iterator), so peak memory per
  * row is one gram regardless of document length. This completes the
  * extension matrix (scalar codegen Expression, udaf Aggregator,
  * TypedImperativeAggregate, optimizer Rule, planner Strategy + custom
  * SparkPlan, DSv2 read + write) with the remaining expression kind:
  * a table-generating function.
  *
  * `n` must be a foldable positive integral literal — validated in
  * `checkInputDataTypes` BY TYPE FIRST, then evaluated (the
  * TopKStructAgg lesson: evaluating before type-checking turns a bad
  * literal into a ClassCastException instead of a clean analysis error).
  */
case class WordNGrams(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNGrams =
    copy(child = newChildren(0), nExpr = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires a string column, got ${child.dataType.sql}")
    } else if (!nExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(nExpr.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        "word_ngrams requires a foldable integral n, got " +
          s"${nExpr.sql}: ${nExpr.dataType.sql}")
    } else {
      val v = nExpr.eval()
      if (v == null || v.asInstanceOf[Number].longValue < 1) {
        TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires n >= 1, got ${nExpr.sql}")
      } else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      // -1 keeps trailing empty tokens, matching DuckDB's string_split.
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      // Lazy: GenerateExec pulls rows one at a time; nothing is
      // materialized per input row beyond the word array itself.
      (0 to words.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder(words(i))
        var j = i + 1
        while (j < i + n) { sb.append(' ').append(words(j)); j += 1 }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override def prettyName: String = "word_ngrams"
}
