package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(text, form)` — Unicode normalization (NFC / NFD /
  * NFKC / NFKD) as a whole-stage-codegen scalar expression. Spark ships
  * no normalization builtin, yet a multilingual corpus pipeline must
  * normalize before tokenization/dedup or visually-identical strings
  * (precomposed vs combining-mark spellings) hash apart — d01's exact
  * dedup, d02's shingles and t04's fingerprints all assume one
  * canonical spelling. Normalization is specified by Unicode (UAX #15),
  * so the JDK (java.text.Normalizer) and DuckDB's utf8proc
  * (`nfc_normalize`) agree exactly — oracle-checked in t17.
  *
  * `form` must be a foldable string naming a java.text.Normalizer.Form
  * — validated by type before evaluation ([[WordNGrams]] convention),
  * resolved once and referenced from generated code, not re-parsed per
  * row.
  */
case class NormalizeText(child: Expression, formExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = formExpr

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NormalizeText =
    copy(child = newLeft, formExpr = newRight)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a string column, got ${child.dataType.sql}")
    } else if (!formExpr.foldable || formExpr.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a foldable string form, got ${formExpr.sql}")
    } else {
      val v = formExpr.eval()
      val names = Normalizer.Form.values.map(_.name).toSeq
      if (v == null || !names.contains(v.toString)) {
        TypeCheckResult.TypeCheckFailure(
          s"graft_normalize form must be one of ${names.mkString("/")}, got ${formExpr.sql}")
      } else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(formExpr.eval().toString)

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any, unused: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, (c, _) =>
      s"""${ev.value} = UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(), $formRef));""".stripMargin)
  }
}
