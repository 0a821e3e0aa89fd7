package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 16-bin character histogram of a string in ONE pass per row:
  * `counts[b] = |{ ch : codepoint(ch) div 16 = b, b < 16 }|`.
  *
  * Semantically equal (on the ASCII data domain) to the built-in
  * spelling `transform(split(text, ''), ch -> ascii(ch) div 16)` →
  * explode → count-per-bin → dense reassembly, but computed map-side
  * with zero shuffles: the explode spelling materializes one row PER
  * CHARACTER (~1.5M rows at sf0.1) and pays two hash aggregations to
  * rebuild what is a narrow per-row projection. Codepoints ≥ 256 fall
  * outside bins 0..15 and are ignored — the same behavior as the
  * reassembly step reading only map keys 0..15.
  *
  * Null input → NULL; empty string → all-zero bins (the explode
  * spelling silently DROPS empty documents instead — callers that rely
  * on that must filter `length(text) > 0` explicitly, which is a
  * contract improvement, not a regression).
  */
case class CharHist16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_hist16 requires a string input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_hist16"

  override def nullSafeEval(input: Any): Any =
    CharHist16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharHist16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHist16 =
    copy(child = newChild)
}

object CharHist16 {
  /** Static so generated code makes one JIT-friendly call per row
    * (the pattern of Spark's own StaticInvoke-backed built-ins). The
    * ASCII fast path walks raw UTF-8 bytes; any non-ASCII byte falls
    * back to full codepoint iteration so multibyte characters bin by
    * codepoint exactly as `ascii()` reports them.
    */
  def compute(s: UTF8String): ArrayData = {
    val counts = new Array[Long](16)
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) { counts(b >>> 4) += 1; i += 1 }
      else ascii = false
    }
    if (!ascii) {
      java.util.Arrays.fill(counts, 0L)
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        j += Character.charCount(cp)
        val bin = cp >>> 4
        if (bin < 16) counts(bin) += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}
